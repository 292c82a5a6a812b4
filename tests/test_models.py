"""Model-level physics tests: SWQG and RSW."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from juliaraytracingsw_tpu.core.grid import make_grid
from juliaraytracingsw_tpu.core.spectral import irfft2, rfft2
from juliaraytracingsw_tpu.core.steppers import zero_clock
from juliaraytracingsw_tpu.models import rsw, swqg
from juliaraytracingsw_tpu.models.base import build_stepper, run


def random_streamfunction(grid, rng, kband=(2, 6), amp=1e-2):
    """Band-limited random real streamfunction, returned spectrally."""
    K = np.sqrt(np.asarray(grid.Krsq))
    k0 = 2 * np.pi / grid.Lx
    mask = (K >= kband[0] * k0) & (K <= kband[1] * k0)
    phase = rng.uniform(0, 2 * np.pi, K.shape)
    psih = mask * np.exp(1j * phase)
    psi = np.fft.irfft2(psih, s=(grid.ny, grid.nx))
    psi *= amp / max(np.abs(psi).max(), 1e-30)
    return rfft2(jnp.asarray(psi, jnp.float32))


class TestSWQG:
    def test_energy_enstrophy_conservation_inviscid(self, rng):
        g = make_grid(64)
        model = swqg.make_model(g, nu=0.0, f=1.0, Cg=1.0)
        psih = random_streamfunction(g, rng, amp=0.5)
        qh = swqg.pv_from_streamfunction(psih, g, model.params)

        init, step = build_stepper(model, "IFMAB3", dt=1e-2)
        state = init(qh)
        clock = zero_clock()
        E0 = float(swqg.energy(qh, g, model.params))
        Z0 = float(swqg.enstrophy(qh, g, model.params))
        qh, clock, state = run(step, qh, clock, state, 200)
        E1 = float(swqg.energy(qh, g, model.params))
        Z1 = float(swqg.enstrophy(qh, g, model.params))
        assert abs(E1 - E0) / E0 < 2e-3
        assert abs(Z1 - Z0) / Z0 < 2e-3

    def test_pv_streamfunction_roundtrip(self, rng):
        g = make_grid(32)
        model = swqg.make_model(g)
        psih = random_streamfunction(g, rng)
        qh = swqg.pv_from_streamfunction(psih, g, model.params)
        back = swqg.streamfunction_from_pv(qh, g, model.params)
        np.testing.assert_allclose(np.asarray(back), np.asarray(psih), atol=1e-6)

    def test_jacobian_zero_for_q_function_of_psi(self):
        """J(psi, q) = 0 when q = F(psi): single mode -> N should vanish
        (q = -(K^2+Kd^2) psi is linear in psi for one mode)."""
        g = make_grid(32)
        model = swqg.make_model(g)
        X = np.meshgrid(np.asarray(g.x), np.asarray(g.y))[0]
        psi = np.cos(3 * X)  # 1-D field: J(psi, q)=0 exactly
        psih = rfft2(jnp.asarray(psi, jnp.float32))
        qh = swqg.pv_from_streamfunction(psih, g, model.params)
        N = model.calcN(qh, 0.0)
        assert float(jnp.max(jnp.abs(N))) < 1e-3


class TestRSW:
    def test_linear_limit_matches_matrix_exponential(self, rng):
        """Tiny amplitude: IFMAB3 evolution == exact exp(L t) to f32 accuracy.

        This pins the full L (Coriolis/pressure/divergence) and the
        matrix-exponential stepper plumbing at once."""
        g = make_grid(32)
        model = rsw.make_model(g, nu=0.0, f=2.0, Cg=1.5)
        amp = 1e-6
        u0 = amp * rng.standard_normal((g.ny, g.nx)).astype(np.float32)
        v0 = amp * rng.standard_normal((g.ny, g.nx)).astype(np.float32)
        e0 = amp * rng.standard_normal((g.ny, g.nx)).astype(np.float32)
        sol = jnp.stack([rfft2(jnp.asarray(u0)), rfft2(jnp.asarray(v0)), rfft2(jnp.asarray(e0))])
        sol = g.dealias(sol)

        dt, nsteps = 1e-2, 25
        init, step = build_stepper(model, "IFMAB3", dt=dt)
        state = init(sol)
        clock = zero_clock()
        out, clock, state = run(step, sol, clock, state, nsteps)

        # exact linear evolution
        import scipy.linalg

        L = np.transpose(np.asarray(rsw.build_L(g, model.params), np.complex128), (2, 3, 0, 1))
        eLt = scipy.linalg.expm(L * (dt * nsteps))
        exact = np.einsum("mlab,bml->aml", eLt, np.asarray(sol, np.complex128))
        scale = np.abs(exact).max()
        np.testing.assert_allclose(
            np.asarray(out), exact, atol=5e-5 * scale
        )

    def test_nonlinear_energy_conservation(self, rng):
        """Inviscid RSW conserves E = <(1+eta)|u|^2/2 + Cg^2 eta^2/2>."""
        g = make_grid(64)
        model = rsw.make_model(g, nu=0.0, f=1.0, Cg=2.0)
        psih = random_streamfunction(g, rng, amp=0.05)
        # geostrophically balanced IC: u=-psi_y, v=psi_x, eta = f psi/Cg^2
        uh = -g.il * psih
        vh = g.ik * psih
        etah = model.params.f / model.params.Cg2 * psih
        sol = jnp.stack([uh, vh, etah])

        def full_energy(solh):
            u, v, eta, _ = rsw.updatevars(solh, g, model.params)
            dA = g.dx * g.dy / (g.Lx * g.Ly)
            ke = jnp.sum((1 + eta) * (u**2 + v**2) / 2) * dA
            pe = jnp.sum(model.params.Cg2 * eta**2 / 2) * dA
            return float(ke + pe)

        init, step = build_stepper(model, "IFMAB3", dt=2e-3)
        state = init(sol)
        clock = zero_clock()
        E0 = full_energy(sol)
        sol, clock, state = run(step, sol, clock, state, 300)
        E1 = full_energy(sol)
        assert np.isfinite(E1)
        assert abs(E1 - E0) / abs(E0) < 5e-3, (E0, E1)

    def test_quadratic_energetics_match_reference_convention(self, rng):
        g = make_grid(32)
        model = rsw.make_model(g, f=1.0, Cg=3.0)
        psih = random_streamfunction(g, rng, amp=0.1)
        sol = jnp.stack([-g.il * psih, g.ik * psih, psih / 9.0])
        u, v, eta, _ = rsw.updatevars(sol, g, model.params)
        dA = g.dx * g.dy
        ke_direct = float(jnp.sum(u**2 + v**2) / 2 * dA) / (g.Lx * g.Ly)
        ke = float(rsw.kinetic_energy(sol, g))
        np.testing.assert_allclose(ke, ke_direct, rtol=1e-4)
        pe_direct = float(jnp.sum(9.0 * eta**2 / 2 * dA)) / (g.Lx * g.Ly)
        pe = float(rsw.potential_energy(sol, g, model.params))
        np.testing.assert_allclose(pe, pe_direct, rtol=1e-4)
