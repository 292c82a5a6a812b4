"""Tests for TwoLayerQG, MultiLayerQG, Thomas-Yamada, RSW variants and the
wave/vortex decomposition."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from juliaraytracingsw_tpu.core.grid import make_grid
from juliaraytracingsw_tpu.core.spectral import rfft2, irfft2
from juliaraytracingsw_tpu.core.steppers import zero_clock
from juliaraytracingsw_tpu.models import (
    linborg,
    modified_sw,
    multilayerqg,
    quadheight,
    rsw,
    swqg,
    thomasyamada,
    twolayerqg,
    wave_vortex,
)
from juliaraytracingsw_tpu.models.base import build_stepper, run


def band_psih(grid, rng, kband=(2, 6), amp=0.05, seed_shape=None):
    K = np.sqrt(np.asarray(grid.Krsq))
    mask = (K >= kband[0]) & (K <= kband[1])
    psih = mask * np.exp(1j * rng.uniform(0, 2 * np.pi, K.shape))
    psi = np.fft.irfft2(psih, s=(grid.ny, grid.nx))
    psi *= amp / max(np.abs(psi).max(), 1e-30)
    return rfft2(jnp.asarray(psi, jnp.float32))


class TestTwoLayerQG:
    def test_pv_psi_roundtrip(self, rng):
        g = make_grid(32)
        model = twolayerqg.make_model(g)
        psih = jnp.stack([band_psih(g, rng), band_psih(g, rng)])
        qh = twolayerqg.pv_from_streamfunction(psih, g, model.params)
        back = twolayerqg.streamfunction_from_pv(qh, g, model.params)
        np.testing.assert_allclose(np.asarray(back), np.asarray(psih), atol=1e-6)

    def test_L_matches_analytic_single_mode(self):
        """L q must equal the analytic linear RHS for one (k, l) mode."""
        g = make_grid(16)
        U, mu, nu, nnu = 0.3, 1e-2, 1e-4, 2
        model = twolayerqg.make_model(g, U=U, mu=mu, nu=nu, nnu=nnu, f0=2.0,
                                      Cg=1.0, drho_rho0=0.5)
        F = model.params.F
        iy, ix = 2, 3
        k = float(g.kr[ix]); l = float(g.l[iy]); K2 = k * k + l * l
        q = np.array([1.0 + 0.5j, -0.7 + 0.2j])
        S = np.array([[-K2 - F, F], [F, -K2 - F]])
        psi = np.linalg.solve(S, q)
        D = -nu * K2**nnu
        rhs1 = -1j * k * U * q[0] - 1j * k * (2 * F * U) * psi[0] + D * q[0]
        rhs2 = 1j * k * U * q[1] + 1j * k * (2 * F * U) * psi[1] \
            + mu * K2 * psi[1] + D * q[1]
        Lnp = np.asarray(model.L)[:, :, iy, ix]
        got = Lnp @ q
        np.testing.assert_allclose(got, [rhs1, rhs2], rtol=2e-5)

    def test_baroclinic_instability_growth(self, rng):
        """With shear U and small noise, eddy energy must grow."""
        g = make_grid(64, Lx=2 * np.pi)
        model = twolayerqg.make_model(g, U=0.5, mu=0.0, nu=1e-8, nnu=4,
                                      f0=3.0, Cg=1.0, drho_rho0=0.2)
        psih = jnp.stack([band_psih(g, rng, amp=1e-4),
                          band_psih(g, rng, amp=1e-4)])
        qh = twolayerqg.pv_from_streamfunction(psih, g, model.params)
        init, step = build_stepper(model, "IFMAB3", dt=5e-3)
        E0 = sum(map(float, twolayerqg.kinetic_energy(qh, g, model.params)))
        out, _, _ = run(step, qh, zero_clock(), init(qh), 400)
        E1 = sum(map(float, twolayerqg.kinetic_energy(out, g, model.params)))
        assert np.isfinite(E1) and E1 > 2 * E0, (E0, E1)


class TestMultiLayerQG:
    def test_two_layer_equivalence(self):
        g = make_grid(32)
        U, mu, nu, nnu, f0, Cg, drr = 0.4, 2e-2, 1e-5, 4, 3.0, 1.0, 0.2
        m2 = twolayerqg.make_model(g, U=U, mu=mu, nu=nu, nnu=nnu, f0=f0,
                                   Cg=Cg, drho_rho0=drr)
        kw = multilayerqg.two_layer_defaults(U=U, mu=mu, nu=nu, nnu=nnu,
                                             f0=f0, Cg=Cg, drho_rho0=drr)
        mn = multilayerqg.make_model(g, **kw)
        np.testing.assert_allclose(
            np.asarray(mn.L), np.asarray(m2.L), atol=1e-4
        )

    def test_calcN_matches_two_layer(self, rng):
        g = make_grid(32)
        m2 = twolayerqg.make_model(g)
        kw = multilayerqg.two_layer_defaults(U=0.5, mu=1e-2, nu=1e-6, nnu=4,
                                             f0=3.0, Cg=1.0, drho_rho0=0.2)
        mn = multilayerqg.make_model(g, **kw)
        qh = jnp.stack([band_psih(g, rng), band_psih(g, rng)])
        np.testing.assert_allclose(
            np.asarray(mn.calcN(qh, 0.0)), np.asarray(m2.calcN(qh, 0.0)),
            atol=1e-5,
        )

    def test_three_layer_runs(self, rng):
        g = make_grid(32)
        model = multilayerqg.make_model(
            g, U=(0.3, 0.0, -0.3), Fcoup=(4.0, 4.0), mu=1e-2
        )
        qh = jnp.stack([band_psih(g, rng) for _ in range(3)])
        init, step = build_stepper(model, "IFMAB3", dt=1e-2)
        out, _, _ = run(step, qh, zero_clock(), init(qh), 20)
        assert np.isfinite(np.asarray(out)).all()
        kes = multilayerqg.kinetic_energy(out, g, model.params)
        assert len(kes) == 3 and all(np.isfinite(float(k)) for k in kes)


class TestThomasYamada:
    def test_basis_orthonormal_complete(self):
        g = make_grid(16)
        bases = thomasyamada.ty_bases(g)
        B = np.stack([np.asarray(b) for b in bases])  # (3 bases, 3 comps, nl, nkr)
        # skip the mean mode (handled specially)
        gram = np.einsum("acml,bcml->abml", np.conj(B), B)
        eye = np.eye(3)[:, :, None, None]
        err = np.abs(gram - eye)[:, :, ~((np.arange(g.nl)[:, None] == 0) & (np.arange(g.nkr)[None, :] == 0))]
        assert err.max() < 1e-5

    def test_decomposition_completeness(self, rng):
        g = make_grid(32)
        sol = jnp.stack([band_psih(g, rng) for _ in range(4)])
        Gh, Wh = thomasyamada.decompose_balanced_wave(sol, g)
        np.testing.assert_allclose(
            np.asarray(Gh + Wh), np.asarray(sol[1:4]), atol=1e-5
        )

    def test_linear_wave_frequency(self):
        """Ro=0: a single baroclinic wave mode oscillates at omega=sqrt(1+K^2)."""
        g = make_grid(32)
        model = thomasyamada.make_model(g, nu=0.0, Ro=0.0)
        _, Phip, _ = thomasyamada.ty_bases(g)
        iy, ix = 0, 2  # pure k mode: k=2, l=0
        K2 = float(g.Krsq[iy, ix])
        om = np.sqrt(1 + K2)
        sol = jnp.zeros((4, g.nl, g.nkr), jnp.complex64)
        amp = 1e-3
        sol = sol.at[1:4, iy, ix].set(amp * Phip[:, iy, ix])
        dt = 1e-3
        nsteps = int(round((2 * np.pi / om) / dt))  # one period
        init, step = build_stepper(model, "ETDRK4", dt=dt)
        out, _, _ = run(step, sol, zero_clock(), init(sol), nsteps)
        # after one period the mode returns to itself (up to leftover phase
        # from nsteps rounding)
        a0 = np.asarray(sol[1:4, iy, ix])
        a1 = np.asarray(out[1:4, iy, ix])
        phase_err = abs(np.vdot(a0, a1) / (np.linalg.norm(a0) * np.linalg.norm(a1)))
        assert phase_err > 0.999, phase_err
        np.testing.assert_allclose(np.linalg.norm(a1), np.linalg.norm(a0), rtol=1e-3)

    def test_nonlinear_run_finite(self, rng):
        g = make_grid(64)
        model = thomasyamada.make_model(g, nu=1e-20, nnu=8, Ro=0.2)
        sol = jnp.stack([band_psih(g, rng, amp=0.1) for _ in range(4)])
        init, step = build_stepper(model, "ETDRK4", dt=5e-3)
        out, _, _ = run(step, sol, zero_clock(), init(sol), 100)
        assert np.isfinite(np.asarray(out)).all()
        ke, pe = thomasyamada.baroclinic_energy(out, g)
        bt = thomasyamada.barotropic_energy(out, g)
        assert all(np.isfinite(float(x)) for x in (ke, pe, bt))


class TestRSWVariants:
    def _small_amp_state(self, g, rng, amp):
        psih = band_psih(g, rng, amp=amp)
        uh = -g.il * psih
        vh = g.ik * psih
        etah = psih  # f=Cg=1 balanced
        return jnp.stack([uh, vh, etah])

    def test_modified_matches_rsw_small_amplitude(self, rng):
        """F(eta) ~ eta as eta -> 0, so Modified == RSW in the linear limit."""
        g = make_grid(32)
        amp = 1e-4
        sol = self._small_amp_state(g, rng, amp)
        m_rsw = rsw.make_model(g, nu=0.0)
        m_mod = modified_sw.make_model(g, nu=0.0)
        dt = 5e-3
        i1, s1 = build_stepper(m_rsw, "IFMAB3", dt=dt)
        i2, s2 = build_stepper(m_mod, "IFMAB3", dt=dt)
        o1, _, _ = run(s1, sol, zero_clock(), i1(sol), 50)
        o2, _, _ = run(s2, sol, zero_clock(), i2(sol), 50)
        scale = float(jnp.max(jnp.abs(o1)))
        np.testing.assert_allclose(
            np.asarray(o2), np.asarray(o1), atol=3e-3 * scale
        )

    def test_quadheight_matches_rsw_small_amplitude(self, rng):
        g = make_grid(32)
        amp = 1e-4
        solr = self._small_amp_state(g, rng, amp)
        m_rsw = rsw.make_model(g, nu=0.0)
        m_qh = quadheight.make_model(g, nu=0.0)
        solq = quadheight.set_solution(solr[0], solr[1], solr[2], g)
        dt = 5e-3
        i1, s1 = build_stepper(m_rsw, "IFMAB3", dt=dt)
        i2, s2 = build_stepper(m_qh, "IFMAB3", dt=dt)
        o1, _, _ = run(s1, solr, zero_clock(), i1(solr), 50)
        o2, _, _ = run(s2, solq, zero_clock(), i2(solq), 50)
        # compare recovered eta: eta = 1/m - 1
        _, _, _, eta2, _ = quadheight.updatevars(o2, g)
        eta1 = irfft2(o1[2], g.nx)
        # m = 1/(1+eta) with eta ~ 1e-4 rides on 1.0 in f32: expect ~1e-6
        # absolute cancellation noise on eta
        np.testing.assert_allclose(
            np.asarray(eta2), np.asarray(eta1), atol=2e-2 * amp
        )

    def test_linborg_runs_and_differs_from_rsw(self, rng):
        g = make_grid(32)
        sol = self._small_amp_state(g, rng, 0.3)
        m_rsw = rsw.make_model(g, nu=0.0)
        m_lin = linborg.make_model(g, nu=0.0)
        N1 = np.asarray(m_rsw.calcN(sol, 0.0))
        N2 = np.asarray(m_lin.calcN(sol, 0.0))
        assert np.isfinite(N2).all()
        # height-flux rows identical, momentum rows differ (rotational advection)
        np.testing.assert_allclose(N2[2], N1[2], atol=1e-6)
        assert np.abs(N2[0] - N1[0]).max() > 1e-8 or np.abs(N2[1] - N1[1]).max() > 1e-8


class TestWaveVortex:
    def test_decomposition_splits_balanced_state(self, rng):
        g = make_grid(32)
        params = rsw.RSWParams(nu=0.0, nnu=4, f=2.0, Cg2=1.0)
        psih = band_psih(g, rng)
        # geostrophically balanced state
        sol = jnp.stack([-g.il * psih, g.ik * psih,
                         params.f / params.Cg2 * psih])
        geo, wave = wave_vortex.wave_balanced_decomposition(sol, g, params)
        np.testing.assert_allclose(np.asarray(geo), np.asarray(sol), atol=1e-5)
        assert float(jnp.max(jnp.abs(wave))) < 1e-5

    def test_geo_plus_wave_is_identity(self, rng):
        g = make_grid(32)
        params = rsw.RSWParams(nu=0.0, nnu=4, f=3.0, Cg2=4.0)
        sol = jnp.stack([band_psih(g, rng) for _ in range(3)])
        geo, wave = wave_vortex.wave_balanced_decomposition(sol, g, params)
        np.testing.assert_allclose(
            np.asarray(geo + wave), np.asarray(sol), atol=1e-6
        )

    def test_eigenbasis_orthonormal_and_roundtrip(self, rng):
        g = make_grid(16)
        params = rsw.RSWParams(nu=0.0, nnu=4, f=2.0, Cg2=3.0)
        bases = wave_vortex.balanced_wave_bases(g, params)
        B = np.stack([np.asarray(b) for b in bases])
        gram = np.einsum("acml,bcml->abml", np.conj(B), B)
        eye = np.eye(3)[:, :, None, None]
        mask = np.ones(g.spectral_shape, bool); mask[0, 0] = False
        assert np.abs(gram - eye)[:, :, mask].max() < 1e-5

        sol = jnp.stack([band_psih(g, rng) for _ in range(3)])
        c0, cp, cm = wave_vortex.project_balanced_wave(sol, bases, params)
        back = wave_vortex.reconstruct(c0, cp, cm, bases, params)
        np.testing.assert_allclose(np.asarray(back), np.asarray(sol), atol=1e-5)
