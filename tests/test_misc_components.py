"""Tests for collated IO, observability, two-layer helpers, NUFFT rays,
single-wave injection."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from juliaraytracingsw_tpu.core.grid import make_grid
from juliaraytracingsw_tpu.coupled.initial_conditions import random_band_psih
from juliaraytracingsw_tpu.coupled.single_wave import (
    inject_single_wave,
    single_wave_state,
)
from juliaraytracingsw_tpu.io.collated import CollatedWriter, map_input
from juliaraytracingsw_tpu.models.rsw import RSWParams
from juliaraytracingsw_tpu.models.wave_vortex import wave_balanced_decomposition
from juliaraytracingsw_tpu.rays.nufft_rays import nufft_raytrace, spectra_from_psih
from juliaraytracingsw_tpu.rays.packets import lattice_packets
from juliaraytracingsw_tpu.rays.raytrace import RayParams, fields_from_psih, raytrace
from juliaraytracingsw_tpu.utils.observability import StepTimer, checked_step
from juliaraytracingsw_tpu.utils.twolayer_helpers import (
    mu_from_target_scale,
    thompson_young_scales,
)


class TestCollated:
    def test_rollover_and_map(self, tmp_path):
        base = str(tmp_path / "pk")
        with CollatedWriter(base, max_lines=3) as w:
            for i in range(8):
                w.append(f"p/x/{i}", np.full(4, i))
        import os
        files = [p for p in os.listdir(tmp_path) if p.startswith("pk_")]
        assert len(files) == 3  # 3+3+2
        seen = map_input(base, lambda k, v: (k, float(v[0])))
        assert len(seen) == 8
        assert sorted(int(v) for _, v in seen) == list(range(8))


class TestObservability:
    def test_step_timer(self):
        t = StepTimer(sync=False)
        with t("phase_a"):
            pass
        with t("phase_a"):
            pass
        assert t.counts["phase_a"] == 2
        assert "phase_a" in t.report()

    def test_checked_step_catches_nan(self):
        from juliaraytracingsw_tpu.core.steppers import Clock

        def bad_step(sol, clock, state):
            return sol / 0.0, Clock(clock.t + 1, clock.step + 1), state

        checked = checked_step(bad_step)
        sol = jnp.ones((4,))
        err, _ = checked(sol, Clock(jnp.zeros(()), jnp.zeros((), jnp.int32)),
                         ())
        with pytest.raises(Exception):
            err.throw()


class TestTwoLayerHelpers:
    def test_mu_roundtrip(self):
        U, lam = 0.3, 0.2
        mu = mu_from_target_scale(10.0, U, lam)
        s = thompson_young_scales(U, lam, mu)
        np.testing.assert_allclose(s["ell_star"], 10.0, rtol=1e-10)


class TestNUFFTRays:
    def test_matches_bspline_raytrace(self, rng):
        """Spectrally-exact rays vs prefiltered-B-spline rays agree for a
        smooth band-limited flow."""
        g = make_grid(48)
        psih = random_band_psih(g, rng, kband=(2, 5), amp=0.03)
        rp = RayParams(f=3.0, Cg=1.0, x0=float(g.x[0]), y0=float(g.y[0]),
                       dx=g.dx, dy=g.dy, interp="bspline")
        p = lattice_packets(3, g.Lx, g.Ly, k0=6.0)
        fields = fields_from_psih(psih, g, interp="bspline")
        out_grid = raytrace(p, fields, fields, 0.0, 1.0, rp, nsubsteps=20)
        spec = spectra_from_psih(psih, g)
        out_nufft = nufft_raytrace(p, spec, spec, 0.0, 1.0, g, rp,
                                   nsubsteps=20)
        np.testing.assert_allclose(np.asarray(out_nufft.x),
                                   np.asarray(out_grid.x), atol=2e-3)
        np.testing.assert_allclose(np.asarray(out_nufft.k),
                                   np.asarray(out_grid.k), atol=2e-2)


class TestSingleWave:
    def test_wave_state_localised_and_normalised(self):
        g = make_grid(64)
        params = RSWParams(nu=0.0, nnu=4, f=3.0, Cg2=1.0)
        sol = single_wave_state(g, params, x0=0.0, y0=0.0, k0_idx=8,
                                l0_idx=0, env_size=0.5, aw=0.2)
        u = jnp.fft.irfft2(sol[0], s=(g.ny, g.nx))
        np.testing.assert_allclose(float(jnp.abs(u).max()), 0.2, rtol=1e-3)
        # localised: corners (far from origin) carry almost no amplitude
        assert float(jnp.abs(u[0, 0])) < 0.2 * 1e-3

    def test_injection_preserves_pv_part(self, rng):
        g = make_grid(64)
        params = RSWParams(nu=0.0, nnu=4, f=3.0, Cg2=1.0)
        psih = random_band_psih(g, rng, amp=0.1)
        base = jnp.stack([-g.il * psih, g.ik * psih, 3.0 * psih])
        out = inject_single_wave(base, g, params, x0=0.0, y0=0.0,
                                 k0_idx=8, l0_idx=0, env_size=0.5, aw=0.1)
        geo_in, _ = wave_balanced_decomposition(base, g, params)
        geo_out, wave_out = wave_balanced_decomposition(out, g, params)
        # the enveloped wave has its own (small) PV projection; by linearity
        # geo_out - geo_in must equal geo(wave_state) exactly
        ws = single_wave_state(g, params, x0=0.0, y0=0.0, k0_idx=8, l0_idx=0,
                               env_size=0.5, aw=0.1)
        geo_w, _ = wave_balanced_decomposition(
            jnp.fft.rfft2(jnp.fft.irfft2(g.dealias(ws), s=(g.ny, g.nx),
                                         axes=(-2, -1)), axes=(-2, -1)),
            g, params)
        scale = float(jnp.max(jnp.abs(geo_in)))
        np.testing.assert_allclose(np.asarray(geo_out - geo_in),
                                   np.asarray(geo_w), atol=3e-3 * scale)
        assert float(jnp.max(jnp.abs(wave_out))) > 0
