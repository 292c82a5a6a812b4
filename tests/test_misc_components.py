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


class TestRay1D:
    """rays/ray1d.py — 1-D prototype (raytracing/JuliaRaytracing1D.jl)."""

    def test_uniform_flow_advection(self):
        import jax.numpy as jnp

        from juliaraytracingsw_tpu.rays.ray1d import init_rays1d, raytrace1d

        L = 2 * np.pi
        u = jnp.full((64,), 0.3, jnp.float32)
        ux = jnp.zeros((64,), jnp.float32)
        rays = init_rays1d(8, L, k0=1.0)
        dt, nsteps = 1e-3, 500
        out = raytrace1d(rays, u, ux, dt, nsteps, L)
        # k unchanged in uniform flow; x advances by (u + k/sqrt(1+k^2)) t
        np.testing.assert_allclose(np.asarray(out.k), 1.0, rtol=1e-6)
        cg = 1.0 / np.sqrt(2.0)
        np.testing.assert_allclose(
            np.asarray(out.x - rays.x), (0.3 + cg) * dt * nsteps, rtol=1e-4)

    def test_methods_agree(self):
        import jax.numpy as jnp

        from juliaraytracingsw_tpu.rays.ray1d import init_rays1d, raytrace1d

        L = 2 * np.pi
        x = np.linspace(0, L, 128, endpoint=False)
        u = jnp.asarray(0.2 * np.sin(x), jnp.float32)
        ux = jnp.asarray(0.2 * np.cos(x), jnp.float32)
        rays = init_rays1d(16, L, k0=2.0)
        a = raytrace1d(rays, u, ux, 1e-3, 200, L, "rk4")
        b = raytrace1d(rays, u, ux, 1e-3, 200, L, "midpoint")
        np.testing.assert_allclose(np.asarray(a.x), np.asarray(b.x),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(a.k), np.asarray(b.k),
                                   atol=1e-4)


class TestReaderAnalysisUtils:
    """SequencedReader AnalysisUtils-parity API
    (analysis/Notebooks/AnalysisUtils.jl:24-78,189-285; load_file.jl:131-148)."""

    def _write_run(self, tmp_path):
        from juliaraytracingsw_tpu.io.output import SequencedWriter

        base = str(tmp_path / "run")
        w = SequencedWriter(base, max_writes=2)  # force rollover
        w.write("grid/nx", 16)
        w.write("params/f", 3.0)
        for i in range(5):
            w.write_frame(i * 10, sol=np.full((4, 4), float(i)))
            w.write_packets(i * 10, t=0.1 * i, x=np.full((3, 2), float(i)),
                            k=np.ones((3, 2)), u=np.zeros((3, 2)))
        w.close()
        return base

    def test_count_load_mapreduce_mapfilter(self, tmp_path):
        from juliaraytracingsw_tpu.io.output import SequencedReader

        base = self._write_run(tmp_path)
        r = SequencedReader(base)
        assert r.count() == 5
        np.testing.assert_allclose(r.load(30), 3.0)
        total = r.mapreduce(lambda s, a: a.mean(), lambda acc, v: acc + v, 0.0)
        np.testing.assert_allclose(total, 0 + 1 + 2 + 3 + 4)
        evens = r.mapfilter(lambda s, a: a.mean(), lambda s: s % 20 == 0)
        np.testing.assert_allclose(evens, [0.0, 2.0, 4.0])

    def test_params_and_final_packet_frame(self, tmp_path):
        from juliaraytracingsw_tpu.io.output import SequencedReader

        base = self._write_run(tmp_path)
        r = SequencedReader(base)
        p = r.params()
        assert p["grid/nx"] == 16 and p["params/f"] == 3.0
        assert r.packet_times()[-1] == (40, pytest.approx(0.4))
        step, frame = r.final_packet_frame()
        assert step == 40
        np.testing.assert_allclose(frame["x"], 4.0)
