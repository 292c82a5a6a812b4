"""Thomas-Yamada driver parity tests: eigenbasis-projected IC, two-phase
coarse->fine run, restart-from-file, wave/geo diagnostics, TY omega-k rows
(reference thomasyamada/TYdriver.jl, TY_k_omega.jl)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from juliaraytracingsw_tpu.core.grid import make_grid
from juliaraytracingsw_tpu.coupled.initial_conditions import ty_initial_condition
from juliaraytracingsw_tpu.coupled.ty_driver import (
    TYRunConfig,
    run_thomasyamada,
    ty_restart_solution,
)
from juliaraytracingsw_tpu.models.thomasyamada import (
    decompose_balanced_wave,
    ty_bases,
    wave_geostrophic_energy,
)


class TestTYInitialCondition:
    def test_band_limits_respected(self, rng):
        g = make_grid(32)
        sol = ty_initial_condition(g, rng, k0g_range=(2, 5), k0w_range=(6, 9),
                                   at=0.1, ag=0.2, aw=0.05)
        K = np.sqrt(np.asarray(g.Krsq))
        zt = np.asarray(sol[0])
        # barotropic zeta band-limited to the geo band (up to complex64
        # round-trip noise from enforce_reality)
        out_band = np.abs(zt[(K < 2 - 1e-9) | (K > 5 + 1e-9)]).max()
        assert out_band < 1e-6 * np.abs(zt).max()

    def test_projection_separates_wave_geo(self, rng):
        """With aw=0 the baroclinic state is purely geostrophic (wave energy
        ~ 0), and vice versa — the IC really uses the eigenbasis
        (TYdriver.jl:54-66 via TYUtils)."""
        g = make_grid(32)
        geo_only = ty_initial_condition(g, rng, k0g_range=(2, 6),
                                        k0w_range=(2, 6), at=0.0, ag=0.3,
                                        aw=0.0)
        wave, geo = wave_geostrophic_energy(geo_only, g)
        assert float(geo[0]) > 0
        assert float(wave[0]) < 1e-9 * max(float(geo[0]), 1e-30)

        wave_only = ty_initial_condition(g, rng, k0g_range=(2, 6),
                                         k0w_range=(2, 6), at=0.0, ag=0.0,
                                         aw=0.3)
        wave, geo = wave_geostrophic_energy(wave_only, g)
        assert float(wave[0]) > 0
        assert float(geo[0]) < 1e-9 * max(float(wave[0]), 1e-30)

    def test_amplitude_normalisation(self, rng):
        g = make_grid(32)
        sol = ty_initial_condition(g, rng, k0g_range=(2, 5), k0w_range=(2, 5),
                                   at=0.25, ag=0.0, aw=0.0)
        psit = -np.asarray(sol[0]) * np.asarray(g.invKrsq)
        psi = np.fft.irfft2(psit, s=(g.ny, g.nx))
        np.testing.assert_allclose(np.abs(psi).max(), 0.25, rtol=1e-5)


class TestTYDriver:
    def _cfg(self, tmp_path, **kw):
        base = dict(
            nx=32, nu=1e-10, nnu=4, Ro=0.2, stepper="ETDRK4",
            startup_dt=2e-3, startup_nsteps=10, startup_nsubs=5,
            dt=1e-3, nsteps=10, nsubs=5,
            k0g_range=(2, 5), k0w_range=(0, 4), at=0.05, ag=0.05, aw=0.02,
            out_dir=str(tmp_path), max_writes=100, log_fn=lambda *a: None,
        )
        base.update(kw)
        return TYRunConfig(**base)

    def test_two_phase_run_and_diagnostics(self, tmp_path):
        cfg = self._cfg(tmp_path)
        sol, clock, diags = run_thomasyamada(cfg)
        # clock carried across the handoff: startup 10*2e-3 + main 10*1e-3
        np.testing.assert_allclose(float(clock.t), 10 * 2e-3 + 10 * 1e-3,
                                   rtol=1e-5)
        assert np.isfinite(np.asarray(sol)).all()
        # wave/geo energy diagnostics recorded every frame of both phases
        assert len(diags["wave_ke"]) == 4 and len(diags["geo_ke"]) == 4
        assert os.path.exists(os.path.join(str(tmp_path), "diagnostics.h5"))
        # startup file and main file both exist
        assert os.path.exists(os.path.join(str(tmp_path), "startup.000000.h5"))
        assert os.path.exists(os.path.join(str(tmp_path), "ty.000000.h5"))

    def test_restart_from_file(self, tmp_path):
        first = os.path.join(str(tmp_path), "first")
        cfg = self._cfg(first, out_dir=first)
        sol1, clock1, _ = run_thomasyamada(cfg)

        second = os.path.join(str(tmp_path), "second")
        cfg2 = self._cfg(second, out_dir=second,
                         restart_file=os.path.join(first, "ty"))
        sol2, clock2, _ = run_thomasyamada(cfg2)
        assert np.isfinite(np.asarray(sol2)).all()
        # the restart loader returns the final written frame of run 1
        loaded, step = ty_restart_solution(os.path.join(first, "ty"))
        np.testing.assert_allclose(np.asarray(loaded), np.asarray(sol1),
                                   atol=1e-7)


class TestTYOmegaK:
    def test_complex_u_separates_branches(self, rng):
        """A pure Phi+ wave mode has one-sided support in the complex-U
        frequency spectrum (TY_k_omega.jl:105-107 rationale)."""
        g = make_grid(16)
        Phi0, Phip, Phim = ty_bases(g)
        # single mode (ki, li), pure + branch
        ki, li = 2, 3
        om = float(np.sqrt(1.0 + np.asarray(g.Krsq)[li, ki]))
        nt = 64
        dt = 0.05
        t = np.arange(nt) * dt
        Pp = np.asarray(Phip)
        u_t = np.array([Pp[0, li, ki] * np.exp(-1j * om * tt) for tt in t])
        v_t = np.array([Pp[1, li, ki] * np.exp(-1j * om * tt) for tt in t])
        U = u_t + 1j * v_t
        spec = np.abs(np.fft.fft(U))
        freqs = 2 * np.pi * np.fft.fftfreq(nt, d=dt)
        # energy concentrated at omega = -om (e^{-i om t}) — one-sided
        peak = freqs[np.argmax(spec)]
        assert peak < 0 and abs(abs(peak) - om) < 2 * np.pi / (nt * dt) + 1e-6
        # mirror branch (Phi-) peaks on the other side
        Pm = np.asarray(Phim)
        u_t = np.array([Pm[0, li, ki] * np.exp(1j * om * tt) for tt in t])
        v_t = np.array([Pm[1, li, ki] * np.exp(1j * om * tt) for tt in t])
        spec2 = np.abs(np.fft.fft(u_t + 1j * v_t))
        assert freqs[np.argmax(spec2)] > 0
