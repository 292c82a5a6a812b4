"""Analysis subsystem tests: radial spectra, omega-k, transfer functions,
slope fitting, NUFFT, packet stats, reporting."""
import jax.numpy as jnp
import numpy as np
import pytest

from juliaraytracingsw_tpu.analysis import (
    b_parameter,
    nufft,
    omega_k,
    packet_stats,
    radial,
    report,
    slope,
    spectra,
    transfer,
)
from juliaraytracingsw_tpu.core.grid import make_grid
from juliaraytracingsw_tpu.core.spectral import parseval_sum2, rfft2
from juliaraytracingsw_tpu.coupled.initial_conditions import (
    band_geo_wave_ic,
    random_band_psih,
)
from juliaraytracingsw_tpu.models.rsw import RSWParams


class TestRadial:
    def test_weights_partition_unity(self):
        """Annulus weights over all radii sum to the doubling weights for
        cells fully inside the largest radius."""
        g = make_grid(32)
        radii, W = radial.radial_weights(g, resolution_factor=2)
        total = np.asarray(W.sum(axis=0)).reshape(g.nl, g.nkr)
        K = np.sqrt(np.asarray(g.Krsq))
        inside = K < radii[-1] - 1.5  # fully covered cells
        expected = np.ones_like(total)
        expected[:, 1:-1] = 2.0
        np.testing.assert_allclose(total[inside], expected[inside], atol=1e-6)

    def test_parseval_consistency(self, rng):
        """Sum of the radial spectrum == Parseval mode sum (for a field
        supported well inside the max radius)."""
        g = make_grid(64)
        psih = random_band_psih(g, rng, kband=(3, 8), amp=1.0)
        data = np.abs(np.asarray(psih)) ** 2
        radii, W = radial.radial_weights(g)
        spec = radial.radial_spectrum(data, W)
        w = np.ones((1, g.nkr)); w[0, 1:-1] = 2
        np.testing.assert_allclose(
            spec.sum(), (data * w).sum(), rtol=1e-6
        )

    def test_ring_lands_in_right_bin(self):
        g = make_grid(64)
        data = np.zeros(g.spectral_shape)
        # put unit power at |K| ~ 10 (kx=10 mode, doubling weight 2)
        data[0, 10] = 1.0
        radii, W = radial.radial_weights(g)
        spec = radial.radial_spectrum(data, W)
        peak_r = radii[np.argmax(spec)]
        assert abs(peak_r - 10.0) <= 0.5


class TestOmegaK:
    def test_single_mode_frequency_recovery(self):
        """A pure oscillation exp(-i w0 t) peaks at the right omega bin."""
        T, w0 = 256, 3.7
        t = np.linspace(0, 50, T, endpoint=False)
        data = np.exp(-1j * w0 * t)[:, None] * np.ones((1, 4))
        omega, spec = omega_k.omega_k_spectrum(t, {"a": data})
        peak = omega[np.argmax(np.abs(spec["a"][:, 0]))]
        assert abs(abs(peak) - w0) < 2 * 2 * np.pi / 50

    def test_detrend_removes_linear(self):
        t = np.linspace(0, 10, 100)
        data = (3.0 + 2.0 * t)[:, None]
        out = omega_k.detrend(t, data)
        assert np.abs(out).max() < 1e-10

    def test_stft_shapes(self):
        t = np.linspace(0, 10, 128)
        data = np.sin(5 * t)[:, None]
        centers, omega, specs = omega_k.stft_omega_k(t, data, 32)
        assert specs.shape[1] == 32 and len(centers) == specs.shape[0]


class TestTransfer:
    def test_flux_sums_to_zero_total_energy(self, rng):
        """Nonlinear terms conserve quadratic energy: the E flux density
        integrates (with conjugate doubling) to ~0."""
        g = make_grid(64)
        params = RSWParams(nu=0.0, nnu=4, f=2.0, Cg2=1.0)
        sol = band_geo_wave_ic(g, rng, Kg=(4, 7), Kw=(2, 4), ag=0.5, aw=0.2,
                               f=2.0, Cg=1.0)
        out = transfer.triad_transfer(sol, g, params)
        E, Z = out["total"]
        w = np.ones((1, g.nkr)); w[0, 1:-1] = 2
        E = np.asarray(E)
        net = (E * w).sum()
        scale = np.abs(E).sum() + 1e-30
        # advection conserves KE+PE except the eta*u flux term couples to
        # linear divergence; tolerance is loose but catches sign errors
        assert abs(net) / scale < 0.15, (net, scale)

    def test_triad_classes_sum_to_total(self, rng):
        g = make_grid(32)
        params = RSWParams(nu=0.0, nnu=4, f=2.0, Cg2=1.0)
        sol = band_geo_wave_ic(g, rng, Kg=(4, 7), Kw=(2, 4), ag=0.5, aw=0.2,
                               f=2.0, Cg=1.0)
        out = transfer.triad_transfer(sol, g, params)
        total = np.asarray(out["total"][0])
        parts = sum(np.asarray(out[k][0]) for k in ("ggg", "ggw", "gww", "www"))
        np.testing.assert_allclose(parts, total, atol=2e-4 * np.abs(total).max())


class TestSlope:
    def test_power_law_recovery(self, rng):
        omega = np.linspace(0.5, 20, 400)
        true = slope.power_law(omega, 2.0, 3.0)
        observed = true * rng.exponential(1.0, omega.shape)  # periodogram noise
        (A, s), _ = slope.fit_power_law(omega, observed)
        assert abs(s - 3.0) < 0.3, s

    def test_kde_integrates_to_one(self, rng):
        x = rng.standard_normal(2000)
        grid_pts, pdf = slope.estimate_pdf(x)
        integral = np.trapezoid(pdf, grid_pts)
        assert abs(integral - 1.0) < 0.02


class TestNUFFT:
    def test_matches_direct_evaluation(self, rng):
        g = make_grid(32)
        psih = random_band_psih(g, rng, kband=(2, 6), amp=1.0)
        xq = rng.uniform(-np.pi, np.pi, 50).astype(np.float32)
        yq = rng.uniform(-np.pi, np.pi, 50).astype(np.float32)
        out = np.asarray(nufft.nufft2d2(psih[None], jnp.asarray(xq),
                                        jnp.asarray(yq), g))
        # direct: full ifft2 then trig interpolation via dense sum
        fh = np.asarray(psih)
        kr = np.asarray(g.kr); ell = np.asarray(g.l)
        direct = np.zeros(50)
        x0, y0 = float(g.x[0]), float(g.y[0])
        for j in range(50):
            phase = np.exp(1j * (kr[None, :] * (xq[j] - x0)
                                 + ell[:, None] * (yq[j] - y0)))
            w = np.ones(g.nkr); w[1:-1] = 2
            direct[j] = np.real((fh * phase * w[None, :]).sum()) / (g.nx * g.ny)
        np.testing.assert_allclose(out[0], direct, atol=1e-4)

    def test_exact_at_grid_points(self, rng):
        g = make_grid(32)
        psih = random_band_psih(g, rng, kband=(2, 6), amp=1.0)
        psi = np.fft.irfft2(np.asarray(psih), s=(g.ny, g.nx))
        xs = np.asarray(g.x)[[0, 5, 17]]
        ys = np.asarray(g.y)[[3, 0, 20]]
        out = np.asarray(nufft.nufft2d2(psih[None], jnp.asarray(xs, jnp.float32),
                                        jnp.asarray(ys, jnp.float32), g))
        np.testing.assert_allclose(out[0], psi[[3, 0, 20], [0, 5, 17]],
                                   atol=1e-4)


class TestPacketStatsAndReport:
    def test_wavenumber_spread_and_pdfs(self, rng):
        series = {
            "t": np.linspace(0, 10, 20),
            "k": rng.standard_normal((20, 100, 2)) * 3 + 6,
        }
        out = packet_stats.wavenumber_spread(series)
        assert out["mean"].shape == (20,)
        times, gridpts, pdfs = packet_stats.frequency_pdf_evolution(
            series, f=3.0, Cg=1.0
        )
        assert pdfs.shape[0] == len(times) and np.isfinite(pdfs).all()

    def test_report_pages(self, tmp_path):
        r = report.RunReport("run42", 512, 0.1, 0.3, 1.5, 0.1)
        r.add_section("Energy", ["e1.png", "e2.png"])
        page = report.write_run_page(r, str(tmp_path))
        idx = report.write_index([r], str(tmp_path))
        text = open(page).read()
        assert "run42" in text and "e1.png" in text
        assert "run42.html" in open(idx).read()


class TestBParameter:
    def test_b_fit_quadratic(self):
        k = np.linspace(1, 10, 50)
        D11 = 0.7 * (k / 3.0) ** 2
        assert abs(b_parameter.fit_b(k, D11, 3.0) - 0.7) < 1e-10


class TestSpectra:
    def test_snapshot_energetics_consistency(self, rng):
        g = make_grid(64)
        params = RSWParams(nu=0.0, nnu=4, f=3.0, Cg2=1.0)
        sol = band_geo_wave_ic(g, rng, Kg=(4, 7), Kw=(2, 4), ag=0.5, aw=0.1,
                               f=3.0, Cg=1.0)
        e = spectra.snapshot_energetics(sol, g, params)
        # geo + wave energies sum to total (decomposition is exact)
        np.testing.assert_allclose(e["KE_geo"] + e["KE_wave"],
                                   e["KE"], rtol=0.35)
        assert e["umax"] > 0 and np.isfinite(e["KE_cubic"])
        d = spectra.derived_scales(e, g, params)
        assert d["Ro"] > 0 and d["Fr"] > 0
        # eigen-coefficient energy equals total energy (Parseval in the
        # orthonormal basis): E_geo_eig + E_wave_eig == KE + PE
        np.testing.assert_allclose(
            e["E_geo_eig"] + e["E_wave_eig"], e["KE"] + e["PE"], rtol=1e-4
        )


class TestSuiteEndToEnd:
    """analysis/suite.py — full run-dir analysis + multi-run index
    (RSWAnalysisSuite.jl, RayPlotDriver.jl:4-10, visualization index)."""

    def _make_run(self, tmp_path, name, rng):
        from juliaraytracingsw_tpu.io.output import SequencedWriter
        from juliaraytracingsw_tpu.models import rsw
        from juliaraytracingsw_tpu.core.transfer import to_host

        run_dir = tmp_path / name
        g = make_grid(32)
        w = SequencedWriter(str(run_dir / "rsw"), max_writes=10)
        w.write("grid/nx", 32); w.write("grid/Lx", 2 * np.pi)
        w.write("params/f", 3.0); w.write("params/Cg2", 1.0)
        for i in range(3):
            sol = band_geo_wave_ic(g, rng, Kg=(3, 5), Kw=(0, 2), ag=0.3,
                                   aw=0.05, f=3.0, Cg=1.0)
            w.write_frame(i, sol=to_host(sol))
            w.write(f"snapshots/t/{i}", 0.5 * i)
        w.close()
        return str(run_dir)

    def test_analyze_run_and_index(self, tmp_path, rng):
        import os

        from juliaraytracingsw_tpu.analysis.suite import (analyze_run,
                                                          analyze_runs)

        rd1 = self._make_run(tmp_path, "runA", rng)
        rep, figs = analyze_run(rd1, base="rsw")
        assert np.isfinite(rep.rossby) and np.isfinite(rep.froude)
        for f in figs.values():
            assert os.path.exists(f)
        assert os.path.exists(os.path.join(rd1, "figures", "plot_data.h5"))
        # cached second pass returns the same scalars
        rep2, _ = analyze_run(rd1, base="rsw")
        assert rep2.rossby == pytest.approx(rep.rossby)

        rd2 = self._make_run(tmp_path, "runB", rng)
        out = str(tmp_path / "site")
        reports, idx = analyze_runs([rd1, rd2], base="rsw", out_dir=out,
                                    max_workers=2)
        assert os.path.exists(idx)
        html_text = open(idx).read()
        assert "runA/runA.html" in html_text and "runB/runB.html" in html_text
        assert os.path.exists(os.path.join(out, "runA", "runA.html"))
