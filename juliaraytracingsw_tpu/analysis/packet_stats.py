"""Packet trajectory loading and ensemble statistics.

Equivalents of the reference packet analysis layer:
- loaders over the rolling packet files incl. cross-file stitching
  (analysis/load_file.jl:89-160, analysis/Notebooks/AnalysisUtils.jl:426-505);
- per-packet intrinsic/absolute (Doppler) frequency helpers
  (AnalysisUtils.jl:396-414);
- KDE frequency-spectrum evolution and wavenumber-spread series
  (analysis/MakeRaytracingPlots.jl:14-65, CreateRaytracingPlots.jl:9-36).
"""
from __future__ import annotations

import numpy as np

from ..rays.dispersion import doppler_frequency, omega
from .slope import estimate_pdf

__all__ = [
    "load_packet_series", "intrinsic_frequencies", "absolute_frequencies",
    "wavenumber_spread", "frequency_pdf_evolution",
]


def load_packet_series(reader):
    """Gather the full packet telemetry across a rolling file sequence.

    Returns dict with t (T,), x (T, N, 2), k (T, N, 2), and u/g when present.
    """
    import h5py

    frames = {}
    for path in reader.paths:
        with h5py.File(path, "r") as f:
            if "p" not in f:
                continue
            for step in f["p/t"].keys():
                rec = {"t": float(np.asarray(f[f"p/t/{step}"]))}
                for name in ("x", "k", "u", "g"):
                    if f"p/{name}/{step}" in f:
                        rec[name] = f[f"p/{name}/{step}"][()]
                frames[int(step)] = rec
    steps = sorted(frames)
    out = {"step": np.asarray(steps),
           "t": np.asarray([frames[s]["t"] for s in steps])}
    for name in ("x", "k", "u", "g"):
        if all(name in frames[s] for s in steps):
            out[name] = np.stack([frames[s][name] for s in steps])
    return out


def intrinsic_frequencies(series, f, Cg, sign=None):
    """omega(k) along trajectories: (T, N)."""
    k = series["k"]
    s = 1.0 if sign is None else np.asarray(sign)[None, :]
    return np.asarray(omega(k[..., 0], k[..., 1], f, Cg, s))


def absolute_frequencies(series, f, Cg, sign=None):
    """Doppler-shifted Omega = omega + k.u (needs sampled velocities)."""
    k, u = series["k"], series["u"]
    s = 1.0 if sign is None else np.asarray(sign)[None, :]
    return np.asarray(doppler_frequency(
        k[..., 0], k[..., 1], u[..., 0], u[..., 1], f, Cg, s
    ))


def wavenumber_spread(series):
    """Time series of ensemble |k| statistics: mean, std, rms
    (CreateRaytracingPlots.jl wavenumber-spread panels)."""
    k = series["k"]
    mag = np.hypot(k[..., 0], k[..., 1])
    return {
        "t": series["t"],
        "mean": mag.mean(axis=1),
        "std": mag.std(axis=1),
        "rms": np.sqrt((mag**2).mean(axis=1)),
        "max": mag.max(axis=1),
    }


def frequency_pdf_evolution(series, f, Cg, sign=None, times=None,
                            grid_points=None):
    """KDE of the intrinsic-frequency distribution at selected times
    (MakeRaytracingPlots.jl:14-65). Returns (times, grid, pdfs (T, G))."""
    om = np.abs(intrinsic_frequencies(series, f, Cg, sign))
    t = series["t"]
    if times is None:
        idx = np.linspace(0, len(t) - 1, min(len(t), 16)).astype(int)
    else:
        idx = [int(np.argmin(np.abs(t - tt))) for tt in times]
    if grid_points is None:
        grid_points = np.linspace(om.min() * 0.9, om.max() * 1.1, 256)
    pdfs = np.stack([
        estimate_pdf(om[i], grid_points=grid_points)[1] for i in idx
    ])
    return t[idx], grid_points, pdfs
