"""Two-layer QG experiment helpers.

Equivalent of the reference utils/Utils.jl: reload a two-layer problem state
from an initial-condition file and report predicted-vs-actual energetics
using the Thompson-Young halting-scale scaling

    l* = 3.2 exp(0.36 / kappa*),   kappa* = mu U / lambda,   V = U l*/lambda

(Utils.jl:23-44; also swqg/TwoLayerDriver.jl:17-27 inverts it to derive mu
from a target l*).
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "thompson_young_scales", "mu_from_target_scale", "display_energetics",
    "load_two_layer_state",
]

TY_C1, TY_C2 = 3.2, 0.36


def thompson_young_scales(U: float, lam: float, mu: float) -> dict:
    """kappa*, l*, eddy velocity V and predicted KE ~ V^2."""
    kappa_star = mu * U / lam if lam > 0 else np.inf
    # NOTE: reference Utils.jl computes kappa* = mu*U/lambda; the halting
    # scale grows as drag weakens
    ell_star = TY_C1 * np.exp(TY_C2 / kappa_star)
    # V = U * ell / lam with ell = ell_star * lam  ->  V = U * ell_star
    V = U * ell_star
    return {
        "kappa_star": kappa_star,
        "ell_star": ell_star,
        "ell": ell_star * lam,
        "V": V,
        "KE_pred": V * V,
    }


def mu_from_target_scale(ell_star: float, U: float, lam: float) -> float:
    """Invert l* = c1 exp(c2/kappa*) for the drag mu
    (swqg/TwoLayerDriver.jl:17-27: kappa* = c2/log(l*/c1))."""
    kappa_star = TY_C2 / np.log(ell_star / TY_C1)
    return kappa_star * lam / U


def display_energetics(ke1: float, ke2: float, U: float, lam: float,
                      mu: float, log=print):
    s = thompson_young_scales(U, lam, mu)
    log(f"lambda: {lam:.5f}  kappa*: {s['kappa_star']:.5f}  "
        f"ell*: {s['ell_star']:.5f}  V: {s['V']:.5f}")
    log(f"pred KE: {s['KE_pred']:.5f}  top KE: {ke1:.5f}  "
        f"bot KE: {ke2:.5f}  tot: {ke1 + ke2:.5f}")
    return s


def load_two_layer_state(path: str, grid, params, key: str = "ic/psih"):
    """Load psih from an IC file (ours or reference JLD2) and convert to the
    PV state (Utils.jl set_up_problem)."""
    from ..io.jld2 import load_array
    from ..core.transfer import to_device
    from ..models.twolayerqg import pv_from_streamfunction

    psih = load_array(path, key)
    psih_dev = to_device(np.asarray(psih).astype(np.complex64))
    return pv_from_streamfunction(psih_dev, grid, params)
