"""Readers for the reference's JLD2 files (JLD2 is HDF5-based).

Used by the parity harness to load reference initial conditions and golden
snapshots (SURVEY.md §7: "parity harness must load ICs/flow snapshots from
reference JLD2 rather than regenerate them").

Handles the two JLD2-specific wrinkles:
- complex numbers stored as an (re, im) compound dtype;
- Julia column-major arrays: a Julia (nkr, nl) spectral field appears
  transposed relative to our (nl, nkr) layout, so ``to_spectral_layout``
  transposes the trailing two axes.
"""
from __future__ import annotations

import h5py
import numpy as np

__all__ = ["load_array", "load_scalar", "list_keys", "to_spectral_layout"]


def _convert(arr: np.ndarray) -> np.ndarray:
    if arr.dtype.names and set(arr.dtype.names) >= {"re", "im"}:
        return arr["re"] + 1j * arr["im"]
    return arr


def load_array(path: str, key: str) -> np.ndarray:
    with h5py.File(path, "r") as f:
        obj = f[key]
        if isinstance(obj, h5py.Dataset):
            return _convert(obj[()])
        raise TypeError(f"{key} is a group, not a dataset")


def load_scalar(path: str, key: str):
    val = load_array(path, key)
    return val.item() if np.ndim(val) == 0 else val


def list_keys(path: str, group: str = "/"):
    with h5py.File(path, "r") as f:
        out = []
        f[group].visit(out.append)
        return out


def to_spectral_layout(julia_array: np.ndarray) -> np.ndarray:
    """Julia (nkr, nl[, C]) column-major -> our (C,) (nl, nkr) layout.

    h5py reads the raw buffer row-major, which already reverses Julia's axis
    order: a Julia array stored as (nkr, nl, C) arrives as (C, nl, nkr) —
    exactly our layout. For 2-D fields it arrives as (nl, nkr). This helper
    is therefore the identity for matching ranks, but kept as a documented
    seam in case of version differences.
    """
    return julia_array
