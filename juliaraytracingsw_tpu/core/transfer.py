"""Host <-> device transfer helpers that tolerate complex-transfer gaps.

The TPU runtime in this environment supports complex64 arithmetic on device
(FFTs included) but NOT complex host<->device transfers (PJRT
"UNIMPLEMENTED"). Workaround: move real/imag planes separately and
combine/split on device. Complex constants *captured inside jit* are fine
(they ship inside the executable); only explicit transfers need these
helpers. On CPU backends they are equivalent to plain asarray.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["to_device", "to_host"]


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


def to_device(x, dtype=None):
    """numpy (real or complex) -> device array, avoiding complex transfers."""
    x = np.asarray(x)
    if not np.iscomplexobj(x):
        return jnp.asarray(x, dtype)
    cdtype = np.dtype(dtype) if dtype is not None else (
        np.complex64 if x.dtype != np.complex128 else np.complex128
    )
    rdtype = np.float32 if cdtype == np.complex64 else np.float64
    out = _combine(
        jnp.asarray(np.ascontiguousarray(x.real), rdtype),
        jnp.asarray(np.ascontiguousarray(x.imag), rdtype),
    )
    return out


def to_host(x) -> np.ndarray:
    """device array (real or complex) -> numpy, avoiding complex transfers."""
    if isinstance(x, np.ndarray):
        return x
    if jnp.iscomplexobj(x):
        return np.asarray(jnp.real(x)) + 1j * np.asarray(jnp.imag(x))
    return np.asarray(x)
