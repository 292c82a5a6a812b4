"""Pallas TPU kernel: fused periodic bilinear gather + WKB ray RHS.

TPU equivalent of the reference's CUDA-texture ray RHS
(raytracing/GPURaytracing.jl:32-65: 10 texture gathers + dispersion fused in
broadcast closures). One kernel evaluates, for a block of packets,

    u, v, ux, uy, vx  (bilinear from the 5-field stack, periodic wrap)
    dx/dt = u + Cg^2 k / omega,   dk/dt = -(ux k + vx l),
    dl/dt = -(uy k - ux l)

keeping the whole field stack resident in VMEM (5 x 512^2 f32 ~ 5.2 MB) and
streaming packet blocks through the grid — no HBM round-trips for the 20
gathered values per packet.

The gather itself is expressed as ``jnp.take`` on the flattened field; on
current Mosaic this lowers to dynamic-gather ops. ``ray_rhs_pallas`` takes
``interpret=`` for CPU testing; ``ray_rhs_reference`` is the pure-jnp
fallback used by rays/raytrace.py (identical math).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ray_rhs_pallas", "ray_rhs_reference"]


def _kernel(x_ref, y_ref, k_ref, l_ref, sign_ref, fields_ref,
            dx_ref, dy_ref, dk_ref, dl_ref,
            *, x0, y0, dxg, dyg, nx, ny, f, Cg):
    x = x_ref[:]
    y = y_ref[:]
    kk = k_ref[:]
    ll = l_ref[:]
    sgn = sign_ref[:]

    fx = (x - x0) / dxg
    fy = (y - y0) / dyg
    ix0 = jnp.floor(fx)
    iy0 = jnp.floor(fy)
    ax = fx - ix0
    ay = fy - iy0
    ix0 = jnp.remainder(ix0.astype(jnp.int32), nx)
    iy0 = jnp.remainder(iy0.astype(jnp.int32), ny)
    ix1 = jnp.remainder(ix0 + 1, nx)
    iy1 = jnp.remainder(iy0 + 1, ny)

    flat = fields_ref[:].reshape(5, ny * nx)

    def gather(iy, ix):
        return jnp.take(flat, iy * nx + ix, axis=1)  # (5, B)

    f00 = gather(iy0, ix0)
    f01 = gather(iy0, ix1)
    f10 = gather(iy1, ix0)
    f11 = gather(iy1, ix1)
    bot = f00 + ax * (f01 - f00)
    top = f10 + ax * (f11 - f10)
    vals = bot + ay * (top - bot)          # (5, B)

    u, v, ux, uy, vx = vals[0], vals[1], vals[2], vals[3], vals[4]
    om = sgn * jnp.sqrt(f * f + Cg * Cg * (kk * kk + ll * ll))
    cg = Cg * Cg / om
    dx_ref[:] = u + cg * kk
    dy_ref[:] = v + cg * ll
    dk_ref[:] = -(ux * kk + vx * ll)
    dl_ref[:] = -(uy * kk - ux * ll)


@partial(jax.jit, static_argnames=("x0", "y0", "dxg", "dyg", "f", "Cg",
                                   "block", "interpret"))
def ray_rhs_pallas(x, y, k, l, sign, fields, *, x0, y0, dxg, dyg, f, Cg,
                   block: int = 2048, interpret: bool = False):
    """(dx, dy, dk, dl) each (N,); N must be a multiple of ``block``."""
    _, ny, nx = fields.shape
    n = x.shape[0]
    grid = (pl.cdiv(n, block),)
    spec1 = pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.ANY
                         if interpret else pltpu.VMEM)
    fspec = pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM)
    kernel = partial(_kernel, x0=x0, y0=y0, dxg=dxg, dyg=dyg, nx=nx, ny=ny,
                     f=f, Cg=Cg)
    out_shape = [jax.ShapeDtypeStruct((n,), x.dtype)] * 4
    dx, dy, dk, dl = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec1, spec1, spec1, spec1, spec1, fspec],
        out_specs=[spec1] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(x, y, k, l, sign, fields)
    return dx, dy, dk, dl


def ray_rhs_reference(x, y, k, l, sign, fields, *, x0, y0, dxg, dyg, f, Cg):
    """Pure-jnp fallback with identical math (used for verification)."""
    from ..rays.interp import bilinear
    from ..rays.dispersion import group_velocity

    vals = bilinear(fields, x, y, x0, y0, dxg, dyg)
    u, v, ux, uy, vx = vals[0], vals[1], vals[2], vals[3], vals[4]
    cgx, cgy = group_velocity(k, l, f, Cg, sign)
    return (u + cgx, v + cgy, -(ux * k + vx * l), -(uy * k - ux * l))
