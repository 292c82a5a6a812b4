"""Fused RK4 substep kernel (ops/pallas_ray_step) vs the per-stage patch
path — forward and gradient equality, both the jnp twin and the pallas
interpreter, plus the JRSW_FUSED wiring through raytrace_tables."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from juliaraytracingsw_tpu.ops.pallas_ray_step import (
    make_fused_substep,
    substep_jnp,
)
from juliaraytracingsw_tpu.rays.packets import lattice_packets
from juliaraytracingsw_tpu.rays.patch import PATCH_SHAPES, build_patch_table
from juliaraytracingsw_tpu.rays.raytrace import (
    RayParams,
    make_pair_table,
    raytrace_tables,
)

L = 2 * np.pi
NY = NX = 32


def _setup(interp, seed=0):
    rng = np.random.default_rng(seed)
    # bicubic uses the stacked [f|fx|fy|fxy] corner-data layout (4x5 ch);
    # random data suffices for impl-consistency pins
    nch = 20 if interp == "bicubic" else 5
    fo = jnp.asarray(rng.standard_normal((nch, NY, NX)) * 0.1, jnp.float32)
    fn = jnp.asarray(rng.standard_normal((nch, NY, NX)) * 0.1, jnp.float32)
    rp = RayParams(f=3.0, Cg=1.0, x0=0.0, y0=0.0, dx=L / NX, dy=L / NY,
                   interp=interp)
    pk = lattice_packets(16, L, L, k0=5.196, k_ring=True)
    T_pair = make_pair_table(build_patch_table(fo, interp),
                             build_patch_table(fn, interp))
    return rp, pk, T_pair


def _fused_inputs(rp, pk):
    bx = jnp.floor((pk.x - rp.x0) / rp.dx)
    by = jnp.floor((pk.y - rp.y0) / rp.dy)
    cell = (jnp.remainder(by.astype(jnp.int32), NY) * NX
            + jnp.remainder(bx.astype(jnp.int32), NX))
    st = jnp.stack([pk.x, pk.y, pk.k, pk.l, pk.sign, bx, by])
    return cell, st


@pytest.mark.parametrize("interp", ["bilinear", "bspline"])
def test_jnp_twin_matches_patch_path(interp):
    rp, pk, T_pair = _setup(interp)
    os.environ["JRSW_FUSED"] = "off"
    try:
        ref = raytrace_tables(pk, T_pair, 0.0, 0.01, rp, NY, NX, 1, "rk4")
    finally:
        del os.environ["JRSW_FUSED"]
    cell, st = _fused_inputs(rp, pk)
    rows_T = jnp.take(T_pair, cell, axis=0).T
    fused = make_fused_substep(rp, interp, da=1.0, impl="jnp")
    out = fused(rows_T, st, jnp.array([0.0, 0.01], jnp.float32))
    for o, r in zip(out, (ref.x, ref.y, ref.k, ref.l)):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-5, atol=1e-6)


def test_interpret_kernel_matches_twin():
    interp = "bilinear"
    rp, pk, T_pair = _setup(interp)
    cell, st = _fused_inputs(rp, pk)
    rows_T = jnp.take(T_pair, cell, axis=0).T
    scal = jnp.array([0.0, 0.01], jnp.float32)
    twin = make_fused_substep(rp, interp, da=1.0, impl="jnp")
    kern = make_fused_substep(rp, interp, da=1.0, block=128,
                              impl="interpret")
    np.testing.assert_allclose(np.asarray(kern(rows_T, st, scal)),
                               np.asarray(twin(rows_T, st, scal)),
                               rtol=1e-6, atol=1e-7)


def test_interpret_kernel_custom_vjp_matches_twin_grad():
    interp = "bilinear"
    rp, pk, T_pair = _setup(interp)
    cell, st = _fused_inputs(rp, pk)
    rows_T = jnp.take(T_pair, cell, axis=0).T
    scal = jnp.array([0.0, 0.01], jnp.float32)
    twin = make_fused_substep(rp, interp, da=1.0, impl="jnp")
    kern = make_fused_substep(rp, interp, da=1.0, block=128,
                              impl="interpret")

    def loss(f, r):
        o = f(r, st, scal)
        return jnp.sum(o[2] ** 2 + o[3] ** 2)

    g_twin = jax.grad(lambda r: loss(twin, r))(rows_T)
    g_kern = jax.grad(lambda r: loss(kern, r))(rows_T)
    # the kernel's VJP linearizes the NORMAL-layout per-stage formulation
    # (round 4 — parity with the chunked backward, see ops/pallas_ray_step
    # bwd), which differs from the twin's AD by FP association only
    np.testing.assert_allclose(np.asarray(g_kern), np.asarray(g_twin),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("interp", ["bilinear", "bspline"])
def test_raytrace_tables_fused_env_matches_off(interp):
    """JRSW_FUSED=jnp routes raytrace_tables through the fused substep and
    reproduces the default per-stage sampler over multiple substeps
    (traced a0 per substep)."""
    rp, pk, T_pair = _setup(interp)
    out_ref = raytrace_tables(pk, T_pair, 0.0, 0.02, rp, NY, NX, 4, "rk4")
    os.environ["JRSW_FUSED"] = "jnp"
    try:
        jax.clear_caches()
        out_fused = raytrace_tables(pk, T_pair, 0.0, 0.02, rp, NY, NX, 4,
                                    "rk4")
    finally:
        del os.environ["JRSW_FUSED"]
        jax.clear_caches()
    for a, b in zip(out_fused, out_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_raytrace_tables_fused_gradient_flows_to_table():
    rp, pk, T_pair = _setup("bilinear")
    os.environ["JRSW_FUSED"] = "jnp"
    try:
        jax.clear_caches()

        def loss(T):
            out = raytrace_tables(pk, T, 0.0, 0.01, rp, NY, NX, 2, "rk4")
            return jnp.mean(out.k ** 2 + out.l ** 2)

        g = jax.grad(loss)(T_pair)
    finally:
        del os.environ["JRSW_FUSED"]
        jax.clear_caches()
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.parametrize("impl", ["mxu", "pairsplit"])
@pytest.mark.parametrize("interp", ["bilinear", "bspline", "bicubic"])
def test_patch_impl_mxu_matches_split(interp, impl):
    """JRSW_PATCH_IMPL={mxu,pairsplit} (single-pass pair-row stage math)
    reproduces the 'split' oracle through raytrace_tables. The oracle is
    selected EXPLICITLY (the default is pairsplit since round 3, so an
    implicit reference would compare pairsplit with itself)."""
    rp, pk, T_pair = _setup(interp)
    os.environ["JRSW_PATCH_IMPL"] = "split"
    try:
        jax.clear_caches()
        out_ref = raytrace_tables(pk, T_pair, 0.0, 0.02, rp, NY, NX, 4,
                                  "rk4")
        os.environ["JRSW_PATCH_IMPL"] = impl
        jax.clear_caches()
        out = raytrace_tables(pk, T_pair, 0.0, 0.02, rp, NY, NX, 4, "rk4")
    finally:
        del os.environ["JRSW_PATCH_IMPL"]
        jax.clear_caches()
    for a, b in zip(out, out_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
