"""Round-5 probe: can any Mosaic gather beat XLA's ~15 ns/row take?

The hero substep is ~65% one scattered 1M-row pair-table gather
(docs/PERFORMANCE.md "Other headroom").  Two candidate attacks, both
needing numbers before building anything:

1. **Per-row DMA issue rate** (VERDICT r5 item 1): a kernel that issues
   one HBM->VMEM `make_async_copy` per row, K semaphore slots round-robin
   so up to K copies are in flight.  If the scalar core can issue + retire
   row descriptors faster than ~15 ns/row, a double-buffered gather+stage
   kernel wins; if not, that's the recorded negative ablation.
   Indices are synthetic in-kernel (odd-stride LCG over the row space) so
   the probe isolates the issue rate from index delivery.

2. **Sorted-window expansion**: if packets are kept cell-sorted, a block
   of B consecutive packets touches a narrow band of cells, so the table
   slice [c_lo, c_lo+WIN) can stream in as ONE wide DMA and per-packet
   rows become a one-hot (B, WIN) @ (WIN, 2W) MXU matmul — index-free.
   Feasibility needs: argsort cost, narrow-row permute cost (to carry
   packet state through the sort), and the window+onehot cost (prototyped
   here in pure XLA with lax.map + dynamic_slice windows).

Baselines re-measured in the same session: W=160 f32 / W=80 bf16 takes.
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

R = 1 << 18          # 262144 table rows (512^2 cells)
W2 = 160             # pair-row width (bilinear, f32 words)
N = 1 << 20          # hero ensemble
rng = np.random.default_rng(0)


def timeit_unique(fn, iters=5):
    cs = [jnp.int32(i + 1) for i in range(iters + 2)]
    jax.block_until_ready(fn(cs[0]))
    jax.block_until_ready(fn(cs[1]))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(cs[i + 2])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


print("device:", jax.devices()[0], flush=True)
T32 = jnp.asarray(rng.standard_normal((R, W2)), jnp.float32)
Tb16 = T32.astype(jnp.bfloat16)
idx = jnp.asarray(rng.integers(0, R, N), jnp.int32)


# ---- baselines -------------------------------------------------------------
@jax.jit
def take160(c):
    return jnp.take(T32, (idx + c) % R, axis=0)


@jax.jit
def take_b16(c):
    return jnp.take(Tb16, (idx + c) % R, axis=0)


for tag, fn in (("take W=160 f32 ", take160), ("take W=160 bf16", take_b16)):
    t = timeit_unique(fn)
    print(f"{tag}: {t*1e3:7.2f} ms ({t/N*1e9:5.1f} ns/row)", flush=True)

# narrow rows: the cost of permuting packet state through a sort order
for Wn in (4, 8):
    Tn = jnp.asarray(rng.standard_normal((N, Wn)), jnp.float32)

    @jax.jit
    def taken(c, Tn=Tn):
        return jnp.take(Tn, (idx + c) % N, axis=0)

    t = timeit_unique(taken)
    print(f"take W={Wn} (1M rows, permute-like): {t*1e3:7.2f} ms "
          f"({t/N*1e9:5.1f} ns/row)", flush=True)


@jax.jit
def argsort_cost(c):
    return jnp.argsort(idx + c)


t = timeit_unique(argsort_cost)
print(f"argsort 1M i32: {t*1e3:7.2f} ms", flush=True)


# ---- 1. per-row DMA issue rate --------------------------------------------
def row_dma_kernel(hbm_ref, out_ref, sems, *, rows_per_blk, K, stride):
    blk = pl.program_id(0)
    base = blk * rows_per_blk

    def issue(i):
        # synthetic scattered index: odd stride walks the whole row space
        r = ((base + i) * stride + 12345) % R
        return pltpu.make_async_copy(
            hbm_ref.at[r], out_ref.at[i % (2 * K)], sems.at[i % K])

    def body(i, _):
        @pl.when(i >= K)
        def _():
            issue(i - K).wait()
        issue(i).start()
        return 0

    jax.lax.fori_loop(0, rows_per_blk, body, 0)

    def drain(i, _):
        issue(rows_per_blk - K + i).wait()
        return 0

    jax.lax.fori_loop(0, K, drain, 0)


def make_row_dma(rows_total, rows_per_blk, K, dtype):
    tab = T32 if dtype == jnp.float32 else Tb16
    grid = (rows_total // rows_per_blk,)
    call = pl.pallas_call(
        lambda h, o, s: row_dma_kernel(h, o, s, rows_per_blk=rows_per_blk,
                                       K=K, stride=40503),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((2 * K, W2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * K, W2), dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    @jax.jit
    def run(c):
        return call(tab * (1.0 + 0.0 * c.astype(tab.dtype)))

    return run


ROWS = 1 << 17       # 131072 rows per timing (1/8 of the hero gather)
for K in (8, 32):
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        try:
            fn = make_row_dma(ROWS, 8192, K, dtype)
            t = timeit_unique(fn, iters=3)
            print(f"pallas per-row DMA K={K:2d} {tag}: {t*1e3:7.2f} ms for "
                  f"{ROWS} rows ({t/ROWS*1e9:6.1f} ns/row)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pallas per-row DMA K={K} {tag}: FAILED {type(e).__name__}"
                  f": {str(e)[:200]}", flush=True)

# ---- 2. sorted-window + one-hot expansion (pure XLA prototype) -------------
# Timing-only prototype: assumes each 2048-packet block of the SORTED
# ensemble spans < WIN cells (true for near-uniform density; the real
# kernel would carry a per-row-DMA fallback for overflow).
B = 2048
for WIN in (1024, 2048):
    nblk = N // B
    cells_sorted = jnp.sort(idx)
    starts = cells_sorted[::B]

    def win_onehot(c, WIN=WIN, starts=starts, cells=cells_sorted):
        cs = (cells + 0 * c).reshape(nblk, B)

        def one(args):
            c_lo, cell_b = args
            win = jax.lax.dynamic_slice(Tb16, (c_lo, 0), (WIN, W2))
            loc = jnp.clip(cell_b - c_lo, 0, WIN - 1)
            oh = (loc[:, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (B, WIN), 1)
                  ).astype(jnp.bfloat16)
            return jnp.dot(oh, win, preferred_element_type=jnp.float32)

        return jax.lax.map(one, (starts, cs))

    t = timeit_unique(jax.jit(win_onehot))
    print(f"XLA sorted-window WIN={WIN} onehot-MXU: {t*1e3:7.2f} ms "
          f"({t/N*1e9:5.1f} ns/row equiv)", flush=True)

print("done", flush=True)
