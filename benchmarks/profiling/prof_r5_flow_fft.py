"""Round-5 probe: can dense DFT-matmuls beat XLA's FFT at 512^2?

The 512^2 RSW step is XLA-FFT-implementation-bound (docs/PERFORMANCE.md
roofline: calcN ~= step ~= the 11 batched transforms at ~80 us each; data
volume would allow ~0.1 ms). XLA lowers TPU FFTs to Cooley-Tukey stages
with small factors that tile the MXU poorly. A DENSE DFT is O(N) times
more FLOPs but is two perfect (512,512)@(512,B) matmuls per axis — at
~50-66 TFLOP/s f32-HIGHEST the 512^2 7-channel inverse costs ~0.1-0.2 ms
of pure MXU time vs the measured ~0.56 ms (7 x 80 us).

Pure XLA (einsum precision=HIGHEST) — no Mosaic dependence. Accuracy
target: match jnp.fft to ~1e-5 relative (f32 roundoff through a length-512
dot is ~sqrt(512) * 2^-24 ~ 1.3e-6).
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

sys.path.insert(0, "/root/repo")

from juliaraytracingsw_tpu.core.grid import make_grid  # noqa: E402
from juliaraytracingsw_tpu.core.spectral import irfft2, rfft2  # noqa: E402
from juliaraytracingsw_tpu.core.transfer import to_host  # noqa: E402

NX = 512
HI = jax.lax.Precision.HIGHEST
g = make_grid(NX)
ny, nkr = g.ny, g.nkr
rng = np.random.default_rng(0)
print("device:", jax.devices()[0], flush=True)


def timeit_unique(fn, x, iters=8):
    cs = [jnp.float32(1e-6 * i) for i in range(iters + 2)]
    jax.block_until_ready(fn(x, cs[0]))
    jax.block_until_ready(fn(x, cs[1]))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(x, cs[i + 2])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# ---- dense DFT factor tables (host f64 -> f32) ----------------------------
j_ = np.arange(ny)
m_ = np.arange(ny)
ang = 2.0 * np.pi * np.outer(j_, m_) / ny
C2 = np.cos(ang)
S2 = np.sin(ang)
k_ = np.arange(nkr)
n_ = np.arange(NX)
angk = 2.0 * np.pi * np.outer(n_, k_) / NX
wk = np.where((k_ == 0) | (k_ == NX // 2), 1.0, 2.0)
Ar = (np.cos(angk) * wk / NX).astype(np.float32)       # (nx, nkr)
Ai = (-np.sin(angk) * wk / NX).astype(np.float32)
Cr2 = (C2 / ny).astype(np.float32)                     # (ny, ny) inverse axis-2
Si2 = (S2 / ny).astype(np.float32)
# forward tables
Fr = np.cos(angk).T.astype(np.float32)                 # (nkr, nx) -> use as x@Fr.T
Fi = (-np.sin(angk)).T.astype(np.float32)
Cf2 = C2.astype(np.float32)                            # forward axis-2 (no norm)
Sf2 = (-S2).astype(np.float32)


def dft_irfft2(spec):
    """(C, ny, nkr) complex -> (C, ny, nx) real via two dense-DFT matmuls."""
    Xr, Xi = jnp.real(spec), jnp.imag(spec)
    # inverse c2c along axis -2: Y = conj-exp matrix (cos + i sin)/ny
    Yr = jnp.einsum("jm,cmk->cjk", Cr2, Xr, precision=HI) - jnp.einsum(
        "jm,cmk->cjk", Si2, Xi, precision=HI)
    Yi = jnp.einsum("jm,cmk->cjk", Cr2, Xi, precision=HI) + jnp.einsum(
        "jm,cmk->cjk", Si2, Xr, precision=HI)
    # irfft along axis -1 with hermitian weights folded into (nx, nkr)
    # tables: out = sum_k w_k (Yr cos + Yi * (-sin)) / nx = Yr@Ar + Yi@Ai
    return jnp.einsum("cjk,nk->cjn", Yr, Ar, precision=HI) + jnp.einsum(
        "cjk,nk->cjn", Yi, Ai, precision=HI)


def dft_rfft2(phys):
    """(C, ny, nx) real -> (C, ny, nkr) complex via two dense-DFT matmuls."""
    Zr = jnp.einsum("cjn,kn->cjk", phys, Fr, precision=HI)
    Zi = jnp.einsum("cjn,kn->cjk", phys, Fi, precision=HI)
    Wr = jnp.einsum("jm,cmk->cjk", Cf2, Zr, precision=HI) - jnp.einsum(
        "jm,cmk->cjk", Sf2, Zi, precision=HI)
    Wi = jnp.einsum("jm,cmk->cjk", Cf2, Zi, precision=HI) + jnp.einsum(
        "jm,cmk->cjk", Sf2, Zr, precision=HI)
    return jax.lax.complex(Wr, Wi)


# ---- data -----------------------------------------------------------------
phys7 = rng.standard_normal((7, ny, NX)).astype(np.float32)
spec7_h = to_host(jax.jit(rfft2)(jnp.asarray(phys7)))
from juliaraytracingsw_tpu.core.transfer import to_device
spec7 = to_device(spec7_h)
phys4 = jnp.asarray(rng.standard_normal((4, ny, NX)).astype(np.float32))

# accuracy
ref = np.asarray(jax.jit(lambda s: irfft2(s, NX))(spec7))
got = np.asarray(jax.jit(dft_irfft2)(spec7))
err_i = np.abs(got - ref).max() / np.abs(ref).max()
ref2 = to_host(jax.jit(rfft2)(phys4))
got2 = to_host(jax.jit(dft_rfft2)(phys4))
err_f = np.abs(got2 - ref2).max() / np.abs(ref2).max()
print(f"accuracy: irfft2 {err_i:.2e}  rfft2 {err_f:.2e}", flush=True)


@jax.jit
def t_ifft(x, c):
    return irfft2(x + c * (1 + 0j), NX)


@jax.jit
def t_idft(x, c):
    return dft_irfft2(x + c * (1 + 0j))


@jax.jit
def t_fft(x, c):
    return rfft2(x + c)


@jax.jit
def t_fdft(x, c):
    return dft_rfft2(x + c)


for name, fn, x in (("jnp irfft2 7ch", t_ifft, spec7),
                    ("DFT irfft2 7ch", t_idft, spec7),
                    ("jnp rfft2  4ch", t_fft, phys4),
                    ("DFT rfft2  4ch", t_fdft, phys4)):
    t = timeit_unique(fn, x)
    print(f"{name}: {t*1e3:7.3f} ms", flush=True)

# full RSW calcN shape: 7 inverse + 4 forward chained (transform cost only)
@jax.jit
def t_chain_fft(x, c):
    ph = irfft2(x + c * (1 + 0j), NX)
    prods = jnp.stack([ph[0] * ph[2], ph[1] * ph[3], ph[0] * ph[4],
                       ph[1] * ph[5]])
    return rfft2(prods)


@jax.jit
def t_chain_dft(x, c):
    ph = dft_irfft2(x + c * (1 + 0j))
    prods = jnp.stack([ph[0] * ph[2], ph[1] * ph[3], ph[0] * ph[4],
                       ph[1] * ph[5]])
    return dft_rfft2(prods)


for name, fn in (("chain 7i+4f jnp", t_chain_fft),
                 ("chain 7i+4f DFT", t_chain_dft)):
    t = timeit_unique(fn, spec7)
    print(f"{name}: {t*1e3:7.3f} ms", flush=True)

print("done", flush=True)
