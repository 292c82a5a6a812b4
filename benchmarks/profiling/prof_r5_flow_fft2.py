"""Round-5 flow-FFT probe, scan-amortized timing.

prof_r5_flow_fft.py's per-call timings are tunnel-dispatch-dominated
(~3.6 ms/call regardless of workload). Here each measurement is ONE jit
containing a 200-iteration lax.scan of a spectral round trip
(7ch irfft2 -> pointwise -> 7ch rfft2 -> dealias-like mask), so dispatch
amortizes to noise and the per-iteration number is device time. This is
the transform pattern of the RSW calcN (11 transforms/step: 7 inverse +
4 forward; the round trip here is 7+7 — scale by 11/14 for step cost).
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
from juliaraytracingsw_tpu.core.transfer import to_device, to_host  # noqa: E402

NX = int(os.environ.get("PROBE_NX", "512"))
S = 200
HI = jax.lax.Precision.HIGHEST
g = make_grid(NX)
ny, nkr = g.ny, g.nkr
rng = np.random.default_rng(0)
print(f"device: {jax.devices()[0]}  nx={NX}", flush=True)

j_ = np.arange(ny)
m_ = np.arange(ny)
ang = 2.0 * np.pi * np.outer(j_, m_) / ny
k_ = np.arange(nkr)
n_ = np.arange(NX)
angk = 2.0 * np.pi * np.outer(n_, k_) / NX
wk = np.where((k_ == 0) | (k_ == NX // 2), 1.0, 2.0)
Ar = (np.cos(angk) * wk / NX).astype(np.float32)
Ai = (-np.sin(angk) * wk / NX).astype(np.float32)
Cr2 = (np.cos(ang) / ny).astype(np.float32)
Si2 = (np.sin(ang) / ny).astype(np.float32)
Fr = np.cos(angk).T.astype(np.float32)
Fi = (-np.sin(angk)).T.astype(np.float32)
Cf2 = np.cos(ang).astype(np.float32)
Sf2 = (-np.sin(ang)).astype(np.float32)


def dft_irfft2(spec):
    Xr, Xi = jnp.real(spec), jnp.imag(spec)
    Yr = jnp.einsum("jm,cmk->cjk", Cr2, Xr, precision=HI) - jnp.einsum(
        "jm,cmk->cjk", Si2, Xi, precision=HI)
    Yi = jnp.einsum("jm,cmk->cjk", Cr2, Xi, precision=HI) + jnp.einsum(
        "jm,cmk->cjk", Si2, Xr, precision=HI)
    return jnp.einsum("cjk,nk->cjn", Yr, Ar, precision=HI) + jnp.einsum(
        "cjk,nk->cjn", Yi, Ai, precision=HI)


def dft_rfft2(phys):
    Zr = jnp.einsum("cjn,kn->cjk", phys, Fr, precision=HI)
    Zi = jnp.einsum("cjn,kn->cjk", phys, Fi, precision=HI)
    Wr = jnp.einsum("jm,cmk->cjk", Cf2, Zr, precision=HI) - jnp.einsum(
        "jm,cmk->cjk", Sf2, Zi, precision=HI)
    Wi = jnp.einsum("jm,cmk->cjk", Cf2, Zi, precision=HI) + jnp.einsum(
        "jm,cmk->cjk", Sf2, Zr, precision=HI)
    return jax.lax.complex(Wr, Wi)


mask = jnp.asarray(np.asarray(g.dealias_mask, np.float32))
phys7 = rng.standard_normal((7, ny, NX)).astype(np.float32)
spec7 = to_device(to_host(jax.jit(rfft2)(jnp.asarray(phys7))))


def roundtrip(ir, rf):
    def body(carry, _):
        ph = ir(carry)
        ph = ph * (1.0 + 1e-6 * ph)          # stand-in pointwise nonlinearity
        out = rf(ph) * mask
        # renormalize so 200 iterations neither blow up nor denormal out
        out = out / (1e-30 + jnp.max(jnp.abs(out))) * 0.1
        return out.astype(jnp.complex64), None

    @jax.jit
    def run(x, c):
        y, _ = jax.lax.scan(body, x + c * (1 + 0j), None, length=S)
        return y

    return run


def timeit(fn, x, iters=3):
    cs = [jnp.float32(1e-6 * i) for i in range(iters + 1)]
    jax.block_until_ready(fn(x, cs[0]))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(x, cs[i + 1])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters / S


ALG = os.environ.get("PROBE_ALG", "")
if ALG:
    # algorithm-preset einsum wrapper: route all DFT matmuls through
    # dot_general with the preset (e.g. BF16_BF16_F32_X3 halves the MXU
    # passes of f32-HIGHEST with near-f32 accuracy)
    preset = getattr(jax.lax.DotAlgorithmPreset, ALG)

    def mm(A, x):    # "jm,cmk->cjk": contract axis -2 of x with A
        C, M, K = x.shape
        y = jax.lax.dot_general(A, x.transpose(1, 0, 2).reshape(M, C * K),
                                (((1,), (0,)), ((), ())), precision=preset)
        return y.reshape(A.shape[0], C, K).transpose(1, 0, 2)

    def mk(x, A):    # "cjk,nk->cjn" / "cjn,kn->cjk": contract last axes
        C, J, K = x.shape
        y = jax.lax.dot_general(x.reshape(C * J, K), A.T,
                                (((1,), (0,)), ((), ())), precision=preset)
        return y.reshape(C, J, A.shape[0])

    def dft_irfft2(spec):  # noqa: F811
        Xr, Xi = jnp.real(spec), jnp.imag(spec)
        Yr = mm(Cr2, Xr) - mm(Si2, Xi)
        Yi = mm(Cr2, Xi) + mm(Si2, Xr)
        return mk(Yr, Ar) + mk(Yi, Ai)

    def dft_rfft2(phys):  # noqa: F811
        Zr = mk(phys, Fr)
        Zi = mk(phys, Fi)
        Wr = mm(Cf2, Zr) - mm(Sf2, Zi)
        Wi = mm(Cf2, Zi) + mm(Sf2, Zr)
        return jax.lax.complex(Wr, Wi)

    got = np.asarray(jax.jit(dft_irfft2)(spec7))
    ref = np.asarray(jax.jit(lambda s: irfft2(s, NX))(spec7))
    print(f"alg={ALG} irfft2 err {np.abs(got-ref).max()/np.abs(ref).max():.2e}",
          flush=True)

run_fft = roundtrip(lambda s: irfft2(s, NX), rfft2)
run_dft = roundtrip(dft_irfft2, dft_rfft2)
t_fft = timeit(run_fft, spec7)
print(f"jnp.fft 7ch roundtrip : {t_fft*1e6:8.1f} us/iter "
      f"({t_fft*1e6/14:6.2f} us/transform)", flush=True)
t_dft = timeit(run_dft, spec7)
print(f"DFT-MXU 7ch roundtrip : {t_dft*1e6:8.1f} us/iter "
      f"({t_dft*1e6/14:6.2f} us/transform)", flush=True)
print(f"ratio dft/fft = {t_dft/t_fft:.3f}", flush=True)
print("done", flush=True)
