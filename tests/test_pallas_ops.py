"""Pallas kernel tests (interpreter mode on CPU; compiled path exercised on
real TPU by bench/opt scripts)."""
import jax
import jax.numpy as jnp
import numpy as np

from juliaraytracingsw_tpu.ops.pallas_interp import (
    ray_rhs_pallas,
    ray_rhs_reference,
)


def test_ray_rhs_pallas_matches_reference(rng):
    ny = nx = 64
    fields = jnp.asarray(rng.standard_normal((5, ny, nx)), jnp.float32)
    N = 4096
    x = jnp.asarray(rng.uniform(-3, 3, N), jnp.float32)
    y = jnp.asarray(rng.uniform(-3, 3, N), jnp.float32)
    k = jnp.asarray(rng.uniform(1, 5, N), jnp.float32)
    l = jnp.asarray(rng.uniform(-2, 2, N), jnp.float32)
    s = jnp.asarray(np.where(rng.random(N) < 0.5, -1.0, 1.0), jnp.float32)
    kw = dict(x0=-np.pi, y0=-np.pi, dxg=2 * np.pi / nx, dyg=2 * np.pi / ny,
              f=3.0, Cg=1.0)
    outs_p = ray_rhs_pallas(x, y, k, l, s, fields, interpret=True, **kw)
    outs_r = ray_rhs_reference(x, y, k, l, s, fields, **kw)
    for a, b in zip(outs_p, outs_r):
        rel = float((jnp.abs(a - b) / (jnp.abs(b) + 1)).max())
        assert rel < 5e-5, rel
