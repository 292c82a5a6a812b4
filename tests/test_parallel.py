"""Multi-device tests on the 8-virtual-device CPU mesh: slab FFT, packet
sharding, and the full multichip dry run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from juliaraytracingsw_tpu.core.grid import make_grid
from juliaraytracingsw_tpu.coupled.initial_conditions import random_band_psih
from juliaraytracingsw_tpu.parallel.fft import (
    slab_irfft2,
    slab_rfft2,
    slab_sharding_physical,
)
from juliaraytracingsw_tpu.parallel.mesh import (
    make_mesh,
    packet_sharding,
    shard_packets,
)
from juliaraytracingsw_tpu.rays.packets import lattice_packets
from juliaraytracingsw_tpu.rays.raytrace import RayParams, fields_from_psih, raytrace


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


class TestSlabFFT:
    def test_roundtrip_and_match(self, mesh, rng):
        C, ny, nx = 3, 64, 64
        f = jnp.asarray(rng.standard_normal((C, ny, nx)), jnp.float32)
        fsh = jax.device_put(f, slab_sharding_physical(mesh))
        fh = slab_rfft2(fsh, mesh)
        ref = jnp.fft.rfft2(f, axes=(-2, -1))
        nkr = nx // 2 + 1
        np.testing.assert_allclose(
            np.asarray(jnp.abs(fh[..., :nkr] - ref)).max(), 0.0, atol=1e-3
        )
        back = slab_irfft2(fh, nx, mesh)
        np.testing.assert_allclose(np.asarray(back), np.asarray(f), atol=1e-5)

    def test_jit_composes(self, mesh, rng):
        f = jnp.asarray(rng.standard_normal((1, 32, 32)), jnp.float32)
        f = jax.device_put(f, slab_sharding_physical(mesh))

        @jax.jit
        def roundtrip(x):
            return slab_irfft2(slab_rfft2(x, mesh), 32, mesh)

        np.testing.assert_allclose(np.asarray(roundtrip(f)),
                                   np.asarray(f), atol=1e-5)


class TestShardedRays:
    def test_sharded_matches_unsharded(self, mesh, rng):
        g = make_grid(32)
        psih = random_band_psih(g, rng, amp=0.05)
        rp = RayParams(f=3.0, Cg=1.0, x0=float(g.x[0]), y0=float(g.y[0]),
                       dx=g.dx, dy=g.dy)
        fields = fields_from_psih(psih, g)
        p = lattice_packets(8, g.Lx, g.Ly, k0=5.0)  # 64 packets / 8 devices
        out_ref = raytrace(p, fields, fields, 0.0, 0.1, rp, nsubsteps=4)

        psh = shard_packets(p, mesh)
        with mesh:
            out_sh = raytrace(psh, fields, fields, 0.0, 0.1, rp, nsubsteps=4)
        np.testing.assert_allclose(np.asarray(out_sh.x), np.asarray(out_ref.x),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_sh.k), np.asarray(out_ref.k),
                                   atol=1e-5)
        # output stays sharded over the packet axis
        assert not out_sh.x.sharding.is_fully_replicated

    def test_gradient_psum_across_shards(self, mesh, rng):
        """Gradient of a sharded-packet loss w.r.t. replicated fields equals
        the unsharded gradient (XLA inserts the psum)."""
        g = make_grid(32)
        psih = random_band_psih(g, rng, amp=0.05)
        rp = RayParams(f=3.0, Cg=1.0, x0=float(g.x[0]), y0=float(g.y[0]),
                       dx=g.dx, dy=g.dy)
        p = lattice_packets(8, g.Lx, g.Ly, k0=5.0)

        def loss(psih_in, pk):
            fields = fields_from_psih(psih_in, g)
            out = raytrace(pk, fields, fields, 0.0, 0.1, rp, nsubsteps=2)
            return jnp.mean(out.k**2 + out.l**2)

        g_ref = jax.grad(loss)(psih, p)
        psh = shard_packets(p, mesh)
        with mesh:
            g_sh = jax.jit(jax.grad(loss))(psih, psh)
        np.testing.assert_allclose(np.asarray(jnp.abs(g_sh - g_ref)).max(),
                                   0.0, atol=1e-6)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.isfinite(np.asarray(out[3].x)).all()
