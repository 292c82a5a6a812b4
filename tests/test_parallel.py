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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_slab_fft_dense_dft_matches(monkeypatch):
    """JRSW_FFT=dft routes the per-shard slab transform pieces through
    dense 1-D DFT matmuls (round 5) — must match jnp.fft to f32 roundoff
    across the all_to_all pipeline."""
    from juliaraytracingsw_tpu.parallel.fft import (
        slab_irfft2,
        slab_rfft2,
        slab_sharding_physical,
    )
    from juliaraytracingsw_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((3, 64, 64)), jnp.float32)
    ref = jnp.fft.rfft2(x, axes=(-2, -1))
    monkeypatch.setenv("JRSW_FFT", "dft")
    jax.clear_caches()
    try:
        xs = jax.device_put(x, slab_sharding_physical(mesh))
        spec = slab_rfft2(xs, mesh)
        back = slab_irfft2(spec, 64, mesh)
    finally:
        monkeypatch.delenv("JRSW_FFT")
        jax.clear_caches()
    np.testing.assert_allclose(np.asarray(spec)[..., :33], np.asarray(ref),
                               rtol=1e-5,
                               atol=1e-5 * float(jnp.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=1e-5, atol=2e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_dense_dft_matches_replicated(monkeypatch):
    """A sharded RSW step with the dense-DFT slab transforms must still
    match the replicated step (the full calcN through shard_map)."""
    from juliaraytracingsw_tpu.core.grid import make_grid
    from juliaraytracingsw_tpu.core.steppers import zero_clock
    from juliaraytracingsw_tpu.coupled.driver import derive_nu
    from juliaraytracingsw_tpu.coupled.initial_conditions import band_geo_wave_ic
    from juliaraytracingsw_tpu.models import rsw
    from juliaraytracingsw_tpu.models.base import build_stepper
    from juliaraytracingsw_tpu.parallel.mesh import make_mesh
    from juliaraytracingsw_tpu.parallel.sharded_rsw import ShardedRSW

    g = make_grid(64)
    dt = 2e-3
    model = rsw.make_model(g, nu=derive_nu(1.0, 64, 4, dt), nnu=4,
                           f=3.0, Cg=1.0)
    sol0 = band_geo_wave_ic(g, np.random.default_rng(4), Kg=(4, 7),
                            Kw=(0, 3), ag=0.3, aw=0.05, f=3.0, Cg=1.0)
    init_r, step_r = build_stepper(model, "IFMAB3", dt=dt)
    sol_r, _, st_r = step_r(sol0, zero_clock(), init_r(sol0))
    sol_r, _, _ = step_r(sol_r, zero_clock(), st_r)

    monkeypatch.setenv("JRSW_FFT", "dft")
    jax.clear_caches()
    try:
        sh = ShardedRSW(g, model.params, make_mesh(8), dt=dt)
        init_s, step_s = sh.stepper()
        s_sh = sh.shard_solution(sol0)
        s_sh, c, st = step_s(s_sh, zero_clock(), init_s(s_sh))
        s_sh, _, _ = step_s(s_sh, c, st)
        got = sh.unshard(s_sh)
    finally:
        monkeypatch.delenv("JRSW_FFT")
        jax.clear_caches()
    ref = np.asarray(sol_r)
    np.testing.assert_allclose(got, ref, rtol=2e-4,
                               atol=2e-5 * np.abs(ref).max())
