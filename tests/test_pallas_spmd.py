"""Batch partitioning of the fused Pallas ops (ops/pallas/partition.py).

Without a sharding rule, GSPMD/Shardy REPLICATE an opaque pallas call:
every device computes the full global batch, numerically correct but an
N-way compute waste under data parallelism. These tests pin both halves
of the fix on the virtual 8-device mesh: the fused LeWin block applied to
a data-sharded batch must (a) produce a data-SHARDED output (the
replication regression is invisible to numeric checks), (b) match the
unsharded output, and (c) match unsharded gradients — including the
kernel-routed backward's window-attention kernel, whose dbias is
psum-reduced across shards.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from frequency_wised_all_in_one_image_restoration_model_tpu.models.uformer_lewin import (
    LeWinBlock)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(autouse=True)
def _fused(monkeypatch):
    monkeypatch.setenv("FAIRM_FUSED_BLOCK", "1")
    monkeypatch.setenv("FAIRM_PALLAS_INTERPRET", "1")


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(8, 1), ("data", "model"))


def _block_io(rng, **kw):
    cfg = dict(dim=16, input_resolution=16, num_heads=2, win_size=8,
               shift_size=4)
    cfg.update(kw)
    blk = LeWinBlock(**cfg)
    x = jnp.asarray(rng.standard_normal((8, 256, 16)).astype(np.float32))
    v = blk.init({"params": jax.random.PRNGKey(0)}, x)
    return blk, v, x


def _shard(mesh, v, x):
    return (jax.device_put(v, NamedSharding(mesh, P())),
            jax.device_put(x, NamedSharding(mesh, P("data"))))


def test_fused_block_shards_along_data(rng):
    blk, v, x = _block_io(rng)
    f = jax.jit(lambda v, x: blk.apply(v, x)[0])
    ref = f(v, x)

    vs, xs = _shard(_mesh(), v, x)
    out = f(vs, xs)
    # the load-bearing assertion: replicated-but-correct is the failure
    # mode this guards against
    assert "data" in str(out.sharding.spec), out.sharding
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_block_sharded_grads_match(rng):
    blk, v, x = _block_io(rng)

    def loss(v, x):
        return jnp.sum(blk.apply(v, x)[0].astype(jnp.float32) ** 2)

    g_ref = jax.jit(jax.grad(loss))(v, x)
    vs, xs = _shard(_mesh(), v, x)
    g_sh = jax.jit(jax.grad(loss))(vs, xs)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_window_splitting_shard_falls_back_replicated(rng):
    """fused_window_attention with a shift mask: 8 windows (2 images x
    nW=4) sharded over 8 devices puts 1 window per shard — the quantum
    guard (shards must align to whole images for the mask's cycling index
    map) must fall back to a replicated lowering, not compute garbage."""
    from frequency_wised_all_in_one_image_restoration_model_tpu.ops.pallas.window_attention import (
        fused_window_attention)

    h, n, d, nW = 2, 64, 8, 4
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    q, k, v = f32(8, h, n, d), f32(8, h, n, d), f32(8, h, n, d)
    bias = f32(h, n, n)
    mask = f32(nW, n, n)

    f = jax.jit(lambda *a: fused_window_attention(*a, 0.125, nW, True))
    ref = f(q, k, v, bias, mask)
    mesh = _mesh()
    sh = lambda t: jax.device_put(t, NamedSharding(mesh, P("data")))
    rep = lambda t: jax.device_put(t, NamedSharding(mesh, P()))
    out = f(sh(q), sh(k), sh(v), rep(bias), rep(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_spmd_flag_off_still_works(rng, monkeypatch):
    monkeypatch.setenv("FAIRM_PALLAS_SPMD", "0")
    blk, v, x = _block_io(rng)
    f = jax.jit(lambda v, x: blk.apply(v, x)[0])
    ref = f(v, x)
    vs, xs = _shard(_mesh(), v, x)
    out = f(vs, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
