"""Fused LeFF kernel (ops/pallas/leff.py): parity vs the unfused XLA ops
(interpret mode on CPU), tile-boundary coverage, grad path, and parameter
-tree compatibility of the module's fused/unfused branches."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frequency_wised_all_in_one_image_restoration_model_tpu.ops.pallas.leff import (
    fused_leff, _xla_reference)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _setup(rng, B=2, H=16, W=16, C=8, Hd=32):
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32)) * 0.1
    return (mk(B, H, W, C) * 10, mk(C, Hd), mk(Hd), mk(3, 3, Hd), mk(Hd),
            mk(Hd, C), mk(C))


def test_parity_fp32(rng):
    args = _setup(rng)
    with jax.default_matmul_precision("highest"):
        out = fused_leff(*args, True)
        ref = _xla_reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_parity_multi_tile(rng):
    """Row-tile boundaries (incl. the zeroed image-boundary halo rows)."""
    args = _setup(rng, H=32)
    with jax.default_matmul_precision("highest"):
        ref = _xla_reference(*args)
        for T in (4, 8, 16):
            out = fused_leff(*args, True, T)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5,
                                       err_msg=f"T={T}")


def test_parity_bf16(rng):
    x, *w = _setup(rng)
    out = fused_leff(x.astype(jnp.bfloat16), *w, True)
    ref = _xla_reference(x.astype(jnp.bfloat16), *w)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_grad_matches_unfused(rng):
    args = _setup(rng)

    def loss(fn, x, *w):
        return jnp.sum(fn(x, *w) ** 2)

    g_fused = jax.grad(lambda *a: loss(
        lambda *b: fused_leff(*b, True), *a), argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(lambda *a: loss(_xla_reference, *a),
                     argnums=tuple(range(7)))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_leff_module_param_tree_identical(rng):
    """The fused branch's parameter twins produce byte-identical trees to
    the nn.Dense/nn.Conv branch (checkpoints interchangeable)."""
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.uformer_blocks import (
        LeFF)

    x = jnp.asarray(rng.standard_normal((2, 64, 8)).astype(np.float32))
    leff = LeFF(hidden=32, dtype=jnp.bfloat16)

    old = os.environ.get("FAIRM_FUSED_LEFF")
    try:
        os.environ["FAIRM_FUSED_LEFF"] = "0"
        v_unfused = leff.init(jax.random.PRNGKey(0), x)
        os.environ["FAIRM_FUSED_LEFF"] = "1"
        # init would invoke the kernel un-interpreted; on CPU only the
        # param structure is checkable via eval_shape
        shapes = jax.eval_shape(
            lambda r, x: leff.init(r, x), jax.random.PRNGKey(0), x)
    finally:
        if old is None:
            os.environ.pop("FAIRM_FUSED_LEFF", None)
        else:
            os.environ["FAIRM_FUSED_LEFF"] = old

    t1 = jax.tree_util.tree_structure(v_unfused)
    t2 = jax.tree_util.tree_structure(shapes)
    assert t1 == t2
    flat1 = jax.tree_util.tree_leaves_with_path(v_unfused)
    flat2 = jax.tree_util.tree_leaves_with_path(shapes)
    for (p1, l1), (p2, l2) in zip(flat1, flat2):
        assert p1 == p2
        assert np.shape(l1) == l2.shape, f"{p1}: {np.shape(l1)} vs {l2.shape}"
