"""A/B harness: time the flagship eval chain under kernel on/off flags.

Usage: python tools/ab_flags.py BAND_FOLD FUSED_ATTENTION [batch] [iters]
Prints one line: `flags=<...> ms_per_iter=<...> mps=<...>`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

fold, attn = sys.argv[1], sys.argv[2]
B = int(sys.argv[3]) if len(sys.argv) > 3 else 64
ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 8
os.environ["FAIRM_BAND_FOLD"] = fold
os.environ["FAIRM_FUSED_ATTENTION"] = attn

import jax
import jax.numpy as jnp

from frequency_wised_all_in_one_image_restoration_model_tpu import config
from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import (
    build_models, eval_forward)

cfg = config.make_config(
    encoder_type="Uformer", decoder_type="Uformer", L=3,
    encoder_msa_type="freq", degradation_embedding_method=["all_DC"],
    de_type=["4tasks"], patch_size=128, crop_test_imgs_size=128,
    dtype="bfloat16", eval_dtype="bfloat16")
bundle = build_models(cfg, eval_mode=True)
rng = jax.random.PRNGKey(0)
x = jax.random.uniform(rng, (B, 128, 128, 3), dtype=jnp.float32)
x1 = x[:1]
enc_vars = jax.jit(lambda r, x: bundle.encoder.init(
    {"params": r, "droppath": r}, x, train=False))(rng, x1)
_, _, inter = jax.jit(lambda v, x: bundle.encoder.apply(
    v, x, train=False))(enc_vars, x1)
dec_vars = jax.jit(lambda r, x, i: bundle.decoder.init(
    {"params": r, "droppath": r}, x, i, train=False))(
        jax.random.PRNGKey(1), x1, inter)


def chained(ev, dv, x):
    def body(c, _):
        y = eval_forward(bundle, ev, dv, c)
        return jnp.clip(y, 0.0, 1.0), ()

    out, _ = jax.lax.scan(body, x, None, length=ITERS)
    return jnp.mean(out)


j = jax.jit(chained)
float(j(enc_vars, dec_vars, x))
t0 = time.perf_counter()
v = float(j(enc_vars, dec_vars, x))
dt = time.perf_counter() - t0
assert v == v
mps = B * 128 * 128 * ITERS / dt / 1e6
print(f"flags=fold:{fold},attn:{attn} "
      f"ms_per_iter={dt / ITERS * 1e3:.1f} mps={mps:.2f}", flush=True)
