"""Throughput benchmark: restored megapixels/sec/chip on the flagship model.

Protocol matches the north-star metric (BASELINE.md): eval-mode restoration
of 128x128 patches (the reference's tiled-eval unit, test.py:41-59) through
the flagship Uformer+Uformer configuration (L=3 frequency-wise MSA, all_DC
injection), bf16 compute, steady-state timing on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s/chip", "vs_baseline": N}
``vs_baseline`` is the ratio against the 200 MP/s/chip target
(BASELINE.json north_star; the reference publishes no numbers of its own).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from frequency_wised_all_in_one_image_restoration_model_tpu import config
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import (
        build_models, eval_forward)

    cfg = config.make_config(
        encoder_type="Uformer", decoder_type="Uformer",
        L=3, encoder_msa_type="freq",
        degradation_embedding_method=["all_DC"],
        de_type=["4tasks"], patch_size=128, crop_test_imgs_size=128,
        dtype="bfloat16", eval_dtype="bfloat16",
    )
    bundle = build_models(cfg, eval_mode=True)

    batch = 16
    p = cfg.patch_size
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (batch, p, p, 3), dtype=jnp.float32)

    x_init = x[:1]
    enc_vars = jax.jit(lambda r, x: bundle.encoder.init(
        {"params": r, "droppath": r}, x, train=False))(rng, x_init)
    _, _, inter = jax.jit(lambda v, x: bundle.encoder.apply(
        v, x, train=False))(enc_vars, x_init)
    dec_vars = jax.jit(lambda r, x, inter: bundle.decoder.init(
        {"params": r, "droppath": r}, x, inter, train=False))(
            jax.random.PRNGKey(1), x_init, inter)

    fwd = jax.jit(lambda ev, dv, x: eval_forward(bundle, ev, dv, x))

    # warmup / compile
    fwd(enc_vars, dec_vars, x).block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(enc_vars, dec_vars, x)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    megapixels = batch * p * p * iters / 1e6
    mps = megapixels / dt
    print(json.dumps({
        "metric": "restored_megapixels_per_sec_per_chip",
        "value": round(mps, 3),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps / 200.0, 4),
    }))


if __name__ == "__main__":
    main()
