"""Component timing probe on the real TPU (flagship eval configuration).

Times encoder-only, decoder-only, and full eval forwards with the honest
chained-scan protocol (see bench.py docstring: block_until_ready on the
tunneled backend returns at enqueue-ack; chain work inside one jit and
fetch a scalar). Also reports XLA FLOP estimates per component so MFU can
be split.

Usage:  python tools/perf_probe.py [--batch 64] [--iters 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def chain_timer(fn, x, iters, *extra):
    """Time `fn` applied `iters` times chained inside one jit.

    ``extra`` (model variables etc.) are passed as jit ARGUMENTS — closing
    over them would bake them in as HLO constants, which the remote
    compile helper chokes on (CLAUDE.md: oversized programs)."""
    def chained(x, *extra):
        def body(carry, _):
            y = fn(carry, *extra)
            return jnp.clip(y, 0.0, 1.0), ()
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.mean(out)

    run = jax.jit(chained)
    float(run(x, *extra))  # compile + warm
    t0 = time.perf_counter()
    v = float(run(x, *extra))
    dt = time.perf_counter() - t0
    assert v == v
    return dt / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from frequency_wised_all_in_one_image_restoration_model_tpu import config
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import (
        build_models, eval_forward)

    cfg = config.make_config(
        encoder_type="Uformer", decoder_type="Uformer",
        L=3, encoder_msa_type="freq",
        degradation_embedding_method=["all_DC"],
        de_type=["4tasks"], patch_size=args.patch,
        crop_test_imgs_size=args.patch,
        dtype=args.dtype, eval_dtype=args.dtype,
    )
    bundle = build_models(cfg, eval_mode=True)
    p = args.patch
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (args.batch, p, p, 3), dtype=jnp.float32)

    x1 = x[:1]
    enc_vars = jax.jit(lambda r, x: bundle.encoder.init(
        {"params": r, "droppath": r}, x, train=False))(rng, x1)
    _, _, inter = jax.jit(lambda v, x: bundle.encoder.apply(
        v, x, train=False))(enc_vars, x1)
    dec_vars = jax.jit(lambda r, x, i: bundle.decoder.init(
        {"params": r, "droppath": r}, x, i, train=False))(
            jax.random.PRNGKey(1), x1, x1 if inter is None else inter)

    def enc_to_img(x, enc_vars, dec_vars, inter_b):
        # encoder alone; collapse inter back to an image-shaped carry
        _, _, ctx = bundle.encode(enc_vars, x, train=False)
        y = sum(jnp.mean(b) for b in ctx.band_inter)
        return x + (y * 0).astype(x.dtype)

    # a batch-shaped degradation context, computed once outside the chain
    _, _, inter_b = jax.jit(lambda v, x: bundle.encoder.apply(
        v, x, train=False))(enc_vars, x)

    def dec_only(x, enc_vars, dec_vars, inter_b):
        return bundle.decode(dec_vars, x, inter_b, train=False)

    def full(x, enc_vars, dec_vars, inter_b):
        return eval_forward(bundle, enc_vars, dec_vars, x)

    n_px = args.batch * p * p / 1e6

    for name, fn in [("full", full), ("encoder", enc_to_img),
                     ("decoder", dec_only)]:
        print(f"compiling {name}...", flush=True)
        for attempt in range(3):
            try:
                dt = chain_timer(fn, x, args.iters, enc_vars, dec_vars,
                                 inter_b)
                break
            except Exception as e:  # transient tunnel failures happen
                print(f"  attempt {attempt}: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                time.sleep(20)
        else:
            continue
        print(f"{name:8s}: {dt*1e3:8.1f} ms/iter  "
              f"({n_px/dt:7.2f} MP/s at B={args.batch})", flush=True)

    # XLA flop estimates
    try:
        full_c = jax.jit(full).lower(x, enc_vars, dec_vars, inter_b).compile()
        fl = full_c.cost_analysis()
        if isinstance(fl, list):
            fl = fl[0]
        print(f"XLA flops/full-batch: {fl.get('flops', float('nan'))/1e9:.1f} G")
    except Exception as e:  # cost analysis is best-effort over the tunnel
        print("cost_analysis unavailable:", e)


if __name__ == "__main__":
    main()
