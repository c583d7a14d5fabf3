"""On-chip A/B sweep of the fused-attention kernel layout flags.

Sweeps FAIRM_ATTN_P (windows packed per logits matmul) and
FAIRM_ATTN_T_MB (row-tile VMEM budget) over the flagship eval forward,
timing with the honest chained-scan protocol (bench.py docstring). Each
setting is re-traced in a fresh subprocess because the flags are read at
trace time.

r3 results (B=32, v5e): P=1 3.70 MP/s, P=2 3.86, P=4 remote-compile
failure, TMB=8 3.60 -> default P=2/TMB=4. The FAIRM_ATTN_VW
virtual-window path this tool also swept was deleted: it never compiled
on hardware (Mosaic lane-split shape-cast + concat offset limits) and
its premise was disproven (per-head loop count does not move the time).

Usage: python tools/attn_sweep.py [--batch 32] [--iters 16] [--reps 2]
       python tools/attn_sweep.py --one P TMB  (single run)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(args):
    import time

    import jax
    import jax.numpy as jnp

    from frequency_wised_all_in_one_image_restoration_model_tpu import config
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import (
        build_models, eval_forward)

    cfg = config.make_config(
        encoder_type="Uformer", decoder_type="Uformer", L=3,
        encoder_msa_type="freq", degradation_embedding_method=["all_DC"],
        de_type=["4tasks"], patch_size=args.patch,
        crop_test_imgs_size=args.patch,
        dtype=args.dtype, eval_dtype=args.dtype)
    bundle = build_models(cfg, eval_mode=True)
    rng = jax.random.PRNGKey(0)
    B, p = args.batch, args.patch
    x = jax.random.uniform(rng, (B, p, p, 3), dtype=jnp.float32)
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
        out, _ = jax.lax.scan(body, x, None, length=args.iters)
        return jnp.mean(out)

    j = jax.jit(chained)
    for attempt in range(3):
        try:
            float(j(enc_vars, dec_vars, x))  # compile + warm
            best = float("inf")
            for _ in range(max(1, args.reps)):
                t0 = time.perf_counter()
                v = float(j(enc_vars, dec_vars, x))
                dt = time.perf_counter() - t0
                assert v == v
                best = min(best, dt)
            mps = B * p * p * args.iters / best / 1e6
            print(f"RESULT ms={best / args.iters * 1e3:.1f} mps={mps:.2f}",
                  flush=True)
            return
        except Exception as e:
            print(f"attempt {attempt}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            time.sleep(20)
    print("RESULT ms=nan mps=nan", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--one", nargs=3, metavar=("P", "TMB", "Q"))
    ap.add_argument("--grid", default=None,
                    help="semicolon list of P,TMB,Q combos")
    args = ap.parse_args()

    if args.one:
        p_, tmb, q_ = args.one
        os.environ["FAIRM_ATTN_P"] = p_
        os.environ["FAIRM_ATTN_T_MB"] = tmb
        os.environ["FAIRM_ATTN_Q"] = q_
        run_one(args)
        return

    combos = (args.grid.split(";") if args.grid else
              ["1,4,512", "2,4,512", "2,8,512", "2,4,0"])
    for combo in combos:
        p_, tmb, q_ = combo.split(",")
        cmd = [sys.executable, os.path.abspath(__file__), "--one",
               p_, tmb, q_,
               "--batch", str(args.batch), "--iters", str(args.iters),
               "--reps", str(args.reps), "--patch", str(args.patch),
               "--dtype", args.dtype]
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=3600)
        line = [ln for ln in r.stdout.splitlines() if "RESULT" in ln]
        tail = line[-1] if line else (r.stdout + r.stderr)[-200:]
        print(f"P={p_} TMB={tmb} Q={q_}  {tail}", flush=True)


if __name__ == "__main__":
    main()
