"""Training-step timing probe on the real TPU (flagship configuration).

Times the phase-A (encoder/contrastive) and joint (encoder+decoder)
train steps at flagship dims with the honest chained-scan protocol
(bench.py docstring: ``block_until_ready`` on the tunneled backend
returns at enqueue-ack; chain steps inside one jit and fetch a scalar).
The TrainState is the scan carry, so buffer reuse matches the donated
steady-state of the real loop.

Also reports XLA cost-analysis FLOPs per step (forward+backward) so the
training MFU can be computed, and peak-memory estimates from
``compiled.memory_analysis()`` to judge whether a remat policy is
needed.

Usage: python tools/train_probe.py [--batch 4] [--iters 8] [--remat ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--patch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--phase", choices=["encoder", "joint", "both"],
                    default="both")
    ap.add_argument("--profile", action="store_true",
                    help="decompose the joint step: forward-only (loss), "
                         "forward+backward (grads), full step — the "
                         "differences isolate backward vs optimizer/EMA/"
                         "queue glue (VERDICT r3 #1)")
    args = ap.parse_args()

    from frequency_wised_all_in_one_image_restoration_model_tpu import config
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import (
        build_models)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training import steps
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.state import (
        create_train_state)

    import dataclasses

    cfg = config.make_config(
        encoder_type="Uformer", decoder_type="Uformer",
        L=3, encoder_msa_type="freq",
        degradation_embedding_method=["all_DC"],
        de_type=["4tasks"], patch_size=args.patch,
        crop_test_imgs_size=args.patch,
        dtype=args.dtype, eval_dtype=args.dtype,
    )
    # batch_size is CLI-derived (= len(de_type), option.py:76); the probe
    # sweeps it independently
    cfg = dataclasses.replace(cfg, batch_size=args.batch, remat=args.remat)
    bundle = build_models(cfg, eval_mode=False)
    B, p = args.batch, args.patch
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.uniform(0, 1, (B, p, p, 3)).astype(np.float32))
    batch = {"d1": mk(), "d2": mk(), "c1": mk(),
             "de_id": jnp.zeros((B,), jnp.int32)}

    state = create_train_state(cfg, bundle, jax.random.PRNGKey(0), batch)

    n_px = B * p * p / 1e6

    if args.profile:
        variants = [("fwd (loss)", True, "loss"),
                    ("fwd+bwd (grads)", True, "grads"),
                    ("full step", True, "full")]
    else:
        phases = {"encoder": (("encoder-phase", False),),
                  "joint": (("joint", True),),
                  "both": (("encoder-phase", False), ("joint", True))}
        variants = [(name, joint, "full")
                    for name, joint in phases[args.phase]]

    for name, joint, upto in variants:
        step = steps.make_train_step(cfg, bundle, joint=joint, upto=upto)

        def chained(state, batch):
            def body(carry, _):
                new_state, metrics = step(carry, batch)
                # fetch gnorm when present so the backward of the
                # truncated 'grads' variant cannot be DCE'd
                return new_state, metrics.get("gnorm", metrics["loss"])
            final, losses_ = jax.lax.scan(body, state, None,
                                          length=args.iters)
            return jnp.sum(losses_)

        run = jax.jit(chained)
        print(f"compiling {name} (B={B}, {p}x{p}, {args.dtype})...",
              flush=True)
        c = run.lower(state, batch).compile()
        try:
            ma = c.memory_analysis()
            print(f"  peak temp {ma.temp_size_in_bytes/2**30:.2f} GiB, "
                  f"args {ma.argument_size_in_bytes/2**30:.2f} GiB",
                  flush=True)
        except Exception as e:
            print(f"  memory_analysis unavailable: {e}", flush=True)
        try:
            fl = c.cost_analysis()
            if isinstance(fl, list):
                fl = fl[0]
            print(f"  XLA flops/step: {fl['flops']/args.iters/1e9:.1f} "
                  f"GFLOP", flush=True)
        except Exception as e:
            print(f"  cost_analysis unavailable: {e}", flush=True)

        for attempt in range(3):
            try:
                float(c(state, batch))  # warm
                t0 = time.perf_counter()
                v = float(c(state, batch))
                dt = (time.perf_counter() - t0) / args.iters
                assert v == v
                break
            except Exception as e:
                print(f"  attempt {attempt}: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                time.sleep(20)
        else:
            continue
        print(f"{name:14s}: {dt*1e3:8.1f} ms/step  "
              f"({n_px/dt:6.2f} MP/s at B={B})", flush=True)


if __name__ == "__main__":
    main()
