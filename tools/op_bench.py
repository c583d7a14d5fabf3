"""Per-stage op micro-bench on the real TPU: fused vs XLA for window
attention (grouped vs per-band intra) and LeFF, at every shape the flagship
model actually runs (B=64, 128x128 patches, L=3, embed 28/32).

Timing: chained scan + scalar fetch (see bench.py docstring).

Usage: python tools/op_bench.py [attn|intra] ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 64


_CALL_OVERHEAD = None


def call_overhead():
    """Fixed per-call cost of one chained-timer invocation on this backend
    (tunnel RTT + dispatch + scalar fetch). Measured 2026-08-18: ~26 ms,
    independent of iters and of the work inside — which silently added
    26/iters ms to every per-iter number this file ever printed (the r2/r3
    'isolated 5x slower than e2e' mystery was exactly this). Calibrated
    once per process with an empty elementwise chain and subtracted."""
    global _CALL_OVERHEAD
    if _CALL_OVERHEAD is None:
        x = jnp.ones((256, 256), jnp.bfloat16)

        def chained(x):
            out, _ = jax.lax.scan(lambda c, _: (c * 1.0001, ()), x, None,
                                  length=16)
            return jnp.mean(out.astype(jnp.float32))

        j = jax.jit(chained)
        float(j(x))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(j(x))
            best = min(best, time.perf_counter() - t0)
        _CALL_OVERHEAD = best
        print(f"[per-call overhead: {best*1e3:.1f} ms — subtracted]",
              flush=True)
    return _CALL_OVERHEAD


def timer(fn, args, iters=16):
    def chained(*args):
        def body(c, _):
            y = fn(c, *args[1:])
            return (y * 0.999).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, args[0], None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    j = jax.jit(chained)
    float(j(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        v = float(j(*args))
        best = min(best, time.perf_counter() - t0)
        assert v == v
    return max(best - call_overhead(), 1e-9) / iters


def bench_attn():
    """Decoder-style origin window attention: kernel vs XLA."""
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.uformer_blocks import (
        attention_core)

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    # (res, dim, heads): decoder stages, win 8 -> n=64
    shapes = [(128, 32, 1), (64, 64, 2), (32, 128, 4), (16, 256, 8),
              (8, 512, 16)]
    n = 64
    for (res, dim, h) in shapes:
        nW = max((res // 8) ** 2, 1)
        w = B * nW
        hd = dim // h
        q, k, v = (mk(w, h, n, hd).astype(jnp.bfloat16) for _ in range(3))
        bias = mk(h, n, n)
        for flag in ("1", "0"):
            os.environ["FAIRM_FUSED_ATTENTION"] = flag
            t = timer(lambda q, k, v, bias: attention_core(
                q, k, v, bias, None, 1, jnp.bfloat16, need_probs=False)[0]
                .reshape(q.shape), (q, k, v, bias))
            fl = 2 * w * h * (n * n * hd * 2)  # logits + AV (unpacked)
            print(f"attn res={res:3d} dim={dim:3d} h={h:2d} w={w}: "
                  f"{'kernel' if flag == '1' else 'xla   '} {t*1e3:7.2f} ms "
                  f"({fl/t/1e12:5.1f} TF/s eff)", flush=True)


def bench_intra():
    """Encoder freq intra: grouped (L*n tokens) vs per-band slices."""
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.uformer_blocks import (
        attention_core)

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    L, n = 3, 64
    shapes = [(128, 28, 1), (64, 56, 2), (32, 112, 4), (16, 224, 8)]
    for (res, dim, h) in shapes:
        nW = (res // 8) ** 2
        bnw = B * nW
        hd = dim // h
        qg, kg, vg = (mk(bnw, h, L * n, hd).astype(jnp.bfloat16)
                      for _ in range(3))
        biasg = mk(h, L * n, L * n)
        qs, ks, vs = (mk(L * bnw, h, n, hd).astype(jnp.bfloat16)
                      for _ in range(3))
        biass = mk(h, n, n)
        os.environ["FAIRM_FUSED_ATTENTION"] = "1"
        tg = timer(lambda q, k, v, b: attention_core(
            q, k, v, b, None, 1, jnp.bfloat16, need_probs=False)[0]
            .reshape(q.shape), (qg, kg, vg, biasg))

        def per_band(q, k, v, b):
            outs = []
            for l in range(L):
                sl = slice(l * bnw, (l + 1) * bnw)
                o, _ = attention_core(q[sl], k[sl], v[sl], b, None, 1,
                                      jnp.bfloat16, need_probs=False)
                outs.append(o)
            return jnp.concatenate(outs, 0).reshape(q.shape)

        tb = timer(per_band, (qs, ks, vs, biass))
        print(f"intra res={res:3d} dim={dim:3d} h={h:2d}: grouped "
              f"{tg*1e3:7.2f} ms  per-band {tb*1e3:7.2f} ms  "
              f"speedup {tg/tb:5.2f}x", flush=True)


def bench_block():
    """Whole LeWinBlock (origin MSA, no injection) vs its parts: the
    difference is 'glue' (LN, qkv/proj, window partition, residuals)."""
    import flax.linen as nn
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.uformer_lewin import (
        LeWinBlock)

    rng_np = np.random.default_rng(0)
    shapes = [(128, 32, 1), (64, 64, 2), (32, 128, 4), (16, 256, 8),
              (8, 512, 16)]
    for (res, dim, h) in shapes:
        blk = LeWinBlock(dim=dim, input_resolution=res, num_heads=h,
                         win_size=8, shift_size=0, dtype=jnp.bfloat16)
        x = jnp.asarray(rng_np.standard_normal(
            (B, res * res, dim)).astype(np.float32)).astype(jnp.bfloat16)
        variables = jax.jit(blk.init)(jax.random.PRNGKey(0), x)

        def fwd(x, variables):
            y, _ = blk.apply(variables, x, deterministic=True)
            return y.astype(x.dtype)

        t = timer(fwd, (x, variables))
        print(f"block res={res:3d} dim={dim:3d} h={h:2d}: {t*1e3:7.2f} ms",
              flush=True)


def bench_dcn():
    """Pallas gather-free DCN kernel vs the exact gather composite, at the
    DGRN shape (B=8 x 128^2 x 64ch) — and a real-chip equality check on
    clamped offsets (the kernel's defining property)."""
    from frequency_wised_all_in_one_image_restoration_model_tpu.ops.deform_conv import (
        _exact_dcn, _dcn_fast)

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    Bd, H, W, C = 8, 128, 128, 64
    x = (mk(Bd, H, W, C) * 0.3).astype(jnp.bfloat16)
    off = mk(Bd, H, W, 18) * 1.5
    mask = jax.nn.sigmoid(mk(Bd, H, W, 9))
    w = mk(3, 3, C, C) * 0.1
    b = mk(C) * 0.1

    # correctness on-chip: kernel == composite on clamped offsets
    off_c = jnp.clip(off, -2.0, 2.0)
    got = np.asarray(_dcn_fast(x, off, mask, w, b, 2, 1, 1),
                     dtype=np.float32)
    ref = np.asarray(_exact_dcn(x.astype(jnp.float32), off_c, mask, w, b),
                     dtype=np.float32)
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    print(f"DCN on-chip rel err vs clamped composite: {err:.2e}", flush=True)

    tk = timer(lambda x: _dcn_fast(x, off, mask, w, b, 2, 1, 1)
               .astype(x.dtype), (x,))
    tc = timer(lambda x: _exact_dcn(x, off, mask, w, b).astype(x.dtype),
               (x,))
    print(f"DCN B={Bd} {H}x{W}x{C}: kernel {tk*1e3:7.2f} ms  "
          f"composite {tc*1e3:7.2f} ms  speedup {tc/tk:5.2f}x", flush=True)




def bench_blockk():
    """Fused LeWin-block kernels at every flagship decoder/encoder stage
    shape: ms per (attention+ffn) pair, B=8, bf16."""
    from frequency_wised_all_in_one_image_restoration_model_tpu.ops.pallas.lewin_block import (
        fused_block_attention, fused_block_ffn, fused_freq_inter,
        fused_freq_intra)

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    B = int(os.environ.get("OPB_BATCH", "8"))

    # decoder stages: (name, res, C, h, depth)
    dec = [("enc0", 128, 56, 1, 2), ("enc1", 64, 112, 2, 2),
           ("enc2", 32, 224, 4, 8), ("enc3", 16, 448, 8, 8),
           ("conv", 8, 896, 16, 4), ("dec3", 16, 896, 16, 8),
           ("dec2", 32, 448, 8, 8), ("dec1", 64, 224, 4, 2),
           ("dec0", 128, 112, 2, 2)]
    tot = 0.0
    for name, res, C, h, depth in dec:
        d = C // h
        n = 64
        x = (mk(B, res, res, C) * 0.3).astype(jnp.bfloat16)
        lns, lnb = 1.0 + 0.1 * mk(C), 0.1 * mk(C)
        w3 = lambda: mk(h, C, d) * 0.1
        b2_ = lambda: mk(h, d) * 0.1
        wp3, bp = mk(h, d, C) * 0.1, mk(C) * 0.1
        bias = mk(h, n, n) * 0.05
        hid = 4 * C
        w1, b1 = mk(C, hid) * 0.1, mk(hid) * 0.1
        wd, bd = mk(3, 3, hid) * 0.1, mk(hid) * 0.1
        w2, b2 = mk(hid, C) * 0.1, mk(C) * 0.1

        # weights as timer ARGS, not closures: captured arrays become HLO
        # constants (CLAUDE.md), which is both unrepresentative of the real
        # model (variables are jit args there) and a suspected cause of the
        # 5x isolated-vs-e2e gap measured in r3
        wq, bq, wk, bk, wv, bv = w3(), b2_(), w3(), b2_(), w3(), b2_()

        def pair(x, wq, bq, wk, bk, wv, bv, wp3, bp, bias, lns, lnb,
                 w1, b1, wd, bd, w2, b2):
            y = fused_block_attention(x, lns, lnb, wq, bq, wk, bk, wv, bv,
                                      wp3, bp, bias, None, None, 8)
            return fused_block_ffn(y, lns, lnb, w1, b1, wd, bd, w2,
                                   b2).astype(x.dtype)

        t = timer(pair, (x, wq, bq, wk, bk, wv, bv, wp3, bp, bias, lns,
                         lnb, w1, b1, wd, bd, w2, b2))
        tot += t * depth
        print(f"blockk {name:5s} res{res:3d} C{C:3d} h{h:2d}: "
              f"{t*1e3:6.2f} ms/block x{depth} = {t*depth*1e3:6.1f} ms",
              flush=True)
    print(f"blockk decoder-equivalent total: {tot*1e3:7.1f} ms", flush=True)

    # encoder freq stages: (name, res, C, h, depth), L=3
    L = 3
    enc = [("fenc0", 128, 28, 1, 2), ("fenc1", 64, 56, 2, 2),
           ("fenc2", 32, 112, 4, 2), ("fenc3", 16, 224, 8, 2),
           ("fbott", 8, 448, 16, 2)]
    tot = 0.0
    for name, res, C, h, depth in enc:
        d = C // h
        n = 64
        x = (mk(L * B, res, res, C) * 0.3).astype(jnp.bfloat16)
        lns, lnb = 1.0 + 0.1 * mk(C), 0.1 * mk(C)
        w3 = lambda: mk(h, C, d) * 0.1
        b2_ = lambda: mk(h, d) * 0.1
        wp3, bp = mk(h, d, C) * 0.1, mk(C) * 0.1
        biasA = mk(L, h, n, n) * 0.05
        biasB = mk(h, L * n, L * n) * 0.05
        hid = 4 * C
        w1, b1 = mk(C, hid) * 0.1, mk(hid) * 0.1
        wd, bd = mk(3, 3, hid) * 0.1, mk(hid) * 0.1
        w2, b2 = mk(hid, C) * 0.1, mk(C) * 0.1

        wA = tuple(w3() if i % 2 == 0 else b2_() for i in range(6))
        wB = tuple(w3() if i % 2 == 0 else b2_() for i in range(6))

        def pair(x, wA, wB, wp3, bp, biasA, biasB, lns, lnb, w1, b1, wd,
                 bd, w2, b2):
            y1 = fused_freq_intra(x, lns, lnb, *wA, wp3, bp, biasA, None,
                                  L, 8)
            y = fused_freq_inter(y1, x, *wB, wp3, bp, biasB, None, L, 8)
            return fused_block_ffn(y, lns, lnb, w1, b1, wd, bd, w2,
                                   b2).astype(x.dtype)

        t = timer(pair, (x, wA, wB, wp3, bp, biasA, biasB, lns, lnb, w1,
                         b1, wd, bd, w2, b2))
        tot += t * depth
        print(f"blockk {name:5s} res{res:3d} C{C:3d} h{h:2d}: "
              f"{t*1e3:6.2f} ms/block x{depth} = {t*depth*1e3:6.1f} ms",
              flush=True)
    print(f"blockk encoder-equivalent total: {tot*1e3:7.1f} ms", flush=True)


def bench_merged():
    """Single-dispatch merged block kernel vs the half-kernel pair, at
    every flagship decoder stage shape (shifted block: the merged kernel
    also absorbs the two jnp.roll round-trips)."""
    from frequency_wised_all_in_one_image_restoration_model_tpu.ops import (
        windows as win_ops)
    from frequency_wised_all_in_one_image_restoration_model_tpu.ops.pallas.lewin_block import (
        fused_block_attention, fused_block_ffn, fused_block_merged,
        merged_block_fits)

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    B = int(os.environ.get("OPB_BATCH", "8"))
    win, n = 8, 64

    dec = [("enc0", 128, 56, 1, 2), ("enc1", 64, 112, 2, 2),
           ("enc2", 32, 224, 4, 8), ("enc3", 16, 448, 8, 8),
           ("conv", 8, 896, 16, 4), ("dec3", 16, 896, 16, 8),
           ("dec2", 32, 448, 8, 8), ("dec1", 64, 224, 4, 2),
           ("dec0", 128, 112, 2, 2)]
    tot_p = tot_m = 0.0
    for name, res, C, h, depth in dec:
        d = C // h
        Hd = 4 * C
        if not merged_block_fits(C, Hd, 2, res, win):
            print(f"merged {name:5s} res{res:3d} C{C:3d}: no fit -> pair",
                  flush=True)
            continue
        shift = 4 if res > win else 0
        x = (mk(B, res, res, C) * 0.3).astype(jnp.bfloat16)
        lns, lnb = 1.0 + 0.1 * mk(C), 0.1 * mk(C)
        wq, bq, wk, bk, wv, bv = (mk(h, C, d) * 0.1, mk(h, d) * 0.1,
                                  mk(h, C, d) * 0.1, mk(h, d) * 0.1,
                                  mk(h, C, d) * 0.1, mk(h, d) * 0.1)
        wp3, bp = mk(h, d, C) * 0.1, mk(C) * 0.1
        bias = mk(h, n, n) * 0.05
        mask = (jnp.asarray(win_ops.shift_attn_mask(res, res, win, shift))
                if shift else None)
        w1, b1 = mk(C, Hd) * 0.1, mk(Hd) * 0.1
        wd, bd = mk(3, 3, Hd) * 0.1, mk(Hd) * 0.1
        w2, b2 = mk(Hd, C) * 0.1, mk(C) * 0.1

        def pair(x, wq, bq, wk, bk, wv, bv, wp3, bp, bias, lns, lnb,
                 w1, b1, wd, bd, w2, b2):
            img = x
            if shift:
                img = jnp.roll(img, (-shift, -shift), axis=(1, 2))
            y = fused_block_attention(img, lns, lnb, wq, bq, wk, bk, wv,
                                      bv, wp3, bp, bias, mask, None, win)
            if shift:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            return fused_block_ffn(y, lns, lnb, w1, b1, wd, bd, w2,
                                   b2).astype(x.dtype)

        def merged(x, wq, bq, wk, bk, wv, bv, wp3, bp, bias, lns, lnb,
                   w1, b1, wd, bd, w2, b2):
            return fused_block_merged(
                x, lns, lnb, wq, bq, wk, bk, wv, bv, wp3, bp, bias, mask,
                None, lns, lnb, w1, b1, wd, bd, w2, b2, win,
                shift).astype(x.dtype)

        args = (x, wq, bq, wk, bk, wv, bv, wp3, bp, bias, lns, lnb,
                w1, b1, wd, bd, w2, b2)
        tp = timer(pair, args)
        tm = timer(merged, args)
        tot_p += tp * depth
        tot_m += tm * depth
        print(f"merged {name:5s} res{res:3d} C{C:3d} h{h:2d} s{shift}: "
              f"pair {tp*1e3:6.2f} ms  merged {tm*1e3:6.2f} ms  "
              f"speedup {tp/tm:5.2f}x", flush=True)
    print(f"merged decoder-equivalent (fitting stages): pair "
          f"{tot_p*1e3:7.1f} ms  merged {tot_m*1e3:7.1f} ms  "
          f"({tot_p/max(tot_m,1e-9):.2f}x)", flush=True)


def bench_freqmerged():
    """Single-dispatch merged frequency-MSA block vs the three-dispatch
    chain (intra -> inter -> FFN), at every flagship ENCODER stage shape
    (shifted block where res > win; band-folded batch L=3)."""
    from frequency_wised_all_in_one_image_restoration_model_tpu.ops import (
        windows as win_ops)
    from frequency_wised_all_in_one_image_restoration_model_tpu.ops.pallas.lewin_block import (
        fused_block_ffn, fused_block_freq_merged, fused_freq_inter,
        fused_freq_intra, merged_freq_fits)

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    Bb = int(os.environ.get("OPB_BATCH", "8"))
    L, win, n = 3, 8, 64

    enc = [("enc0", 128, 28, 1, 2), ("enc1", 64, 56, 2, 2),
           ("enc2", 32, 112, 4, 2), ("enc3", 16, 224, 8, 2),
           ("conv", 8, 448, 16, 2)]
    tot_c = tot_m = 0.0
    for name, res, C, h, depth in enc:
        d = C // h
        Hd = 4 * C
        if not merged_freq_fits(C, Hd, L, 2, res, win):
            print(f"freqmerged {name:5s} res{res:3d} C{C:3d}: no fit -> "
                  "chain", flush=True)
            continue
        shift = 4 if res > win else 0
        x = (mk(L * Bb, res, res, C) * 0.3).astype(jnp.bfloat16)
        lns, lnb = 1.0 + 0.1 * mk(C), 0.1 * mk(C)
        mkq = lambda: (mk(h, C, d) * 0.1, mk(h, d) * 0.1,
                       mk(h, C, d) * 0.1, mk(h, d) * 0.1,
                       mk(h, C, d) * 0.1, mk(h, d) * 0.1,
                       mk(h, d, C) * 0.1, mk(C) * 0.1)
        A, Bq = mkq(), mkq()
        biasA = mk(L, h, n, n) * 0.05
        biasB = mk(h, L * n, L * n) * 0.05
        mask = (jnp.asarray(win_ops.shift_attn_mask(res, res, win, shift))
                if shift else None)
        w1, b1 = mk(C, Hd) * 0.1, mk(Hd) * 0.1
        wd, bd = mk(3, 3, Hd) * 0.1, mk(Hd) * 0.1
        w2, b2 = mk(Hd, C) * 0.1, mk(C) * 0.1

        def chain(x, A, Bq, biasA, biasB, lns, lnb, w1, b1, wd, bd, w2,
                  b2):
            img = x
            if shift:
                img = jnp.roll(img, (-shift, -shift), axis=(1, 2))
            y1 = fused_freq_intra(img, lns, lnb, *A, biasA, mask, L, win)
            y = fused_freq_inter(y1, img, *Bq, biasB, mask, L, win)
            if shift:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            return fused_block_ffn(y, lns, lnb, w1, b1, wd, bd, w2,
                                   b2).astype(x.dtype)

        def merged(x, A, Bq, biasA, biasB, lns, lnb, w1, b1, wd, bd, w2,
                   b2):
            return fused_block_freq_merged(
                x, lns, lnb, *A, biasA, *Bq, biasB, mask, lns, lnb,
                w1, b1, wd, bd, w2, b2, L, win, shift).astype(x.dtype)

        args = (x, A, Bq, biasA, biasB, lns, lnb, w1, b1, wd, bd, w2, b2)
        tc = timer(chain, args)
        tm = timer(merged, args)
        tot_c += tc * depth
        tot_m += tm * depth
        print(f"freqmerged {name:5s} res{res:3d} C{C:3d} h{h:2d} "
              f"s{shift}: chain {tc*1e3:6.2f} ms  merged {tm*1e3:6.2f} "
              f"ms  speedup {tc/tm:5.2f}x", flush=True)
    print(f"freqmerged encoder-equivalent (fitting stages): chain "
          f"{tot_c*1e3:7.1f} ms  merged {tot_m*1e3:7.1f} ms  "
          f"({tot_c/max(tot_m,1e-9):.2f}x)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("attn", "all"):
        bench_attn()
    if which in ("intra", "all"):
        bench_intra()
    if which in ("block",):
        bench_block()
    if which in ("dcn",):
        bench_dcn()
    if which in ("blockk",):
        bench_blockk()
    if which in ("merged",):
        bench_merged()
    if which in ("freqmerged",):
        bench_freqmerged()
