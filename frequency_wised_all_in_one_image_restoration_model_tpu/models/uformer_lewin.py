"""LeWin transformer block + stage layer, for both Uformer halves.

Reference: encoder_Uformer.py:515-743 (encoder flavor: origin/freq MSA,
need_kv) and decoder_Uformer.py:504-832 (decoder flavor: degradation
injection methods). One implementation here, parameterized.

Degradation-injection methods (decoder_Uformer.py:504-756), all live:

* ``modulator``           — the degradation map strided down to win x win,
                            concat-embedded into every window's tokens
                            (:541-548, 693-706);
* ``self_modulator``      — SelfModulatedLayerNorm replaces norm1/norm2
                            (:560-567, 587-594, 663-666, 741-744);
* ``deform_conv``         — LeFF's depthwise conv becomes a DCN conditioned
                            on the degradation map (:600-603, 746-749);
* ``attention_residual``  — windowed degradation map is the KV source
                            (:569-573, 709-714);
* ``attention_kv``        — encoder's saved last-block K/V re-projected as
                            KV (:715-716, 101-113);
* ``all_%_bands``/``all_DC`` — attention-map band modulation via embed_lamb
                            (handled inside WindowAttention).

Shift masks are trace-time constants; the cyclic roll is ``jnp.roll``.
"""

from __future__ import annotations

import contextlib
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import windows as win_ops
from .layers import DropPath, Mlp, leaky_relu, to_image, to_tokens
from .uformer_blocks import (Downsample, FrequencyWindowAttention, LeFF,
                             SelfModulatedLayerNorm, WindowAttention,
                             _FusedAttnParams, _FusedLeFFParams, _LNParams,
                             use_fused_block)


class LeWinBlock(nn.Module):
    """One (S)W-MSA + LeFF block."""

    dim: int
    input_resolution: int
    num_heads: int
    win_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    token_mlp: str = "leff"
    token_projection: str = "linear"
    # encoder MSA flavor
    msa_type: str = "origin"          # 'origin' | 'freq'
    L: int = 1
    need_kv: bool = False
    # learned window modulators (decoder option; encoder keeps them off)
    modulator: bool = False
    # degradation injection (decoder)
    injection: Tuple[str, ...] = ()
    degradation_dim: int = -1
    all_bands_num: Optional[int] = None
    all_bands_dc: bool = False
    lamb_bands_num: Optional[int] = None
    lamb_bands_dc: bool = False
    encoder_embed_dim: int = 28
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inter=None, inter_kv=None, all_inter=None,
                 deterministic: bool = True):
        b, n, c = x.shape
        res = self.input_resolution
        win = min(self.win_size, res)
        shift = self.shift_size if res > self.win_size else 0
        nw = (res // win) ** 2

        attn_mask = None
        if shift > 0:
            attn_mask = jnp.asarray(win_ops.shift_attn_mask(res, res, win, shift))

        # ---- fused whole-block path (ops/pallas/lewin_block.py) ---------
        # Covers the plain origin-MSA block and the all_DC decoder block —
        # the flagship decoder configuration. Parameter tree is identical
        # to the unfused path (twin modules), so checkpoints/transplants
        # are path-independent (tests/test_uformer.py fused-parity).
        # stage-level fit: fp32 at the deepest dims can't hold the fused
        # kernels' full-width weights in scoped VMEM (measured, see
        # ops/pallas/lewin_block.py::block_kernels_fit) -> unfused path
        from ..ops.pallas.lewin_block import block_kernels_fit
        kernels_fit = block_kernels_fit(
            self.dim, int(self.dim * self.mlp_ratio),
            jnp.dtype(self.dtype).itemsize)

        fused_ok = (
            use_fused_block()
            and kernels_fit
            and self.msa_type == "origin"
            and self.token_projection == "linear"
            and self.token_mlp not in ("ffn", "mlp")
            and not self.modulator
            and not self.need_kv
            and not self.injection  # all_DC arrives via all_bands_*, not
                                    # per-scale injection
            and self.lamb_bands_num is None
            and (self.all_bands_num is None or self.all_bands_dc)
            and not self.is_mutable_collection("intermediates"))

        # Stochastic depth for the fused kernels: the per-image scale
        # s in {0, 1/keep} is applied IN-KERNEL (out = x + s * branch,
        # exactly timm's  x + drop_path(branch)) — no external fp32 lerp
        # HBM passes, and training keeps the single-dispatch merged block.
        # The scale is drawn through the same DropPath module names as the
        # unfused path ("drop_path1"/"drop_path2"), so both paths consume
        # identical rng streams and are parity-testable draw for draw.
        def dp_scale(name):
            if deterministic or self.drop_path == 0.0:
                return None
            s = DropPath(self.drop_path, name=name)(
                jnp.ones((b, 1, 1), jnp.float32), deterministic)
            return s.reshape(b)

        if fused_ok:
            from ..ops.pallas.lewin_block import (fused_block_attention,
                                                  fused_block_ffn,
                                                  fused_block_merged,
                                                  merged_block_fits,
                                                  use_merged_block)

            n1s, n1b = _LNParams(self.dim, name="norm1")()
            (wq3, bq3, wk3, bk3, wv3, bv3, wp3, bp, bias), lam = \
                _FusedAttnParams(
                    self.dim, win, self.num_heads,
                    all_bands_dc=(self.all_bands_num is not None
                                  and self.all_bands_dc),
                    dtype=self.dtype, name="attn")(all_inter)
            n2s, n2b = _LNParams(self.dim, name="norm2")()
            hidden = int(self.dim * self.mlp_ratio)
            w1, b1, wd, bd, w2, b2 = _FusedLeFFParams(
                self.dim, hidden, name="mlp")()

            dps1 = dp_scale("drop_path1")
            dps2 = dp_scale("drop_path2")
            # single-dispatch whole-block kernel (attention + FFN in one
            # pallas_call, roll absorbed) — training included since r4:
            # DropPath rides in-kernel as dps1/dps2, and the merged VJP
            # chains the halves' fused backward kernels.
            merged_ok = (
                use_merged_block()
                and merged_block_fits(self.dim, hidden,
                                      jnp.dtype(self.dtype).itemsize, res,
                                      win))
            img0 = to_image(x.astype(self.dtype), res, res)
            if merged_ok:
                out = fused_block_merged(
                    img0, n1s, n1b, wq3, bq3, wk3, bk3, wv3, bv3, wp3,
                    bp, bias, attn_mask, lam, n2s, n2b, w1, b1, wd, bd,
                    w2, b2, win, shift, 1e-6, None, dps1, dps2)
                return to_tokens(out), None

            img = img0
            if shift > 0:
                img = jnp.roll(img, (-shift, -shift), axis=(1, 2))
            y = fused_block_attention(img, n1s, n1b, wq3, bq3, wk3, bk3,
                                      wv3, bv3, wp3, bp, bias, attn_mask,
                                      lam, win, 1e-6, None, dps1)
            if shift > 0:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))

            y2 = fused_block_ffn(y, n2s, n2b, w1, b1, wd, bd, w2, b2,
                                 1e-6, None, dps2)
            return to_tokens(y2), None

        # ---- fused frequency-MSA path (encoder flagship) ----------------
        fused_freq_ok = (
            use_fused_block()
            and kernels_fit
            and self.msa_type == "freq"
            and self.token_projection == "linear"
            and self.token_mlp not in ("ffn", "mlp")
            and not self.modulator
            and not self.need_kv
            and not self.injection
            and not self.is_mutable_collection("intermediates"))
        if fused_freq_ok:
            from ..ops.pallas.lewin_block import (fused_block_ffn,
                                                  fused_block_freq_merged,
                                                  fused_freq_inter,
                                                  fused_freq_intra,
                                                  merged_freq_fits,
                                                  use_merged_freq)
            from .uformer_blocks import _FusedFreqAttnParams

            n1s, n1b = _LNParams(self.dim, name="norm1")()
            intra_p = _FusedFreqAttnParams(self.dim, win, self.num_heads,
                                           self.L, "intra",
                                           name="attn_intra")()
            inter_p = _FusedFreqAttnParams(self.dim, win, self.num_heads,
                                           self.L, "inter",
                                           name="attn_inter")()
            dps1 = dp_scale("drop_path1")   # [L*B] per folded sample
            dps2 = dp_scale("drop_path2")
            n2s, n2b = _LNParams(self.dim, name="norm2")()
            hidden = int(self.dim * self.mlp_ratio)
            w1, b1, wd, bd, w2, b2 = _FusedLeFFParams(
                self.dim, hidden, name="mlp")()
            img0 = to_image(x.astype(self.dtype), res, res)

            # single-dispatch whole-block kernel (intra + inter + FFN in
            # ONE pallas_call, roll absorbed); same parameter modules, so
            # checkpoints are path-independent
            merged_ok = (
                use_merged_freq()
                and merged_freq_fits(self.dim, hidden,
                                     self.L,
                                     jnp.dtype(self.dtype).itemsize,
                                     res, win))
            if merged_ok:
                out = fused_block_freq_merged(
                    img0, n1s, n1b, *intra_p, *inter_p, attn_mask,
                    n2s, n2b, w1, b1, wd, bd, w2, b2,
                    self.L, win, shift, 1e-6, None, dps1, dps2)
                return to_tokens(out), None

            img = img0
            if shift > 0:
                img = jnp.roll(img, (-shift, -shift), axis=(1, 2))
            y1 = fused_freq_intra(img, n1s, n1b, *intra_p, attn_mask,
                                  self.L, win)
            # the whole intra+inter MSA output is the DropPath branch;
            # its shortcut is added inside the inter kernel, so dps1
            # applies there (in-kernel)
            y = fused_freq_inter(y1, img, *inter_p, attn_mask, self.L,
                                 win, 1e-6, None, dps1)
            if shift > 0:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))

            y2 = fused_block_ffn(y, n2s, n2b, w1, b1, wd, bd, w2, b2,
                                 1e-6, None, dps2)
            return to_tokens(y2), None

        shortcut = x

        # norm1 (optionally self-modulated by the degradation map)
        if "self_modulator" in self.injection:
            g = nn.LayerNorm(dtype=jnp.float32, name="norm1_deg_norm")(
                inter.astype(jnp.float32)).astype(self.dtype)
            g = leaky_relu(g)
            x = SelfModulatedLayerNorm(self.dim, dtype=self.dtype,
                                       name="norm1")(x, g)
        else:
            x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)

        img = to_image(x, res, res)
        if shift > 0:
            img = jnp.roll(img, (-shift, -shift), axis=(1, 2))
        xw = win_ops.window_partition(img, win).reshape(-1, win * win, c)

        if self.modulator:
            pos = self.param("modulator", nn.initializers.normal(1.0),
                             (win * win, self.dim), jnp.float32)
            xw = xw + pos.astype(self.dtype)[None]

        if "modulator" in self.injection:
            # degradation map -> one win x win token grid, concat-embedded
            # into every window (decoder_Uformer.py:693-706)
            mod = Downsample(self.dim, kernel=1, stride=res // win,
                             dtype=self.dtype, name="degradation_modulator")(inter)
            mod = nn.LayerNorm(dtype=jnp.float32,
                               name="degradation_modulator_norm")(mod)
            mod = leaky_relu(mod.astype(self.dtype))
            mod = jnp.repeat(mod[:, None], nw, axis=1)  # [B, nW, win², dim]
            xw = xw.reshape(b, nw, win * win, c)
            xw = jnp.concatenate([mod, xw], axis=-1)
            xw = nn.Dense(self.dim, dtype=self.dtype,
                          name="degradation_modulator_embed")(xw)
            xw = xw.reshape(-1, win * win, c)

        kv_out = None
        if self.msa_type == "freq":
            xw, kv_out = FrequencyWindowAttention(
                self.dim, win, self.num_heads, L=self.L, kind="intra",
                need_kv=False, dtype=self.dtype, name="attn_intra")(
                    xw, mask=attn_mask)
            xw, kv_out = FrequencyWindowAttention(
                self.dim, win, self.num_heads, L=self.L, kind="inter",
                need_kv=self.need_kv, dtype=self.dtype, name="attn_inter")(
                    xw, mask=attn_mask)
            embed_lambs = []
        else:
            attn_kv = None
            kv_source = None
            if "attention_residual" in self.injection:
                gi = nn.LayerNorm(dtype=jnp.float32,
                                  name="attn_deg_norm")(inter.astype(jnp.float32))
                gi = leaky_relu(gi.astype(self.dtype))
                gimg = to_image(gi, res, res)
                if shift > 0:
                    gimg = jnp.roll(gimg, (-shift, -shift), axis=(1, 2))
                attn_kv = win_ops.window_partition(gimg, win).reshape(
                    -1, win * win, self.degradation_dim)
                kv_source = "attention_residual"
            elif "attention_kv" in self.injection:
                attn_kv = inter_kv
                kv_source = "attention_kv"
            xw, kv_out, embed_lambs = WindowAttention(
                self.dim, win, self.num_heads, num_win=nw,
                need_kv=self.need_kv, kv_source=kv_source,
                dim_kv=self.degradation_dim,
                all_bands_num=self.all_bands_num,
                all_bands_dc=self.all_bands_dc,
                lamb_bands_num=self.lamb_bands_num,
                lamb_bands_dc=self.lamb_bands_dc,
                encoder_embed_dim=self.encoder_embed_dim,
                token_projection=self.token_projection,
                dtype=self.dtype, name="attn")(
                    xw, attn_kv=attn_kv, all_inter=all_inter, mask=attn_mask)

        img = win_ops.window_reverse(xw.reshape(-1, win, win, c), win, res, res)
        if shift > 0:
            img = jnp.roll(img, (shift, shift), axis=(1, 2))
        x = to_tokens(img)

        x = shortcut + DropPath(self.drop_path, name="drop_path1")(
            x, deterministic)

        # norm2 + FFN
        if "self_modulator" in self.injection:
            g2 = nn.LayerNorm(dtype=jnp.float32, name="norm2_deg_norm")(
                inter.astype(jnp.float32)).astype(self.dtype)
            g2 = leaky_relu(g2)
            y = SelfModulatedLayerNorm(self.dim, dtype=self.dtype,
                                       name="norm2")(x, g2)
        else:
            y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)

        hidden = int(self.dim * self.mlp_ratio)
        # 'fastleff' (reference leff.py:8-41, a torch_dwconv CUDA path) is
        # the same computation here — XLA's depthwise conv IS the fast path
        if self.token_mlp in ("ffn", "mlp"):
            y = Mlp(hidden, dtype=self.dtype, name="mlp")(y)
        elif "deform_conv" in self.injection:
            # reference narrows hidden to dim for the DCN variant
            # (decoder_Uformer.py:600-601)
            y = LeFF(self.dim, deform=True,
                     degradation_dim=self.degradation_dim,
                     dtype=self.dtype, name="mlp")(y, inter)
        else:
            y = LeFF(hidden, dtype=self.dtype, name="mlp")(y)

        x = x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)
        return x, kv_out


class BasicUformerLayer(nn.Module):
    """A stage of LeWin blocks; odd blocks shifted by win//2 when
    ``shift_flag`` (encoder_Uformer.py:687-743)."""

    dim: int
    input_resolution: int
    depth: int
    num_heads: int
    win_size: int = 8
    mlp_ratio: float = 4.0
    drop_path: Sequence[float] = ()
    token_mlp: str = "leff"
    token_projection: str = "linear"
    shift_flag: bool = True
    msa_type: str = "origin"
    L: int = 1
    need_kv: bool = False
    modulator: bool = False
    injection: Tuple[str, ...] = ()
    degradation_dim: int = -1
    all_bands_num: Optional[int] = None
    all_bands_dc: bool = False
    lamb_bands_num: Optional[int] = None
    lamb_bands_dc: bool = False
    encoder_embed_dim: int = 28
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, inter=None, inter_kv=None, all_inter=None,
                 deterministic: bool = True):
        dp = list(self.drop_path) or [0.0] * self.depth
        # --remat: jax.checkpoint each block — backward recomputes the
        # block forward instead of keeping intra-stage activations alive.
        # Lifted transform, so param naming (and checkpoints) are unchanged.
        # The fused kernels get half their row-tile budget while the
        # rematted blocks trace (jax.checkpoint shrinks the scoped-VMEM
        # headroom ~1% past the limit at res 128, measured on v5e).
        block_cls = LeWinBlock
        ctx = contextlib.nullcontext()
        if self.remat:
            from ..ops.pallas.lewin_block import remat_tile_headroom
            block_cls = nn.remat(LeWinBlock, static_argnums=(5,))
            ctx = remat_tile_headroom()
        with ctx:
            return self._run_blocks(block_cls, dp, x, inter, inter_kv,
                                    all_inter, deterministic)

    def _run_blocks(self, block_cls, dp, x, inter, inter_kv, all_inter,
                    deterministic):
        kv = None
        for i in range(self.depth):
            shift = (self.win_size // 2
                     if (self.shift_flag and i % 2 == 1) else 0)
            x, kv_i = block_cls(
                dim=self.dim, input_resolution=self.input_resolution,
                num_heads=self.num_heads, win_size=self.win_size,
                shift_size=shift, mlp_ratio=self.mlp_ratio,
                drop_path=dp[i] if i < len(dp) else dp[-1],
                token_mlp=self.token_mlp,
                token_projection=self.token_projection,
                msa_type=self.msa_type, L=self.L,
                need_kv=(self.need_kv and i + 1 == self.depth),
                modulator=self.modulator,
                injection=self.injection,
                degradation_dim=self.degradation_dim,
                all_bands_num=self.all_bands_num,
                all_bands_dc=self.all_bands_dc,
                lamb_bands_num=self.lamb_bands_num,
                lamb_bands_dc=self.lamb_bands_dc,
                encoder_embed_dim=self.encoder_embed_dim,
                dtype=self.dtype, name=f"block{i}")(
                    # positional: static_argnums under remat indexes
                    # positionally (deterministic = arg 5 after self)
                    x, inter, inter_kv, all_inter, deterministic)
            if kv_i is not None:
                kv = kv_i
        return x, kv
