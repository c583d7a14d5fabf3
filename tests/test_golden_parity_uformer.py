"""Golden-value parity for the FLAGSHIP Uformer encoder/decoder against the
ACTUAL reference PyTorch modules (encoder_Uformer.py:746-986,
decoder_Uformer.py:835-1171).

The reference files import timm at module scope; utils/timm_shim.py provides
the three names they need (DropPath/to_2tuple/trunc_normal_), unlocking
weight transplants via utils/torch_weights.py. Covered here:

* UformerEncoder, ``encoder_msa_type='freq'`` (FrequencyWindowAttention,
  L=3 band fold) and ``'origin'`` — outputs + per-band inter match <= 1e-3;
* UformerDecoder full forward with ``all_DC`` (the embed_lamb attention-band
  modulation, the reference's live injection path);
* decoder LeWinTransformerBlock with ``self_modulator``, ``modulator``,
  ``attention_residual`` and ``attention_kv`` at the block level (the
  reference's full forward passes None degradation tensors to every
  per-scale method and crashes — PARITY.md #5 — so block level is the
  strongest possible evidence). The two remaining methods cannot be
  golden-tested at all: ``residual``'s params are missing from the
  reference state_dict (PARITY.md #4) and ``deform_conv``'s forward is
  ``assert False`` in the reference (PARITY.md #3).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    import os
    if not os.path.isdir(REF):
        pytest.skip("reference tree unavailable")
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils import (
        timm_shim)
    timm_shim.install()
    old_argv = sys.argv
    sys.argv = ["test"]
    old_cuda_t = torch.Tensor.cuda
    old_cuda_m = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if REF not in sys.path:
        sys.path.insert(0, REF)
    yield
    sys.argv = old_argv
    torch.Tensor.cuda = old_cuda_t
    torch.nn.Module.cuda = old_cuda_m


def _sd(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


def _ref_opt(**overrides):
    from option import options as opt
    # isolate: tests mutate the module-global namespace
    for k, v in overrides.items():
        setattr(opt, k, v)
    return opt


IMG = 32
L = 3


def _encoder_pair(msa_type):
    import jax
    from net.encoder_Uformer import UformerEncoder as TorchUformerEncoder
    from frequency_wised_all_in_one_image_restoration_model_tpu import config
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.encoder_uformer import (
        UformerEncoder)
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.torch_weights import (
        uformer_encoder_from_torch)

    opt = _ref_opt(encoder_embed_dim=8, encoder_dim=16, L=L,
                   encoder_msa_type=msa_type,
                   degradation_embedding_method=["all_DC"])
    tnet = TorchUformerEncoder(opt, img_size=IMG).eval()
    variables = uformer_encoder_from_torch(_sd(tnet), L=L, msa_type=msa_type)

    cfg = config.make_config(
        encoder_type="Uformer", decoder_type="Uformer", L=L,
        encoder_msa_type=msa_type, degradation_embedding_method=["all_DC"],
        de_type=["2tasks"], patch_size=IMG, crop_test_imgs_size=IMG,
        encoder_embed_dim=8, encoder_dim=16)
    jnet = UformerEncoder(cfg=cfg, img_size=IMG)
    return tnet, jnet, variables


@pytest.mark.parametrize("msa_type", ["freq", "origin"])
def test_uformer_encoder_golden(msa_type, rng):
    import jax
    import jax.numpy as jnp

    tnet, jnet, variables = _encoder_pair(msa_type)
    x = rng.uniform(0, 1, (2, IMG, IMG, 3)).astype(np.float32)

    with torch.no_grad():
        _, t_out, t_inter = tnet(
            torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2))))

    _, out, ctx = jax.jit(
        lambda v, x: jnet.apply(v, x, train=False))(variables, jnp.asarray(x))

    for i in range(L):
        np.testing.assert_allclose(np.asarray(out[i]), t_out[i].numpy(),
                                   rtol=1e-3, atol=1e-3,
                                   err_msg=f"band {i} embedding")
        np.testing.assert_allclose(np.asarray(ctx.band_inter[i]),
                                   t_inter[i].numpy(),
                                   rtol=1e-3, atol=1e-3,
                                   err_msg=f"band {i} inter")


def test_uformer_decoder_golden_all_dc(rng):
    import jax
    import jax.numpy as jnp
    from net.decoder_Uformer import UformerDecoder as TorchUformerDecoder
    from frequency_wised_all_in_one_image_restoration_model_tpu import config
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.decoder_uformer import (
        UformerDecoder)
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.encoder_uformer import (
        DegradationContext)
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.torch_weights import (
        uformer_decoder_from_torch)

    # the reference decoder hard-codes encoder_embed_dim=28 inside its
    # WindowAttention (decoder_Uformer.py:176) — inter bands are 28*16=448
    opt = _ref_opt(embed_dim=8, encoder_embed_dim=28, L=L,
                   degradation_embedding_method=["all_DC"],
                   frequency_decompose_type="none",
                   learnable_modulator=False, debug_mode=False)
    tnet = TorchUformerDecoder(opt, img_size=IMG).eval()
    variables = uformer_decoder_from_torch(_sd(tnet), num_bands=2)

    cfg = config.make_config(
        encoder_type="Uformer", decoder_type="Uformer", L=L,
        degradation_embedding_method=["all_DC"], de_type=["2tasks"],
        patch_size=IMG, crop_test_imgs_size=IMG,
        embed_dim=8, encoder_embed_dim=28)
    jnet = UformerDecoder(cfg=cfg, img_size=IMG)

    x = rng.uniform(0, 1, (1, IMG, IMG, 3)).astype(np.float32)
    n16 = (IMG // 16) ** 2
    inter = [rng.standard_normal((1, n16, 28 * 16)).astype(np.float32)
             for _ in range(L)]

    with torch.no_grad():
        t_y = tnet(torch.from_numpy(np.ascontiguousarray(
            x.transpose(0, 3, 1, 2))),
            [torch.from_numpy(b) for b in inter])

    ctx = DegradationContext(
        band_inter=tuple(jnp.asarray(b) for b in inter),
        pyramid=None, kv=None)
    y = jax.jit(lambda v, x, ctx: jnet.apply(v, x, ctx, train=False))(
        variables, jnp.asarray(x), ctx)

    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2),
                               t_y.numpy(), rtol=1e-3, atol=1e-3)


def test_decoder_block_self_modulator_golden(rng):
    """Block-level transplant: the reference's decoder forward never feeds a
    real degradation tensor to per-scale methods (PARITY.md #5), so the
    LeWinTransformerBlock is exercised directly with one."""
    import jax
    import jax.numpy as jnp
    from net.decoder_Uformer import LeWinTransformerBlock as TorchBlock
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.uformer_lewin import (
        LeWinBlock)
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.torch_weights import (
        _lewin_block)

    dim, res, deg_dim = 16, 16, 32
    tblk = TorchBlock(dim=dim, input_resolution=(res, res), num_heads=2,
                      win_size=8, shift_size=4, drop_path=0.0,
                      degradation_dim=deg_dim,
                      degradation_embedding_method=["self_modulator"]).eval()
    sd = {"blk." + k: v for k, v in _sd(tblk).items()}
    params = _lewin_block(sd, "blk", "origin", 1, self_modulator=True)
    jblk = LeWinBlock(dim=dim, input_resolution=res, num_heads=2, win_size=8,
                      shift_size=4, injection=("self_modulator",),
                      degradation_dim=deg_dim)

    x = rng.standard_normal((2, res * res, dim)).astype(np.float32)
    inter = rng.standard_normal((2, res * res, deg_dim)).astype(np.float32)

    with torch.no_grad():
        t_y = tblk(torch.from_numpy(x), inter=torch.from_numpy(inter))

    y, _ = jax.jit(lambda p, x, i: jblk.apply(
        {"params": p}, x, inter=i, deterministic=True))(
            params, jnp.asarray(x), jnp.asarray(inter))
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_decoder_block_modulator_golden(rng):
    """'modulator' injection at block level: the degradation map is strided
    down to one win x win token grid and concat-embedded into every window
    (decoder_Uformer.py:541-548, 693-706; per-scale wiring is broken in the
    reference forward, PARITY.md #5, so the block is fed directly)."""
    import jax
    import jax.numpy as jnp
    from net.decoder_Uformer import LeWinTransformerBlock as TorchBlock
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.uformer_lewin import (
        LeWinBlock)
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.torch_weights import (
        _lewin_block)

    dim, res = 16, 16
    tblk = TorchBlock(dim=dim, input_resolution=(res, res), num_heads=2,
                      win_size=8, shift_size=4, drop_path=0.0,
                      degradation_dim=dim,
                      degradation_embedding_method=["modulator"]).eval()
    sd = {"blk." + k: v for k, v in _sd(tblk).items()}
    params = _lewin_block(sd, "blk", "origin", 1, methods=("modulator",))
    jblk = LeWinBlock(dim=dim, input_resolution=res, num_heads=2, win_size=8,
                      shift_size=4, injection=("modulator",),
                      degradation_dim=dim)

    x = rng.standard_normal((2, res * res, dim)).astype(np.float32)
    inter = rng.standard_normal((2, res * res, dim)).astype(np.float32)

    with torch.no_grad():
        t_y = tblk(torch.from_numpy(x), inter=torch.from_numpy(inter))

    y, _ = jax.jit(lambda p, x, i: jblk.apply(
        {"params": p}, x, inter=i, deterministic=True))(
            params, jnp.asarray(x), jnp.asarray(inter))
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_decoder_block_attention_residual_golden(rng):
    """'attention_residual' injection at block level: the windowed
    degradation map is the attention KV source (decoder_Uformer.py:569-573,
    709-714, 220-224). shift_size=0: under SW-MSA we roll the degradation
    map alongside the content so KV windows stay aligned with their
    queries; the reference windows it unrolled (PARITY.md)."""
    import jax
    import jax.numpy as jnp
    from net.decoder_Uformer import LeWinTransformerBlock as TorchBlock
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.uformer_lewin import (
        LeWinBlock)
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.torch_weights import (
        _lewin_block)

    dim, res, deg_dim = 16, 16, 32
    tblk = TorchBlock(dim=dim, input_resolution=(res, res), num_heads=2,
                      win_size=8, shift_size=0, drop_path=0.0,
                      degradation_dim=deg_dim,
                      degradation_embedding_method=["attention_residual"]
                      ).eval()
    sd = {"blk." + k: v for k, v in _sd(tblk).items()}
    params = _lewin_block(sd, "blk", "origin", 1,
                          methods=("attention_residual",))
    jblk = LeWinBlock(dim=dim, input_resolution=res, num_heads=2, win_size=8,
                      shift_size=0, injection=("attention_residual",),
                      degradation_dim=deg_dim)

    x = rng.standard_normal((2, res * res, dim)).astype(np.float32)
    inter = rng.standard_normal((2, res * res, deg_dim)).astype(np.float32)

    with torch.no_grad():
        t_y = tblk(torch.from_numpy(x), inter=torch.from_numpy(inter))

    y, _ = jax.jit(lambda p, x, i: jblk.apply(
        {"params": p}, x, inter=i, deterministic=True))(
            params, jnp.asarray(x), jnp.asarray(inter))
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_decoder_block_attention_kv_golden(rng):
    """'attention_kv' injection at block level: the encoder's saved
    last-block K/V are re-projected as the attention KV source
    (decoder_Uformer.py:715-716, 101-113, 218-219). The reference's
    rearrange assumes the encoder head dim equals the decoder head dim
    (it folds heads by the ENCODER's per-head embed) — dims are chosen so
    both agree (hd_enc = hd_dec = 8)."""
    import jax
    import jax.numpy as jnp
    from net.decoder_Uformer import LeWinTransformerBlock as TorchBlock
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.uformer_lewin import (
        LeWinBlock)
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.torch_weights import (
        _lewin_block)

    dim, res, heads, hd_enc = 16, 16, 2, 8
    deg_dim = heads * hd_enc  # folded encoder K/V width
    tblk = TorchBlock(dim=dim, input_resolution=(res, res), num_heads=heads,
                      win_size=8, shift_size=4, drop_path=0.0,
                      degradation_dim=deg_dim,
                      degradation_embedding_method=["attention_kv"]).eval()
    sd = {"blk." + k: v for k, v in _sd(tblk).items()}
    params = _lewin_block(sd, "blk", "origin", 1,
                          methods=("attention_kv",))
    jblk = LeWinBlock(dim=dim, input_resolution=res, num_heads=heads,
                      win_size=8, shift_size=4,
                      injection=("attention_kv",), degradation_dim=deg_dim)

    B, nw, n = 2, (res // 8) ** 2, 64
    x = rng.standard_normal((B, res * res, dim)).astype(np.float32)
    k_in = rng.standard_normal((B * nw, heads, n, hd_enc)).astype(np.float32)
    v_in = rng.standard_normal((B * nw, heads, n, hd_enc)).astype(np.float32)

    with torch.no_grad():
        t_y = tblk(torch.from_numpy(x),
                   inter_kv=[torch.from_numpy(k_in),
                             torch.from_numpy(v_in)])

    y, _ = jax.jit(lambda p, x, k, v: jblk.apply(
        {"params": p}, x, inter_kv=(k, v), deterministic=True))(
            params, jnp.asarray(x), jnp.asarray(k_in), jnp.asarray(v_in))
    np.testing.assert_allclose(np.asarray(y), t_y.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_conv_projection_golden(rng):
    """ConvProjection (token_projection='conv', encoder_Uformer.py:47-76)
    weight-transplant parity, q/k/v."""
    import jax
    import jax.numpy as jnp
    from net.encoder_Uformer import ConvProjection as TorchConvProjection
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.uformer_blocks import (
        ConvProjection)
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.torch_weights import (
        conv_projection_from_torch)

    dim, heads, hd, n = 16, 2, 8, 64
    # the reference forwards its ``bias`` arg into SepConv2d's ``dilation``
    # slot (encoder_Uformer.py:56-58); bias=1 keeps torch happy (dilation=1,
    # the value True coerces to anyway)
    tproj = TorchConvProjection(dim, heads=heads, dim_head=hd, bias=1).eval()
    params = conv_projection_from_torch(_sd(tproj))
    jproj = ConvProjection(heads=heads, dim_head=hd)

    x = rng.standard_normal((2, n, dim)).astype(np.float32)
    with torch.no_grad():
        t_q, t_k, t_v = tproj(torch.from_numpy(x))
    q, k, v = jax.jit(lambda p, x: jproj.apply({"params": p}, x))(
        params, jnp.asarray(x))
    for ours, ref in ((q, t_q), (k, t_k), (v, t_v)):
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                                   rtol=1e-4, atol=1e-4)


def test_conv_projection_end_to_end(rng):
    """A full BasicUformerLayer stage runs (fwd + grad) with
    token_projection='conv' — the API-surface path the reference never
    exercises in its live configs."""
    import jax
    import jax.numpy as jnp
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.uformer_lewin import (
        BasicUformerLayer)

    res, dim = 16, 8
    layer = BasicUformerLayer(dim=dim, input_resolution=res, depth=2,
                              num_heads=2, win_size=8,
                              token_projection="conv")
    x = jnp.asarray(rng.standard_normal((2, res * res, dim)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)

    def loss(v, x):
        y, _ = layer.apply(v, x, deterministic=True)
        return jnp.mean(y ** 2)

    val, grads = jax.jit(jax.value_and_grad(loss))(variables, x)
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    names = jax.tree_util.tree_flatten_with_path(variables)[0]
    assert any("depthwise" in str(p) for p, _ in names)
