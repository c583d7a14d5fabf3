"""Golden-value parity against the ACTUAL reference PyTorch code.

These tests import the reference modules from /root/reference (read-only),
transplant their randomly-initialized weights into our Flax modules via the
documented mapping (utils/torch_weights.py), and require matching outputs.
This is the strongest parity evidence available without reference
checkpoints/datasets. Skipped wholesale if torch or the reference tree is
unavailable. The reference's Uformer files import timm (absent here), so
their golden tests are not possible in this environment — Uformer numerics
are covered by the op-level golden tests (test_frequency/test_windows) and
behavioral tests instead.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module", autouse=True)
def ref_path(monkeypatch_module=None):
    import os
    if not os.path.isdir(REF):
        pytest.skip("reference tree unavailable")
    # the reference parses sys.argv at import (option.py:57); feed it a
    # clean argv and make .cuda() a no-op on this CPU-only host
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


def _to_torch(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def test_resnet_encoder_golden(rng):
    from net.encoder_ResNet import ResNetEncoder as TorchResNet
    from option import options as opt
    opt.encoder_dim = 32

    from frequency_wised_all_in_one_image_restoration_model_tpu.models.encoder_resnet import (
        ResNetEncoder)
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.torch_weights import (
        resnet_encoder_from_torch)

    tnet = TorchResNet(opt).eval()
    variables = resnet_encoder_from_torch(
        {k: v.detach().numpy() for k, v in tnet.state_dict().items()})

    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t_fea, t_out, t_inter = tnet(_to_torch(x))

    import jax.numpy as jnp
    jnet = ResNetEncoder(dim=32)
    fea, out, inter = jnet.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(np.asarray(fea), t_fea.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[0]), t_out[0].numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(inter).transpose(0, 3, 1, 2),
                               t_inter.numpy(), rtol=1e-4, atol=1e-4)


def test_sft_layer_golden(rng):
    from net.decoder_DGRN import SFT_layer as TorchSFT

    from frequency_wised_all_in_one_image_restoration_model_tpu.models.decoder_dgrn import (
        SFTLayer)
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.torch_weights import (
        sft_layer_from_torch)

    tnet = TorchSFT(8, 8).eval()
    variables = sft_layer_from_torch(
        {k: v.detach().numpy() for k, v in tnet.state_dict().items()})
    x = rng.standard_normal((2, 16, 16, 8)).astype(np.float32)
    inter = rng.standard_normal((2, 16, 16, 8)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(_to_torch(x), _to_torch(inter))
    import jax.numpy as jnp
    out = SFTLayer(channels_out=8).apply(variables, jnp.asarray(x),
                                         jnp.asarray(inter))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               t_out.numpy(), rtol=1e-4, atol=1e-4)


def test_frequency_decompose_golden(rng):
    from net.utils.frequency_decompose import FrequencyDecompose as TorchFD

    from frequency_wised_all_in_one_image_restoration_model_tpu.ops import frequency
    import jax.numpy as jnp

    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    for kind, nb, ours in [
        ("frequency_decompose", 4,
         lambda a: frequency.frequency_decompose(a, 4)),
        ("frequency_decompose_1", 2,
         lambda a: frequency.frequency_decompose_1(a, 2)),
        ("frequency_decompose_dc", 2,
         lambda a: frequency.frequency_decompose_dc(a)),
    ]:
        tmod = TorchFD(kind, 1.0 / nb, 16, 16, inverse=True)
        with torch.no_grad():
            t_out = tmod(torch.from_numpy(x))
        j_out = ours(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                                   rtol=1e-3, atol=1e-4, err_msg=kind)


def test_moco_logits_golden(rng):
    """MoCo logits/labels computation vs the reference module with a stub
    encoder (moco.py:115-166)."""
    from net.utils.moco import MoCo as TorchMoCo

    class StubOpt:
        L = 1

    class StubEncoder(torch.nn.Module):
        def __init__(self, opt):
            super().__init__()
            self.lin = torch.nn.Linear(4, 8, bias=False)

        def forward(self, x):
            out = self.lin(x)
            return out, [out], out

    tm = TorchMoCo(StubOpt(), StubEncoder, dim=8, K=6)
    tm.train()
    x_q = torch.from_numpy(rng.standard_normal((2, 4)).astype(np.float32))
    x_k = torch.from_numpy(rng.standard_normal((2, 4)).astype(np.float32))
    # snapshot the queue BEFORE forward: logits use the pre-enqueue queue
    # (moco.py:141-164 order)
    queue0 = tm.queue.detach().clone().numpy()
    with torch.no_grad():
        _, t_logits, t_labels, _ = tm(x_q, x_k)

    # ours, fed the same q/k/queue
    from frequency_wised_all_in_one_image_restoration_model_tpu.models import moco
    import jax.numpy as jnp
    w = tm.encoder_q.lin.weight.detach().numpy()
    wk = tm.encoder_k.lin.weight.detach().numpy()
    # reference updates the key encoder BEFORE encoding keys (moco.py:132);
    # with m=0.999 and identical init wk' == wk here
    q = moco.normalize_bands(jnp.asarray((x_q.numpy() @ w.T))[None])
    k = moco.normalize_bands(jnp.asarray((x_k.numpy() @ wk.T))[None])
    queue = jnp.asarray(queue0)
    logits = moco.contrastive_logits(q, k, queue)
    np.testing.assert_allclose(np.asarray(logits[0]), t_logits[0].numpy(),
                               rtol=1e-4, atol=1e-4)
    assert (t_labels[0].numpy() == 0).all()  # labels all-zero (moco.py:159-161)


def test_gaussian_ssim_golden(rng):
    sys.path.insert(0, REF + "/utils")
    from utils.pytorch_ssim import ssim as torch_ssim

    from frequency_wised_all_in_one_image_restoration_model_tpu.ops.metrics import (
        ssim_gaussian)
    import jax.numpy as jnp

    a = rng.uniform(0, 1, (2, 3, 32, 32)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    t_val = float(torch_ssim(torch.from_numpy(a), torch.from_numpy(b)))
    j_val = float(ssim_gaussian(jnp.asarray(a.transpose(0, 2, 3, 1)),
                                jnp.asarray(b.transpose(0, 2, 3, 1))))
    assert abs(t_val - j_val) < 1e-4


def test_dgrn_decoder_golden(rng):
    """Full composed DGRN (head -> 5 DGG x 5 DGB -> tail, decoder_DGRN.py:
    113-158) via weight transplant.

    The reference ships its DCN forward as ``assert False``
    (deform_conv.py:64), so the torch side gets a mathematically-equivalent
    stand-in instead of a stub: with the reference's own zero-initialized
    offset head (deform_conv.py:52-54) the offsets are exactly 0 and the
    modulation mask is exactly sigmoid(0)=0.5, so the modulated deformable
    conv it *would* compute reduces to ``0.5 * conv2d`` exactly. Our side
    runs the real gather-composite DCN path unmodified — this pins the whole
    50-block composition INCLUDING our deformable-conv branch at the
    zero-offset point."""
    import torch.nn.functional as F
    from net.decoder_DGRN import DGRN as TorchDGRN
    from net.utils.deform_conv import DCN_layer
    from option import options as opt
    opt.encoder_type = "ResNet"
    opt.encoder_dim = 32  # -> n_feats = 8 (decoder_DGRN.py:120-121)

    def dcn_forward_zero_offset(self, input_feat, inter):
        om = self.conv_offset_mask(torch.cat([input_feat, inter], dim=1))
        assert float(om.abs().max()) == 0.0, "offset head must be zero-init"
        return 0.5 * F.conv2d(input_feat, self.weight, self.bias,
                              self.stride, self.padding)

    old_fwd = DCN_layer.forward
    DCN_layer.forward = dcn_forward_zero_offset
    try:
        tnet = TorchDGRN(opt).eval()
        sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
        x = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
        inter = rng.standard_normal((2, 16, 16, 8)).astype(np.float32) * 0.1
        with torch.no_grad():
            t_out = tnet(_to_torch(x), _to_torch(inter))
    finally:
        DCN_layer.forward = old_fwd

    import jax.numpy as jnp
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.decoder_dgrn import (
        DGRN)
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.torch_weights import (
        dgrn_decoder_from_torch)
    variables = dgrn_decoder_from_torch(sd, groups=5, blocks=5)
    out = DGRN(n_feats=8, n_groups=5, n_blocks=5).apply(
        variables, jnp.asarray(x), jnp.asarray(inter))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               t_out.numpy(), rtol=1e-3, atol=1e-3)


def test_vit_encoder_golden(rng):
    """Full ViT encoder output parity via weight transplant
    (encoder_ViT.py:119-203)."""
    from net.encoder_ViT import ViTEncoder as TorchViT
    from option import options as opt
    opt.encoder_dim = 3
    opt.out_channels = 3
    opt.frequency_decompose_type = "none"
    opt.batch_wise_decompose = False

    from frequency_wised_all_in_one_image_restoration_model_tpu import config
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.encoder_vit import (
        ViTEncoder)
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.torch_weights import (
        vit_encoder_from_torch)

    tnet = TorchViT(opt, image_size=32, depth=2, heads=2, mlp_dim=64).eval()
    variables = vit_encoder_from_torch(
        {k: v.detach().numpy() for k, v in tnet.state_dict().items()}, depth=2)

    cfg = config.make_config(encoder_type="ViT", patch_size=32)
    jnet = ViTEncoder(cfg=cfg, image_size=32, depth=2, heads=2, mlp_dim=64)

    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t_fea, t_out, t_inter = tnet(_to_torch(x))
    import jax.numpy as jnp
    fea, out, inter = jnet.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(np.asarray(fea), t_fea.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[0]), t_out[0].numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(inter).transpose(0, 3, 1, 2),
                               t_inter.numpy(), rtol=1e-3, atol=1e-4)
