"""Reference-checkpoint import: tools/import_torch_ckpt.py + the DGRN
decoder converter (utils/torch_weights.dgrn_decoder_from_torch).

Builds the ACTUAL reference AirNet (net/model.py:49-57) at tiny dims,
saves its ``state_dict()`` exactly as reference train.py:120-127 does,
imports it through the CLI, and checks the restored TrainState carries the
transplanted weights. The reference DGRN cannot run its own forward (its
DCN forward is ``assert False``, net/utils/deform_conv.py:64), so DGRN
coverage is structural + our-forward-executes; SFT and DCN numerics are
pinned by test_golden_parity.py / test_pallas_dcn.py.
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
    old_argv = sys.argv
    sys.argv = ["test"]  # option.py parses sys.argv at import time
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


def _ref_opt(**overrides):
    from option import options as opt
    opt.encoder_type = "ResNet"
    opt.decoder_type = "ResNet"
    opt.encoder_dim = 32
    opt.L = 1
    opt.de_type = ["denoising_0", "deraining"]
    opt.batch_size = len(opt.de_type)  # option.py:76
    for k, v in overrides.items():
        setattr(opt, k, v)
    return opt


def _tree_paths(tree, base=""):
    if isinstance(tree, dict):
        out = []
        for k, v in tree.items():
            out.extend(_tree_paths(v, f"{base}/{k}"))
        return sorted(out)
    return [base]


@pytest.mark.slow
def test_dgrn_converter_matches_init_structure(rng):
    """Converted reference-DGRN tree is leaf-for-leaf what our DGRN inits,
    and our forward runs with the transplanted weights."""
    import jax
    import jax.numpy as jnp

    from net.decoder_DGRN import DGRN as TorchDGRN

    from frequency_wised_all_in_one_image_restoration_model_tpu.models.decoder_dgrn import (
        DGRN)
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.torch_weights import (
        dgrn_decoder_from_torch)

    opt = _ref_opt()
    tnet = TorchDGRN(opt).eval()  # n_feats = encoder_dim // 4 = 8
    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = dgrn_decoder_from_torch(sd)

    ours = DGRN(n_feats=8)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    inter = jnp.asarray(rng.standard_normal((1, 16, 16, 8)).astype(np.float32))
    init_vars = jax.jit(ours.init)(jax.random.PRNGKey(0), x, inter)

    assert _tree_paths(variables["params"]) == _tree_paths(init_vars["params"])
    for path, a, b in zip(
            _tree_paths(variables["params"]),
            jax.tree_util.tree_leaves(variables["params"]),
            jax.tree_util.tree_leaves(init_vars["params"])):
        assert np.asarray(a).shape == np.asarray(b).shape, path

    out = jax.jit(ours.apply)(variables, x, inter)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()

    # the +stdv storage offset (models/decoder_dgrn.py:59-62): stored-stdv
    # must equal the torch sampling weight exactly
    w_t = sd["body.0.body.0.dgm1.dcn.weight"].transpose(2, 3, 1, 0)
    w_s = np.asarray(
        variables["params"]["dgg0"]["dgb0"]["dgm1"]["dcn"]["weight"])
    stdv = 1.0 / np.sqrt(8 * 3 * 3)
    np.testing.assert_allclose(w_s - stdv, w_t, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_import_cli_roundtrip(tmp_path, rng):
    """Reference ``net.state_dict()`` -> CLI -> Orbax epoch_N -> restore:
    query/key encoder params and the MoCo queue all transplant."""
    import jax

    from frequency_wised_all_in_one_image_restoration_model_tpu.utils import (
        timm_shim)
    timm_shim.install()  # net.model imports decoder_Uformer -> timm
    from net.model import AirNet

    from frequency_wised_all_in_one_image_restoration_model_tpu import (
        config as config_lib)
    from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import (
        build_models)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training import (
        checkpoint as ckpt_lib)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import (
        build_train_loader)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.state import (
        create_train_state)
    from frequency_wised_all_in_one_image_restoration_model_tpu.utils.torch_weights import (
        resnet_encoder_from_torch)

    opt = _ref_opt()
    net = AirNet(opt)
    pth = tmp_path / "epoch_7.pth"
    torch.save(net.state_dict(), str(pth))  # reference train.py:126

    sys.path.insert(0, "/root/repo/tools")
    try:
        import import_torch_ckpt as cli
    finally:
        sys.path.pop(0)

    flags = ["--encoder_type", "ResNet", "--decoder_type", "ResNet",
             "--encoder_dim", "32", "--L", "1",
             "--de_type", "denoising_0", "deraining",
             "--patch_size", "32", "--crop_test_imgs_size", "32",
             "--output_path", str(tmp_path) + "/"]
    cli.main(["--pth", str(pth)] + flags)

    cfg = config_lib.parse_args(flags + ["--synthetic_data"])
    assert ckpt_lib.latest_epoch(cfg.ckpt_path) == 7
    bundle = build_models(cfg, eval_mode=False)
    loader = build_train_loader(cfg, seed=0)
    template = create_train_state(cfg, bundle, jax.random.PRNGKey(0),
                                  loader.next_batch())
    state = ckpt_lib.restore(cfg.ckpt_path, 7, template)

    enc_sd = {k[len("E.E.encoder_q."):]: v.detach().numpy()
              for k, v in net.state_dict().items()
              if k.startswith("E.E.encoder_q.")}
    want = resnet_encoder_from_torch(enc_sd)
    for a, b in zip(jax.tree_util.tree_leaves(want["params"]),
                    jax.tree_util.tree_leaves(state.params["encoder"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # key encoder starts equal to the query encoder in a fresh reference
    # net (moco.py:33-35) — and must land in MoCo state, not params
    for a, b in zip(jax.tree_util.tree_leaves(want["params"]),
                    jax.tree_util.tree_leaves(state.moco.params_k)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    queue_t = net.state_dict()["E.E.queue"].numpy()
    assert queue_t.shape == tuple(state.moco.queue.shape)
    np.testing.assert_allclose(queue_t, np.asarray(state.moco.queue),
                               rtol=1e-6)
