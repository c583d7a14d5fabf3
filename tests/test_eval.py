"""Tiled eval tests: offsets, stitch correctness, runner round-trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from frequency_wised_all_in_one_image_restoration_model_tpu import config
from frequency_wised_all_in_one_image_restoration_model_tpu.evaluation import runner, tiling
from frequency_wised_all_in_one_image_restoration_model_tpu.models.airnet import ModelBundle
from frequency_wised_all_in_one_image_restoration_model_tpu.models.decoder_dgrn import DGRN
from frequency_wised_all_in_one_image_restoration_model_tpu.models.encoder_resnet import ResNetEncoder


def test_tile_offsets_reference_semantics():
    # reference test.py:48-49: range(0, H-patch, patch) + [H-patch]
    assert tiling.tile_offsets(128, 128) == [0]
    assert tiling.tile_offsets(256, 128) == [0, 128]
    assert tiling.tile_offsets(300, 128) == [0, 128, 172]
    assert tiling.tile_offsets(257, 128) == [0, 128, 129]


def test_identity_stitch_roundtrip(rng):
    img = rng.uniform(0, 1, (48, 80, 3)).astype(np.float32)
    tiles, offsets, n = tiling.extract_tiles(img, 16)
    out = np.asarray(tiling.stitch_tiles(
        jnp.asarray(tiles), jnp.asarray(offsets), jnp.asarray(n), 48, 80))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_overlap_average(rng):
    # non-divisible size -> edge tiles overlap; identity tiles must still
    # reconstruct exactly because overlapping values agree
    img = rng.uniform(0, 1, (40, 40, 3)).astype(np.float32)
    tiles, offsets, n = tiling.extract_tiles(img, 16)
    assert n == 9  # offsets [0, 16, 24]^2
    out = np.asarray(tiling.stitch_tiles(
        jnp.asarray(tiles), jnp.asarray(offsets), jnp.asarray(n), 40, 40))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_padded_tiles_ignored(rng):
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    tiles, offsets, n = tiling.extract_tiles(img, 16)
    assert n == 4 and tiles.shape[0] == 8  # bucketed to 8
    # poison the padded tiles; stitch must not see them
    tiles[n:] = 1e6
    out = np.asarray(tiling.stitch_tiles(
        jnp.asarray(tiles), jnp.asarray(offsets), jnp.asarray(n), 32, 32))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_test_by_task_synthetic(tmp_path):
    import jax
    cfg = config.make_config(
        encoder_type="ResNet", decoder_type="ResNet", de_type=["2tasks"],
        patch_size=32, crop_test_imgs_size=32, encoder_dim=32,
        synthetic_data=True, output_path=str(tmp_path) + "/")
    bundle = ModelBundle(
        cfg=cfg, encoder=ResNetEncoder(dim=32),
        decoder=DGRN(n_feats=8, n_groups=1, n_blocks=1), num_losses=1)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.state import create_train_state
    from frequency_wised_all_in_one_image_restoration_model_tpu.data.synthetic import SyntheticTrainLoader
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import eval_variables
    loader = SyntheticTrainLoader(cfg, seed=0)
    st = create_train_state(cfg, bundle, jax.random.PRNGKey(0), loader.next_batch())
    enc_vars, dec_vars = eval_variables(st)
    result = runner.test_by_task(cfg, bundle, enc_vars, dec_vars,
                                 "denoising_bsd68_25", epochs=1)
    assert result.startswith("PSNR/SSIM: ")
    # format parity: "PSNR/SSIM: %.2f/%.4f"
    nums = result.split(": ")[1].split("/")
    assert len(nums[0].split(".")[1]) == 2
    assert len(nums[1].split(".")[1]) == 4


def test_test_by_task_saves_images(tmp_path):
    import jax
    import os
    cfg = config.make_config(
        encoder_type="ResNet", decoder_type="ResNet",
        de_type=["denoising_0", "deraining"], patch_size=32,
        crop_test_imgs_size=32, encoder_dim=32, synthetic_data=True,
        save_imgs=True, output_path=str(tmp_path) + "/")
    bundle = ModelBundle(
        cfg=cfg, encoder=ResNetEncoder(dim=32),
        decoder=DGRN(n_feats=8, n_groups=1, n_blocks=1), num_losses=1)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.state import create_train_state
    from frequency_wised_all_in_one_image_restoration_model_tpu.data.synthetic import SyntheticTrainLoader
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import eval_variables
    loader = SyntheticTrainLoader(cfg, seed=0)
    st = create_train_state(cfg, bundle, jax.random.PRNGKey(0), loader.next_batch())
    enc_vars, dec_vars = eval_variables(st)
    runner.test_by_task(cfg, bundle, enc_vars, dec_vars, "deraining", epochs=7)
    img_dir = tmp_path / "epoch_7_imgs" / "test_deraining"
    pngs = list(img_dir.glob("*.png"))
    assert len(pngs) == 4  # synthetic test set size (reference save path,
    # test.py:20-27,77-78)


def test_restore_image_single(rng):
    """The one-image restoration helper (tile -> forward -> stitch)."""
    import jax
    cfg = config.make_config(
        encoder_type="ResNet", decoder_type="ResNet",
        de_type=["denoising_0", "deraining"], patch_size=32,
        crop_test_imgs_size=32, encoder_dim=32, synthetic_data=True)
    bundle = ModelBundle(
        cfg=cfg, encoder=ResNetEncoder(dim=32),
        decoder=DGRN(n_feats=8, n_groups=1, n_blocks=1), num_losses=1)
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.state import create_train_state
    from frequency_wised_all_in_one_image_restoration_model_tpu.data.synthetic import SyntheticTrainLoader
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import eval_variables
    loader = SyntheticTrainLoader(cfg, seed=0)
    st = create_train_state(cfg, bundle, jax.random.PRNGKey(0), loader.next_batch())
    enc_vars, dec_vars = eval_variables(st)
    img = rng.uniform(0, 1, (48, 80, 3)).astype(np.float32)
    out = runner.restore_image(runner.make_eval_fn(bundle), enc_vars,
                               dec_vars, img, 32)
    assert out.shape == (48, 80, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_test_by_task_mesh_sharded_matches_single(tmp_path):
    """Eval tiles sharded across a virtual 8-device mesh (SURVEY §2.4
    spatial-tiling axis) must reproduce the single-device result string."""
    import jax
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from frequency_wised_all_in_one_image_restoration_model_tpu.parallel import mesh as mesh_lib
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.state import create_train_state
    from frequency_wised_all_in_one_image_restoration_model_tpu.data.synthetic import SyntheticTrainLoader
    from frequency_wised_all_in_one_image_restoration_model_tpu.training.loop import eval_variables

    cfg = config.make_config(
        encoder_type="ResNet", decoder_type="ResNet", de_type=["2tasks"],
        patch_size=32, crop_test_imgs_size=32, encoder_dim=32,
        synthetic_data=True, output_path=str(tmp_path) + "/")
    bundle = ModelBundle(
        cfg=cfg, encoder=ResNetEncoder(dim=32),
        decoder=DGRN(n_feats=8, n_groups=1, n_blocks=1), num_losses=1)
    loader = SyntheticTrainLoader(cfg, seed=0)
    st = create_train_state(cfg, bundle, jax.random.PRNGKey(0), loader.next_batch())
    enc_vars, dec_vars = eval_variables(st)

    single = runner.test_by_task(cfg, bundle, enc_vars, dec_vars,
                                 "deraining", epochs=1)
    mesh = mesh_lib.make_mesh(8, 1)
    sharded = runner.test_by_task(cfg, bundle, enc_vars, dec_vars,
                                  "deraining", epochs=1, mesh=mesh)
    assert sharded == single


@pytest.mark.slow
def test_cli_test_py_mesh_sharded(tmp_path):
    """`python test.py --mesh_data 8 ...` shards eval tiles over the mesh
    (VERDICT r2 #4: the spatial axis must be reachable from user surfaces)."""
    import jax
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import importlib.util
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "fairm_test_cli", os.path.join(root, "test.py"))
    test_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(test_cli)

    cfg = config.make_config(
        encoder_type="ResNet", decoder_type="ResNet", de_type=["2tasks"],
        patch_size=32, crop_test_imgs_size=32, encoder_dim=32, epochs=1,
        synthetic_data=True, mesh_data=8, output_path=str(tmp_path) + "/")
    test_cli.main(cfg)
    logs = list(tmp_path.glob("epoch_*_results.log"))
    assert len(logs) == 1
    text = logs[0].read_text()
    assert "PSNR/SSIM: " in text
