"""Sliding-window inference tests (the OAI whole-volume protocol,
SURVEY.md §3.5): tile predictions reassemble to the direct whole-volume
prediction, voting mode agrees on interiors, patch-sampler training config
wires up."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepatlas_tpu.data.transforms import Partition
from deepatlas_tpu.models import UNetTemplate
from deepatlas_tpu.train.inference import (make_tile_predictor,
                                           sliding_window_predict)

N_CLASSES = 3


@pytest.fixture(scope="module")
def net():
    model = UNetTemplate(encoders=((2, 4), (4, 4)), decoders=((4, 4, 4),),
                         in_channel=1, n_classes=N_CLASSES, bias=True,
                         BN=False, act="LeakyReLU")
    example = jnp.zeros((1, 8, 8, 8, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), example, train=False)
    return model, variables


@pytest.mark.slow
def test_tile_predictor_pads_ragged_chunks(net, rng):
    model, variables = net
    predict = make_tile_predictor(model.apply, variables, tile_batch=4)
    tiles = rng.rand(5, 8, 8, 8, 1).astype(np.float32)  # 5 % 4 != 0
    out = predict(tiles)
    assert out.shape == (5, 8, 8, 8)
    ref = np.argmax(np.asarray(model.apply(
        variables, jnp.asarray(tiles), train=False)), axis=-1)
    np.testing.assert_array_equal(out, ref)


def test_sliding_window_matches_whole_volume(net, rng):
    """With a conv-net whose receptive field fits inside the overlap, the
    stitched tiles equal the whole-volume prediction on interior voxels."""
    model, variables = net
    vol = rng.rand(16, 16, 16, 1).astype(np.float32)
    predict = make_tile_predictor(model.apply, variables, tile_batch=2)
    whole = np.argmax(np.asarray(model.apply(
        variables, jnp.asarray(vol)[None], train=False))[0], axis=-1)

    # zero overlap, tile == volume: no padding, bitwise equality
    pred = sliding_window_predict(predict, {"image": vol},
                                  tile_size=(16, 16, 16),
                                  overlap_size=(0, 0, 0))
    np.testing.assert_array_equal(pred, whole)

    # overlapping tiles: reflect padding only perturbs borders; the interior
    # (beyond the net's receptive field from any tile seam) agrees
    pred = sliding_window_predict(predict, {"image": vol},
                                  tile_size=(16, 16, 16),
                                  overlap_size=(4, 4, 4))
    assert pred.shape == (16, 16, 16)
    assert (pred == whole).mean() > 0.85


def test_vote_mode_runs(net, rng):
    model, variables = net
    vol = rng.rand(20, 16, 16, 1).astype(np.float32)
    predict = make_tile_predictor(model.apply, variables, tile_batch=2)
    pred = sliding_window_predict(predict, {"image": vol},
                                  tile_size=(16, 16, 16),
                                  overlap_size=(4, 4, 4), is_vote=True)
    assert pred.shape == (20, 16, 16)
    assert pred.max() < N_CLASSES


def test_partition_assemble_roundtrip_labels(rng):
    """assemble(partition(x)) == x for label volumes (pure data-path)."""
    seg = rng.randint(0, 5, (20, 18, 16)).astype(np.uint8)
    part = Partition((12, 12, 12), (2, 2, 2))
    tiled = part({"image": seg.astype(np.float32)})
    back = part.assemble(tiled["image"][..., 0].astype(np.uint8))
    np.testing.assert_array_equal(back, seg)


def test_patch_sampler_config(tmp_path, rng):
    """OAI-style patch training: the experiment draws ROI crops of the
    configured size."""
    from tests.test_train import make_mindboggle_corpus, tiny_config

    make_mindboggle_corpus(tmp_path, shape=(16, 16, 16))
    config = tiny_config(tmp_path, n_epochs=1)
    config.update(patch_size=(8, 8, 8), sampler="balanced", crop_size=None,
                  samples_per_epoch=2)
    from deepatlas_tpu.train import SegmentationExperiment
    exp = SegmentationExperiment(config)
    exp.setup_train_data()
    batch = next(iter(exp.training_data_loader))
    assert batch["image"].shape[1:4] == (8, 8, 8)
    assert batch["segmentation"].shape[1:4] == (8, 8, 8)


@pytest.mark.slow
def test_infer_seg_cli_spatial_shards(tmp_path):
    """infer_seg.py --spatial-shards: EXACT whole-volume depth-sharded
    inference (no tile seams) through the CLI, restored from a trained
    experiment checkpoint."""
    import json
    import os
    import subprocess
    import sys

    from tests.test_train import make_mindboggle_corpus, tiny_config
    from deepatlas_tpu.train import SegmentationExperiment

    # raw (uncropped) volumes: inference sees the full size, which must
    # satisfy the spatial divisibility (D=32 = 2 shards x 16; H,W div 8)
    make_mindboggle_corpus(tmp_path, n=4, shape=(32, 16, 16))
    config = tiny_config(tmp_path, n_epochs=1)
    config.update(samples_per_epoch=2, crop_size=None)
    exp = SegmentationExperiment(config)
    exp.train()
    ckpt = os.path.join(exp.ckpoint_dir, "checkpoint")
    assert os.path.isdir(ckpt)

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "infer_seg.py"),
         "--ckpt", ckpt, "--data-root", str(tmp_path),
         "--list-file", str(tmp_path / "valid.txt"), "--data", "MindBoggle",
         "--n-classes", "3", "--no-packed", "--no-bf16",
         "--spatial-shards", "2"],
        capture_output=True, text=True, env=env, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(ln) for ln in out.stdout.splitlines()
             if ln.startswith("{")]
    assert any("mean_dice_avg" in ln for ln in lines)
    per = [ln for ln in lines if "dice_avg" in ln and "name" in ln]
    assert per and all(np.isfinite(ln["dice_avg"]) for ln in per)
