"""Whole-volume sliding-window inference (OAI capability).

The reference assembles this path from ``Partition`` (overlap-tile split,
transforms.py:508-649), a chunked batched forward (``pred_iter``,
lib/tools.py:363-377) and ``Partition.assemble`` (center-stitch or per-label
voting).  Here the tile forward is one jitted program over a *static* tile
batch (the last chunk zero-padded rather than shape-changing, so XLA compiles
exactly once), and per-tile argmax runs on device — only uint8 labels return
to host.
"""
from __future__ import annotations


from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import Partition


def make_tile_predictor(apply_fn: Callable, variables, tile_batch: int = 4):
    """Returns ``tiles (N, d, h, w, 1) -> labels (N, d, h, w) uint8`` running
    the network on fixed-size tile chunks."""

    @jax.jit
    def forward(tiles):
        logits = apply_fn(variables, tiles, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    def predict(tiles: np.ndarray) -> np.ndarray:
        n = tiles.shape[0]
        pad = (-n) % tile_batch
        if pad:
            tiles = np.concatenate(
                [tiles, np.zeros((pad,) + tiles.shape[1:], tiles.dtype)])
        outs = []
        for i in range(0, tiles.shape[0], tile_batch):
            outs.append(np.asarray(forward(jnp.asarray(
                tiles[i:i + tile_batch]))))
        return np.concatenate(outs)[:n]

    return predict


def sliding_window_predict(predict_tiles: Callable, sample: dict,
                           tile_size: Sequence[int],
                           overlap_size: Sequence[int],
                           is_vote: bool = False,
                           crop_size: Optional[Sequence[int]] = None,
                           padding_mode: str = "reflect") -> np.ndarray:
    """Partition ``sample['image']`` into overlap tiles, predict labels per
    tile, and reassemble to the original volume.

    Args:
      predict_tiles: ``(N, d, h, w, 1) -> (N, d, h, w)`` label predictor
        (see make_tile_predictor).
      sample: dict with 'image' of shape (D, H, W, 1) float32.

    Returns:
      (D, H, W) uint8 predicted labels.
    """
    part = Partition(tile_size, overlap_size, padding_mode=padding_mode)
    tiled = part(dict(sample))
    labels = predict_tiles(tiled["image"])
    return part.assemble(labels, is_vote=is_vote, crop_size=crop_size,
                         data_type=np.uint8)


def evaluate_sliding_window(apply_fn, variables, dataloader,
                            tile_size, overlap_size, n_classes: int,
                            tile_batch: int = 4, is_vote: bool = False):
    """Sliding-window eval over a dataset: per-class dice of assembled
    whole-volume predictions (the reference's OAI test protocol)."""
    from ..metrics.confusion import confusion_matrix, dice_from_confusion

    predict = make_tile_predictor(apply_fn, variables, tile_batch)

    @jax.jit
    def _dice(pred, truth):
        cm = confusion_matrix(pred[None].astype(jnp.int32),
                              truth[None].astype(jnp.int32), n_classes)
        return dice_from_confusion(cm, 1e-11)[1:]

    dices = []
    names = []
    for batch in dataloader:
        for b in range(batch["image"].shape[0]):
            sample = {"image": batch["image"][b]}
            pred = sliding_window_predict(predict, sample, tile_size,
                                          overlap_size, is_vote=is_vote)
            truth = batch["segmentation"][b]
            dices.append(np.asarray(_dice(jnp.asarray(pred),
                                          jnp.asarray(truth))))
            names.append(batch["name"][b])
    return np.stack(dices), names
