"""Checkpoint save/restore with the reference's periodic+best semantics.

Mirrors ``BaseExperiment.save_checkpoint`` / ``initialize_model``
(models/base.py:70-120): a rolling ``checkpoint`` plus a ``model_best`` copy,
storing epoch / best_score / model / optimizer state; restore returns
(finished_epoch, best_score) and tolerates the ``reg_best_score`` /
``seg_best_score`` aliases used by joint-training checkpoints
(models/base.py:96-101).  Backed by orbax (atomic, async-capable, sharded-
array aware for the multi-chip path).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

CKPT_NAME = "checkpoint"
BEST_NAME = "model_best"


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(state: dict, is_best: bool, path: str,
                    prefix: Optional[str] = None) -> None:
    """Save ``state`` (a pytree dict, e.g. {'epoch', 'params', 'opt_state',
    'batch_stats', 'best_score', ...}) under ``path``; also copy to the best
    slot when ``is_best``."""
    path = os.path.abspath(path)  # orbax/tensorstore requires absolute
    os.makedirs(path, exist_ok=True)
    state = jax.device_get(state)
    ckpt = _checkpointer()
    name = f"{prefix}_{CKPT_NAME}" if prefix else CKPT_NAME
    best = f"{prefix}_{BEST_NAME}" if prefix else BEST_NAME
    ckpt.save(os.path.join(path, name), state, force=True)
    if is_best:
        ckpt.save(os.path.join(path, best), state, force=True)


def load_checkpoint(path: str, template: Optional[Any] = None) -> dict:
    """Restore a checkpoint directory saved by ``save_checkpoint``.

    Tolerates top-level key drift between the template and the on-disk
    tree (e.g. checkpoints written before scheduler state was persisted,
    or test-time templates that don't carry it): on a structure mismatch
    the tree is restored raw and merged into the template's keys.
    """
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        raise ValueError(f"=> no checkpoint found at '{path}'")
    ckpt = _checkpointer()
    if template is not None:
        template = jax.device_get(template)
        try:
            return ckpt.restore(path, item=template)
        except ValueError:
            raw = ckpt.restore(path)
            merged = dict(template)
            for key in merged:
                if key in raw:
                    merged[key] = raw[key]
            return merged
    return ckpt.restore(path)


def initialize_from(path: str, template: Optional[Any] = None
                    ) -> Tuple[dict, int, float]:
    """Restore and unpack (state, finished_epoch, best_score); accepts the
    reg/seg best-score key aliases (models/base.py:96-101)."""
    state = load_checkpoint(path, template)
    for key in ("best_score", "reg_best_score", "seg_best_score"):
        if key in state:
            best_score = float(np.asarray(state[key]))
            break
    else:
        raise ValueError("no best score key")
    finished_epoch = int(np.asarray(state.get("epoch", 0)))
    return state, finished_epoch, best_score
