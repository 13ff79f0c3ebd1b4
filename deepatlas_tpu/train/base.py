"""Experiment lifecycle base.

Mirrors the reference's ``BaseExperiment`` surface (models/base.py:25-68):
``__init__(config)`` then ``train()`` / ``test()``, with the
setup_log/seed/model/loss/data/optimizer lifecycle — but the compute path
underneath is pure functions + jitted steps instead of stateful modules.
"""
from __future__ import annotations

import os
import random
from typing import Optional

import jax
import numpy as np

from ..utils.config import save_dict_to_json


class BaseExperiment:
    def __init__(self, config: dict, **kwargs):
        self.config = dict(config)
        self.writer = None

    # lifecycle hooks -----------------------------------------------------
    def setup_log(self):
        pass

    def setup_random_seed(self):
        """Seed numpy/python RNGs and create the root JAX key
        (models/base.py:33-39; JAX compute is deterministic by construction)."""
        seed = self.config["random_seed"]
        np.random.seed(seed)
        random.seed(seed)
        self.root_key = jax.random.PRNGKey(seed)

    def setup_train_data(self):
        pass

    def setup_model(self):
        pass

    def setup_loss(self):
        pass

    def setup_optimizer(self):
        pass

    def setup_train(self):
        self.setup_log()
        self.setup_random_seed()
        self.setup_model()
        self.setup_loss()
        self.setup_train_data()
        self.setup_optimizer()

    # helpers -------------------------------------------------------------
    def save_config_snapshot(self, path: str):
        save_dict_to_json(self.config, os.path.join(path,
                                                    "train_config.json"))

    def train(self, **kwargs):
        raise NotImplementedError()

    def close(self):
        if self.writer is not None:
            self.writer.close()


class test_logger:
    """Context manager yielding a logger that writes ``test_log.txt`` plus
    stderr (the reference's test logging, models/segmentation.py:262-274) —
    with explicit handlers, because ``logging.basicConfig`` silently no-ops
    once any earlier experiment configured the root logger in-process."""

    def __init__(self, path: str):
        self.path = path

    def __enter__(self):
        import logging
        self.logger = logging.getLogger(f"deepatlas_test_{id(self)}")
        self.logger.setLevel(logging.DEBUG)
        self.logger.propagate = False
        self.fh = logging.FileHandler(self.path)
        self.sh = logging.StreamHandler()
        self.logger.addHandler(self.fh)
        self.logger.addHandler(self.sh)
        return self.logger

    def __exit__(self, *exc):
        self.logger.removeHandler(self.fh)
        self.logger.removeHandler(self.sh)
        self.fh.close()
        return False
