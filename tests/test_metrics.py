"""Metrics tests: confusion-sum metrics vs scipy/numpy references, and
Jacobian folding stats on analytically-known deformations."""
import numpy as np
import pytest
import scipy.spatial.distance

import jax.numpy as jnp

from deepatlas_tpu.metrics import (confusion_matrix, folding_stats,
                                   jacobian_determinant, metric_eval,
                                   multiclass_dice, per_class_metrics)
from deepatlas_tpu.ops import identity_grid_batch


def test_confusion_matrix_matches_numpy(rng):
    n = 6
    pred = rng.randint(0, n, size=(40, 41, 13))
    truth = rng.randint(0, n, size=(40, 41, 13))
    cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(truth), n))
    ref = np.zeros((n, n))
    for t in range(n):
        for p in range(n):
            ref[t, p] = np.sum((truth == t) & (pred == p))
    np.testing.assert_allclose(cm, ref)


def test_binary_dice_matches_scipy(rng):
    """segmentation.py:190-194 computes per-class dice via scipy on binary
    masks; our confusion dice must match."""
    pred = rng.randint(0, 2, size=(20, 21, 22)).astype(bool)
    truth = rng.randint(0, 2, size=(20, 21, 22)).astype(bool)
    ours = float(metric_eval("dice", jnp.asarray(pred.astype(np.int32)),
                             jnp.asarray(truth.astype(np.int32))))
    ref = 1.0 - scipy.spatial.distance.dice(pred.reshape(-1), truth.reshape(-1))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_per_class_metrics_consistency(rng):
    n = 4
    pred = rng.randint(0, n, size=(10, 11, 12))
    truth = rng.randint(0, n, size=(10, 11, 12))
    res = per_class_metrics(jnp.asarray(pred), jnp.asarray(truth), n)
    for c in range(n):
        p = pred == c
        t = truth == c
        tp = np.sum(p & t)
        np.testing.assert_allclose(float(res["dice"][c]),
                                   2 * tp / (p.sum() + t.sum()), rtol=1e-4)
        np.testing.assert_allclose(float(res["recall"][c]),
                                   tp / t.sum(), rtol=1e-4)
        np.testing.assert_allclose(float(res["precision"][c]),
                                   tp / p.sum(), rtol=1e-4)
        np.testing.assert_allclose(float(res["iou"][c]),
                                   tp / (p.sum() + t.sum() - tp), rtol=1e-4)


def test_multiclass_dice_batch(rng):
    n = 5
    pred = rng.randint(0, n, size=(2, 8, 9, 10))
    truth = rng.randint(0, n, size=(2, 8, 9, 10))
    scores = np.asarray(multiclass_dice(jnp.asarray(pred), jnp.asarray(truth), n))
    assert scores.shape == (2, n - 1)
    for b in range(2):
        for c in range(1, n):
            p = (pred[b] == c).reshape(-1)
            t = (truth[b] == c).reshape(-1)
            ref = 1.0 - scipy.spatial.distance.dice(p, t)
            np.testing.assert_allclose(scores[b, c - 1], ref, rtol=1e-4)


def test_perfect_prediction_dice_is_one(rng):
    mask = rng.randint(0, 3, size=(1, 6, 7, 8))
    scores = np.asarray(multiclass_dice(jnp.asarray(mask), jnp.asarray(mask), 3))
    np.testing.assert_allclose(scores, 1.0, atol=1e-6)


class TestJacobian:
    def test_identity_has_unit_det(self):
        deform = identity_grid_batch((1, 8, 9, 10))
        det = np.asarray(jacobian_determinant(deform))
        np.testing.assert_allclose(det, 1.0, atol=1e-4)
        stats = folding_stats(deform)
        assert float(stats["folding_fraction"]) == 0.0

    def test_uniform_scaling_det(self):
        # scaling the deformation by 0.5 around center: det = 0.125
        deform = identity_grid_batch((1, 9, 9, 9)) * 0.5
        det = np.asarray(jacobian_determinant(deform))
        np.testing.assert_allclose(det, 0.125, atol=1e-4)

    def test_flip_produces_folding(self):
        # negating one axis gives det = -1 everywhere -> 100% folding
        deform = np.array(identity_grid_batch((1, 7, 8, 9)))
        deform[..., 0] *= -1
        stats = folding_stats(jnp.asarray(deform))
        assert float(stats["folding_fraction"]) == 1.0


class TestProfiling:
    def test_throughput_meter(self):
        from deepatlas_tpu.utils import ThroughputMeter
        m = ThroughputMeter(n_chips=2)
        m.start()
        for _ in range(5):
            m.step(volumes=4)
        s = m.summary()
        assert s["steps"] == 5 and s["volumes"] == 20
        assert m.volumes_per_sec > 0
        assert abs(m.volumes_per_sec_per_chip * 2
                   - m.volumes_per_sec) < 1e-6 * m.volumes_per_sec

    def test_sync_and_memory_stats(self):
        import jax.numpy as jnp
        from deepatlas_tpu.utils import device_memory_stats, sync
        sync({"a": jnp.ones((4,))})
        stats = device_memory_stats()
        assert isinstance(stats, dict)
