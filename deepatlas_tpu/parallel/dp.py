"""Data-parallel train/eval steps via shard_map.

Per-shard forward/backward with explicit collectives: gradients and losses
``pmean`` over the mesh's data axis (XLA lowers these to ICI all-reduces),
BatchNorm batch statistics cross-replica averaged — exactly the layout the
scaling-book DP recipe prescribes: params replicated, batch sharded on axis
0, collectives ride ICI.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..metrics.confusion import confusion_matrix, dice_from_confusion
from ..train.steps import TrainState, _apply_model


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put arrays sharded on their leading (batch) axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def make_dp_seg_train_step(criterion: Callable, mesh: Mesh,
                           axis_name: str = "data"):
    """Data-parallel seg train step: per-shard grads, pmean over ICI,
    replicated update.  Batch axis must be divisible by the mesh size."""

    def grads_fn(state: TrainState, images, labels):
        def loss_fn(params):
            logits, new_bn = _apply_model(state, params, images, train=True)
            loss = criterion(logits.astype(jnp.float32), labels)
            return loss, new_bn

        (loss, new_bn), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = lax.pmean(grads, axis_name)
        loss = lax.pmean(loss, axis_name)
        # cross-replica BN statistics (SURVEY.md §7 hard-parts list)
        new_bn = lax.pmean(new_bn, axis_name)
        return loss, grads, new_bn

    sharded_grads = shard_map(
        grads_fn, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_rep=False)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, images, labels):
        loss, grads, new_bn = sharded_grads(state, images, labels)
        state = state.apply_gradients(grads, new_bn)
        return state, loss

    return train_step


def make_dp_seg_eval_step(n_class: int, mesh: Mesh,
                          axis_name: str = "data"):
    """Data-parallel eval: per-shard confusion sums, psum, dice on device."""

    def cm_fn(state: TrainState, images, labels):
        logits, _ = _apply_model(state, state.params, images, train=False)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        cm = confusion_matrix(preds, labels.astype(jnp.int32), n_class)
        return lax.psum(cm, axis_name)

    sharded_cm = shard_map(
        cm_fn, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_rep=False)

    @jax.jit
    def eval_step(state: TrainState, images, labels):
        cm = sharded_cm(state, images, labels)
        return dice_from_confusion(cm, 1e-11)[1:]

    return eval_step


def make_dp_reg_train_step(sim_loss: Callable, reg_loss: Callable,
                           reg_weight: float, mesh: Mesh,
                           axis_name: str = "data"):
    """Data-parallel registration train step (LNCC + regularizer)."""

    def grads_fn(state: TrainState, moving, fixed):
        def loss_fn(params):
            disp, warped, _ = state.apply_fn({"params": params}, moving,
                                             fixed, train=True)
            sim = sim_loss(warped.astype(jnp.float32),
                           fixed.astype(jnp.float32))
            reg = reg_loss(disp.astype(jnp.float32))
            return sim + reg_weight * reg

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return (lax.pmean(loss, axis_name), lax.pmean(grads, axis_name))

    sharded_grads = shard_map(
        grads_fn, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_rep=False)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, moving, fixed):
        loss, grads = sharded_grads(state, moving, fixed)
        state = state.apply_gradients(grads)
        return state, loss

    return train_step
