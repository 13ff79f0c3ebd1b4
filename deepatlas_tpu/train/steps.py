"""Jit-compiled train / eval step factories.

The reference's per-iteration work (forward, loss, backward, optimizer step,
segmentation.py:139-173) becomes one fused XLA program per step: donated
state, no host sync except the scalar loss the logger asks for.  Eval fuses
forward + argmax + confusion-dice on device (vs the reference's
logits-to-host numpy loop, segmentation.py:188-194).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..metrics import multiclass_dice


class TrainState(struct.PyTreeNode):
    """Minimal train state: params + BN stats + optimizer state."""
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   apply_fn=apply_fn, tx=tx)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats))


def make_optimizer(learning_rate: float = 1e-3) -> optax.GradientTransformation:
    """Adam with an injectable learning rate (host-side schedulers update
    ``opt_state.hyperparams['learning_rate']`` between epochs)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=opt_state.hyperparams["learning_rate"].dtype)
    return state.replace(opt_state=opt_state)


def _apply_model(state: TrainState, params, images, train: bool):
    variables = {"params": params}
    has_bn = bool(state.batch_stats)
    if has_bn:
        variables["batch_stats"] = state.batch_stats
    if train and has_bn:
        out, mutated = state.apply_fn(variables, images, train=True,
                                      mutable=["batch_stats"])
        return out, mutated["batch_stats"]
    out = state.apply_fn(variables, images, train=train)
    return out, state.batch_stats


def make_seg_train_step(criterion: Callable):
    """Returns jitted ``(state, images, labels) -> (state, loss, logits)``."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, images, labels):
        def loss_fn(params):
            logits, new_bn = _apply_model(state, params, images, train=True)
            loss = criterion(logits.astype(jnp.float32), labels)
            return loss, (new_bn, logits)

        (loss, (new_bn, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, new_bn)
        return state, loss, logits

    return train_step


def make_seg_eval_step(n_class: int):
    """Returns jitted ``(state, images, labels) -> (per_class_dice, logits)``
    computing foreground dice fully on device."""

    @jax.jit
    def eval_step(state: TrainState, images, labels):
        logits, _ = _apply_model(state, state.params, images, train=False)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        dice = multiclass_dice(preds, labels.astype(jnp.int32), n_class)
        return dice, logits

    return eval_step
