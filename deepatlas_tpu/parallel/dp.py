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
from ..metrics.confusion import confusion_matrix, dice_from_confusion
from ..train.reg_steps import _BN_MOMENTUM
from ..train.steps import TrainState, _apply_model
from .collectives import maybe_shard_map, pmean_tree


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put arrays sharded on their leading (batch) axis.

    Degenerate mesh (size 1): plain uncommitted put — committed
    NamedShardings force SPMD-compiled modules, which the axon TPU client
    runs pathologically slowly (PERF.md round-5)."""
    if mesh.size == 1:
        return jax.tree_util.tree_map(jax.device_put, batch)
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding, may_alias=False), batch)


def replicate(tree, mesh: Mesh):
    """Deep-copy a pytree onto the mesh, replicated.

    The explicit ``jnp.copy`` guarantees fresh buffers: the DP steps donate
    their state, and ``device_put`` aliases same-device shards (even under
    ``may_alias=False`` on the CPU backend), which would let the donation
    invalidate the caller's original arrays.
    """
    if mesh.size == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.copy(x)), tree)
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.copy(x), sharding, may_alias=False),
        tree)


def make_dp_seg_train_step(criterion: Callable, mesh: Mesh,
                           axis_name: str = "data"):
    """Data-parallel seg train step: per-shard grads, pmean over ICI,
    replicated update.  Batch axis must be divisible by the mesh size."""

    def grads_fn(state: TrainState, images, labels):
        def loss_fn(params):
            logits, new_bn = _apply_model(state, params, images, train=True)
            loss = criterion(logits.astype(jnp.float32), labels)
            return loss, (new_bn, logits)

        (loss, (new_bn, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # ONE bucketed all-reduce for grads + loss + cross-replica BN
        # statistics (SURVEY.md §7 hard-parts list; collectives.py)
        loss, grads, new_bn = pmean_tree((loss, grads, new_bn), axis_name)
        return loss, grads, new_bn, logits

    sharded_grads = maybe_shard_map(
        grads_fn, mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P(), P(axis_name)), axis_names=(axis_name,))

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, images, labels):
        loss, grads, new_bn, logits = sharded_grads(state, images, labels)
        state = state.apply_gradients(grads, new_bn)
        return state, loss, logits

    return train_step


def make_dp_seg_eval_step(n_class: int, mesh: Mesh,
                          axis_name: str = "data"):
    """Data-parallel eval: per-shard per-volume foreground dice, gathered
    over ICI — same ``(dice (B, n_fg), logits)`` contract as the
    single-device ``make_seg_eval_step`` (reference semantics: average of
    per-volume dice, segmentation.py:190-197)."""
    from ..metrics import multiclass_dice

    def dice_fn(state: TrainState, images, labels):
        logits, _ = _apply_model(state, state.params, images, train=False)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        dice = multiclass_dice(preds, labels.astype(jnp.int32), n_class)
        return lax.all_gather(dice, axis_name, axis=0, tiled=True), logits

    sharded = maybe_shard_map(
        dice_fn, mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=(P(), P(axis_name)), axis_names=(axis_name,))

    @jax.jit
    def eval_step(state: TrainState, images, labels):
        return sharded(state, images, labels)

    return eval_step


def make_dp_confusion_eval_step(n_class: int, mesh: Mesh,
                                axis_name: str = "data"):
    """Global-confusion variant: one confusion matrix psum'd over the mesh,
    dice computed from the merged counts (micro-averaged)."""

    def cm_fn(state: TrainState, images, labels):
        logits, _ = _apply_model(state, state.params, images, train=False)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        cm = confusion_matrix(preds, labels.astype(jnp.int32), n_class)
        return lax.psum(cm, axis_name)

    sharded_cm = maybe_shard_map(
        cm_fn, mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(), axis_names=(axis_name,))

    @jax.jit
    def eval_step(state: TrainState, images, labels):
        cm = sharded_cm(state, images, labels)
        return dice_from_confusion(cm, 1e-11)[1:]

    return eval_step


def make_dp_joint_steps(sim_loss: Callable, reg_loss: Callable,
                        sup_loss: Callable, reg_weight: float,
                        anatomy_weight: float, supervised_weight: float,
                        n_class: int, mesh: Mesh, axis_name: str = "data",
                        warp_fn: Callable | None = None,
                        seg_warp_fn: Callable | None = None,
                        anatomy_dtype=None, max_disp: int | None = None,
                        fused_anatomy: bool = False, two_pass: bool = True,
                        hard_fused: bool = False,
                        anatomy_kwargs: dict | None = None,
                        adjoint_warp_fn: Callable | None = None):
    """Data-parallel flavors of the joint DeepAtlas phase steps.

    Same semantics as train/reg_steps.py's ``make_joint_reg_step`` /
    ``make_joint_seg_step`` (alternating semi-supervised scheme, exact
    two-pass seg gradient split, injectable ``warp_fn`` for the TPU Pallas
    spatial transformer, optional fused hard-label anatomy for the reg
    phase), but the batch is sharded over the mesh's data axis and
    gradients/metrics/BN statistics are ``pmean``-reduced over ICI before
    the replicated optimizer update.

    ``seg_warp_fn`` warps the C = n_class probability volumes of the seg
    phase (frozen field — pass the values-only-gradient Pallas variant).

    ``hard_fused`` mirrors reg_steps.py's seg-phase label-structure
    dispatch: each shard resolves its LOCAL batch's label pattern with a
    per-shard ``lax.switch`` — both sides hard (C=1 matched-anatomy value,
    supervised-only backwards), moving hard (constant warped one-hot, warp
    forward only), fixed hard (adjoint-identity splat of the constant
    one-hot, elementwise anatomy gradient), or the general soft path.  No
    branch contains collectives, so shards may diverge freely; gradient
    pmean happens after the switch.

    Returns ``(dp_reg_step, dp_seg_step)`` with signatures
    ``(phase_state, other_state, moving, fixed, moving_seg, fixed_seg,
    moving_has_label, fixed_has_label) -> (phase_state, metrics)``.
    """
    from functools import partial as _p

    from ..losses import soft_dice_on_probs
    from ..ops import grid_sample as _gs
    from ..ops import one_hot

    warp_fn = warp_fn or _p(_gs, mode="trilinear")
    seg_warp_fn = seg_warp_fn or warp_fn
    # one-hot cotangent variant for the f-hard adjoint splat (reg_steps.py)
    adjoint_warp_fn = adjoint_warp_fn or seg_warp_fn
    adt = anatomy_dtype or jnp.float32
    if hard_fused and max_disp is None:
        raise ValueError("hard_fused requires max_disp")

    def reg_grads_fn(reg_state, seg_state, moving, fixed, moving_seg,
                     fixed_seg, m_has, f_has):
        # frozen seg-net label substitution, skipped per shard when the
        # side is fully labeled (lax.cond — per-shard control flow, no
        # collectives inside, same rationale as the seg phase's switch)
        def _substitute(has_label, gt_seg, images):
            def use_gt():
                return gt_seg.astype(jnp.int32)

            def use_pred():
                logits, _ = _apply_model(seg_state, seg_state.params,
                                         images, train=False)
                pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return jnp.where(has_label[:, None, None, None],
                                 gt_seg.astype(jnp.int32), pred)

            return lax.cond(jnp.all(has_label), use_gt, use_pred)

        lab_m = _substitute(m_has, moving_seg, moving)
        lab_f = _substitute(f_has, fixed_seg, fixed)
        onehot_m = None if fused_anatomy else one_hot(lab_m, n_class,
                                                      dtype=adt)

        def loss_fn(params):
            disp, warped, deform = reg_state.apply_fn(
                {"params": params}, moving, fixed, train=True)
            sim = sim_loss(warped.astype(jnp.float32),
                           fixed.astype(jnp.float32))
            reg = reg_loss(disp.astype(jnp.float32))
            if fused_anatomy:
                from ..pallas.anatomy import hard_anatomy_dice
                # fused_grad: differentiated w.r.t. deform (reg_steps.py)
                anat = hard_anatomy_dice(lab_m, lab_f, deform, n_class,
                                         max_disp=max_disp, fused_grad=True,
                                         **(anatomy_kwargs or {}))
            else:
                warped_onehot = warp_fn(onehot_m, deform)
                anat = soft_dice_on_probs(warped_onehot, lab_f, n_class)
            return sim + reg_weight * reg + anatomy_weight * anat, \
                (sim, reg, anat)

        (loss, (sim, reg, anat)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(reg_state.params)
        metrics = {"loss": loss, "sim": sim, "reg": reg, "anatomy": anat}
        # one bucketed all-reduce for the grad tree + metric scalars
        return pmean_tree((grads, metrics), axis_name)

    def _soft_dice(warped_m, f_probs):
        inter = jnp.sum(warped_m[..., 1:] * f_probs[..., 1:],
                        axis=(1, 2, 3), dtype=jnp.float32)
        denom = jnp.sum(warped_m[..., 1:], axis=(1, 2, 3),
                        dtype=jnp.float32) + \
            jnp.sum(f_probs[..., 1:], axis=(1, 2, 3), dtype=jnp.float32)
        return 1.0 - jnp.mean(2.0 * inter / (denom + 1e-5))

    def seg_grads_fn(seg_state, reg_state, moving, fixed, moving_seg,
                     fixed_seg, m_has, f_has):
        """Exact two-pass gradient split (reg_steps.py:step_two_pass), with
        per-pass pmean so only one U-Net backward graph is live per shard."""
        disp, warped, deform = reg_state.apply_fn(
            {"params": reg_state.params}, moving, fixed, train=False)
        deform = jax.lax.stop_gradient(deform)

        onehot_m = one_hot(moving_seg.astype(jnp.int32), n_class, dtype=adt)
        onehot_f = one_hot(fixed_seg.astype(jnp.int32), n_class, dtype=adt)
        # supervised terms: each shard contributes its own labeled branches
        # only; the normalizer is the GLOBAL labeled-branch count, so the
        # pmean of per-shard gradients reproduces the global labeled mean
        lm = jnp.any(m_has).astype(jnp.float32)
        lf = jnp.any(f_has).astype(jnp.float32)
        n_lab = jnp.maximum(lax.psum(lm + lf, axis_name), 1.0)
        # the axis size is static under shard_map — no collective needed
        n_dev = float(lax.axis_size(axis_name))
        wm = lm * n_dev / n_lab        # per-shard supervised weight (moving)
        wf = lf * n_dev / n_lab

        def branch_probs(logits, has_label, onehot):
            probs = jax.nn.softmax(logits.astype(jnp.float32),
                                   axis=-1).astype(adt)
            return jnp.where(has_label[:, None, None, None, None], onehot,
                             probs)

        if two_pass:
            def soft_branch(_):
                # fixed-branch forward ONCE via jax.vjp (see reg_steps.py
                # soft_branch): value feeds pass A's constant, pullback
                # closes pass B — 2 forwards + 2 backwards per shard.  No
                # collectives inside.
                (f_logits, new_bn_f), pull_f = jax.vjp(
                    lambda p: _apply_model(seg_state, p, fixed, train=True),
                    seg_state.params)
                f_probs_const = jax.lax.stop_gradient(
                    branch_probs(f_logits, f_has, onehot_f))

                def loss_a(params):
                    logits_m, new_bn = _apply_model(seg_state, params,
                                                    moving, train=True)
                    m_probs = branch_probs(logits_m, m_has, onehot_m)
                    warped_m = seg_warp_fn(m_probs, deform)
                    anat = _soft_dice(warped_m, f_probs_const)
                    sup_m = sup_loss(logits_m.astype(jnp.float32),
                                     moving_seg.astype(jnp.int32))
                    loss = anatomy_weight * anat \
                        + supervised_weight * sup_m * wm
                    return loss, (new_bn, anat, sup_m, warped_m)

                (_, (new_bn, anat, sup_m, warped_m)), grads_a = \
                    jax.value_and_grad(loss_a, has_aux=True)(
                        seg_state.params)
                # the barrier sequences pass B after pass A so only one
                # U-Net backward graph is live per shard at a time
                grads_a, warped_const = jax.lax.optimization_barrier(
                    (grads_a, jax.lax.stop_gradient(warped_m)))

                def head_b(logits_f):
                    f_probs = branch_probs(logits_f, f_has, onehot_f)
                    anat_b = _soft_dice(warped_const, f_probs)
                    sup_f = sup_loss(logits_f.astype(jnp.float32),
                                     fixed_seg.astype(jnp.int32))
                    loss = anatomy_weight * anat_b \
                        + supervised_weight * sup_f * wf
                    return loss, sup_f

                (_, sup_f), ct_logits = jax.value_and_grad(
                    head_b, has_aux=True)(f_logits)
                grads_b, = pull_f((ct_logits,
                                   jax.tree_util.tree_map(jnp.zeros_like,
                                                          new_bn_f)))
                # closed-form fixed-branch stat composition (reg_steps.py)
                new_bn2 = jax.tree_util.tree_map(
                    lambda bm, bf, o: (_BN_MOMENTUM * bm + bf
                                       - _BN_MOMENTUM * o),
                    new_bn, new_bn_f, seg_state.batch_stats)
                grads = jax.tree_util.tree_map(jnp.add, grads_a, grads_b)
                return grads, new_bn2, anat, sup_m, sup_f

            def hard_branch(_):
                # fully-labeled local batch: zero anatomy gradient (see
                # reg_steps.py hard_branch); C=1 matched-warp value,
                # supervised-only backwards.  No collectives inside.
                from ..pallas.anatomy import hard_anatomy_dice
                anat = hard_anatomy_dice(
                    moving_seg.astype(jnp.int32),
                    fixed_seg.astype(jnp.int32), deform, n_class,
                    max_disp=max_disp, **(anatomy_kwargs or {}))

                def loss_a(params):
                    logits_m, new_bn = _apply_model(seg_state, params,
                                                    moving, train=True)
                    sup_m = sup_loss(logits_m.astype(jnp.float32),
                                     moving_seg.astype(jnp.int32))
                    return supervised_weight * sup_m * wm, (new_bn, sup_m)

                (_, (new_bn, sup_m)), grads_a = jax.value_and_grad(
                    loss_a, has_aux=True)(seg_state.params)
                grads_a = jax.lax.optimization_barrier(grads_a)

                def loss_b(params):
                    logits_f, new_bn2 = _apply_model(
                        seg_state.replace(batch_stats=new_bn), params,
                        fixed, train=True)
                    sup_f = sup_loss(logits_f.astype(jnp.float32),
                                     fixed_seg.astype(jnp.int32))
                    return supervised_weight * sup_f * wf, (new_bn2, sup_f)

                (_, (new_bn2, sup_f)), grads_b = jax.value_and_grad(
                    loss_b, has_aux=True)(seg_state.params)
                grads = jax.tree_util.tree_map(jnp.add, grads_a, grads_b)
                return grads, new_bn2, anat, sup_m, sup_f

            def m_hard_branch(_):
                # local moving batch fully labeled: constant warped one-hot
                # — dense warp FORWARD only (see reg_steps.py), gradient
                # through the fixed branch elementwise.  No collectives.
                warped_const = jax.lax.stop_gradient(
                    seg_warp_fn(onehot_m, deform))

                def loss_a(params):
                    logits_m, new_bn = _apply_model(seg_state, params,
                                                    moving, train=True)
                    sup_m = sup_loss(logits_m.astype(jnp.float32),
                                     moving_seg.astype(jnp.int32))
                    return supervised_weight * sup_m * wm, (new_bn, sup_m)

                (_, (new_bn, sup_m)), grads_a = jax.value_and_grad(
                    loss_a, has_aux=True)(seg_state.params)
                grads_a = jax.lax.optimization_barrier(grads_a)

                def loss_b(params):
                    logits_f, new_bn2 = _apply_model(
                        seg_state.replace(batch_stats=new_bn), params,
                        fixed, train=True)
                    f_probs = branch_probs(logits_f, f_has, onehot_f)
                    anat_b = _soft_dice(warped_const, f_probs)
                    sup_f = sup_loss(logits_f.astype(jnp.float32),
                                     fixed_seg.astype(jnp.int32))
                    loss = anatomy_weight * anat_b \
                        + supervised_weight * sup_f * wf
                    return loss, (new_bn2, anat_b, sup_f)

                (_, (new_bn2, anat, sup_f)), grads_b = jax.value_and_grad(
                    loss_b, has_aux=True)(seg_state.params)
                grads = jax.tree_util.tree_map(jnp.add, grads_a, grads_b)
                return grads, new_bn2, anat, sup_m, sup_f

            def f_hard_branch(_):
                # local fixed batch fully labeled: adjoint identity moves
                # the dense op to the constant side — ONE dense splat,
                # elementwise anatomy gradient (see reg_steps.py).  No
                # collectives.
                from ..ops.warp import warp_values_adjoint
                S = jax.lax.stop_gradient(warp_values_adjoint(
                    adjoint_warp_fn, onehot_f.astype(jnp.float32), deform))
                w_all = jnp.sum(S, axis=-1)
                den_f = jnp.sum(onehot_f[..., 1:], axis=(1, 2, 3),
                                dtype=jnp.float32)

                def loss_a(params):
                    logits_m, new_bn = _apply_model(seg_state, params,
                                                    moving, train=True)
                    m_probs = branch_probs(logits_m, m_has,
                                           onehot_m).astype(jnp.float32)
                    inter = jnp.sum(m_probs[..., 1:] * S[..., 1:],
                                    axis=(1, 2, 3), dtype=jnp.float32)
                    den_m = jnp.sum(m_probs[..., 1:] * w_all[..., None],
                                    axis=(1, 2, 3), dtype=jnp.float32)
                    anat = 1.0 - jnp.mean(
                        2.0 * inter / (den_m + den_f + 1e-5))
                    sup_m = sup_loss(logits_m.astype(jnp.float32),
                                     moving_seg.astype(jnp.int32))
                    loss = anatomy_weight * anat \
                        + supervised_weight * sup_m * wm
                    return loss, (new_bn, anat, sup_m)

                (_, (new_bn, anat, sup_m)), grads_a = jax.value_and_grad(
                    loss_a, has_aux=True)(seg_state.params)
                grads_a = jax.lax.optimization_barrier(grads_a)

                def loss_b(params):
                    logits_f, new_bn2 = _apply_model(
                        seg_state.replace(batch_stats=new_bn), params,
                        fixed, train=True)
                    sup_f = sup_loss(logits_f.astype(jnp.float32),
                                     fixed_seg.astype(jnp.int32))
                    return supervised_weight * sup_f * wf, (new_bn2, sup_f)

                (_, (new_bn2, sup_f)), grads_b = jax.value_and_grad(
                    loss_b, has_aux=True)(seg_state.params)
                grads = jax.tree_util.tree_map(jnp.add, grads_a, grads_b)
                return grads, new_bn2, anat, sup_m, sup_f

            if hard_fused:
                am = jnp.all(m_has).astype(jnp.int32)
                af = jnp.all(f_has).astype(jnp.int32)
                grads, new_bn2, anat, sup_m, sup_f = lax.switch(
                    am * 2 + af,
                    [soft_branch, f_hard_branch, m_hard_branch,
                     hard_branch], None)
            else:
                grads, new_bn2, anat, sup_m, sup_f = soft_branch(None)

            # one bucketed all-reduce closes the whole phase: grads, BN
            # stats and the metric numerators ride a single collective
            grads, new_bn2, anat_mean, sup_x = pmean_tree(
                (grads, new_bn2, anat, sup_m * lm + sup_f * lf), axis_name)
            sup = sup_x * n_dev / n_lab
            loss = anatomy_weight * anat_mean + supervised_weight * sup
            metrics = {"loss": loss, "anatomy": anat_mean,
                       "supervised": sup}
            return grads, new_bn2, metrics

        def loss_fn(params):
            logits_m, new_bn = _apply_model(seg_state, params, moving,
                                            train=True)
            logits_f, new_bn2 = _apply_model(
                seg_state.replace(batch_stats=new_bn), params, fixed,
                train=True)
            m_probs = branch_probs(logits_m, m_has, onehot_m)
            f_probs = branch_probs(logits_f, f_has, onehot_f)
            warped_m = seg_warp_fn(m_probs, deform)
            anat = _soft_dice(warped_m, f_probs)
            sup_m = sup_loss(logits_m.astype(jnp.float32),
                             moving_seg.astype(jnp.int32))
            sup_f = sup_loss(logits_f.astype(jnp.float32),
                             fixed_seg.astype(jnp.int32))
            sup = sup_m * wm + sup_f * wf
            loss = anatomy_weight * anat + supervised_weight * sup
            return loss, (new_bn2, anat, sup)

        (loss, (new_bn, anat, sup)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(seg_state.params)
        metrics = {"loss": loss, "anatomy": anat, "supervised": sup}
        return pmean_tree((grads, new_bn, metrics), axis_name)

    batch_specs = (P(axis_name),) * 6
    sharded_reg = maybe_shard_map(reg_grads_fn, mesh,
                                  in_specs=(P(), P()) + batch_specs,
                                  out_specs=P(), axis_names=(axis_name,))
    sharded_seg = maybe_shard_map(seg_grads_fn, mesh,
                                  in_specs=(P(), P()) + batch_specs,
                                  out_specs=P(), axis_names=(axis_name,))

    @partial(jax.jit, donate_argnums=(0,))
    def dp_reg_step(reg_state, seg_state, *batch):
        grads, metrics = sharded_reg(reg_state, seg_state, *batch)
        return reg_state.apply_gradients(grads), metrics

    @partial(jax.jit, donate_argnums=(0,))
    def dp_seg_step(seg_state, reg_state, *batch):
        grads, new_bn, metrics = sharded_seg(seg_state, reg_state, *batch)
        return seg_state.apply_gradients(grads, new_bn), metrics

    return dp_reg_step, dp_seg_step


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
            return sim + reg_weight * reg, (sim, reg)

        (loss, (sim, reg)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics = {"loss": loss, "sim": sim, "reg": reg}
        return pmean_tree((metrics, grads), axis_name)

    sharded_grads = maybe_shard_map(
        grads_fn, mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(), axis_names=(axis_name,))

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, moving, fixed):
        metrics, grads = sharded_grads(state, moving, fixed)
        state = state.apply_gradients(grads)
        return state, metrics

    return train_step
