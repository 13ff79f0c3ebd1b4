"""Jitted steps for registration and joint DeepAtlas training.

Registration (BASELINE.json config 2): one fused program per step —
VoxelMorph forward, trilinear warp, similarity (LNCC by default) +
displacement regularizer (bending energy / gradient), backward, Adam update.

Joint DeepAtlas (BASELINE.json config 3; the alternating semi-supervised
scheme of the MICCAI'19 paper the reference implements): two train states
(seg net, reg net) updated alternately by two separate jitted programs —
no recompilation between phases (SURVEY.md §7 hard-parts list).  Missing
ground-truth labels are substituted on device by the *other* network's
prediction (``jnp.where`` on a has-label flag), which is what makes the
scheme semi-supervised.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..losses import soft_dice_on_probs
from ..metrics import multiclass_dice
from functools import partial as _partial

from ..ops import displacement_overflow, one_hot, warp_labels
from ..ops import grid_sample as _xla_grid_sample

grid_sample = _partial(_xla_grid_sample, mode="trilinear")
from .steps import TrainState, _apply_model

# flax BatchNorm running-average momentum of the model layers
# (models/layers.py nn.BatchNorm(momentum=0.9)); the two-pass soft branch
# composes the fixed-branch stat update in closed form with it
_BN_MOMENTUM = 0.9


def make_reg_train_step(sim_loss: Callable, reg_loss: Callable,
                        reg_weight: float, max_disp: int | None = None):
    """Returns jitted ``(state, moving, fixed) -> (state, metrics)``.

    ``max_disp``: when the model warps through the Pallas kernel (bounded,
    clamped displacements — pallas/warp.py), pass its bound here to get a
    ``disp_overflow`` metric (fraction of voxels whose field exceeded the
    bound and therefore saturated)."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, moving, fixed):
        def loss_fn(params):
            disp, warped, deform = state.apply_fn({"params": params},
                                                  moving, fixed, train=True)
            sim = sim_loss(warped.astype(jnp.float32),
                           fixed.astype(jnp.float32))
            reg = reg_loss(disp.astype(jnp.float32))
            aux = (sim, reg, deform)
            return sim + reg_weight * reg, aux

        (loss, (sim, reg, deform)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        metrics = {"loss": loss, "sim": sim, "reg": reg}
        if max_disp is not None:
            metrics["disp_overflow"] = displacement_overflow(
                jax.lax.stop_gradient(deform), max_disp)
        return state, metrics

    return train_step


def make_reg_eval_step(n_class: int):
    """Returns jitted ``(state, moving, fixed, moving_seg, fixed_seg) ->
    (per_class_dice, folding_fraction)``: warp the moving labels with the
    predicted field (nearest) and dice against the fixed labels on device."""
    from ..metrics import jacobian_determinant

    @jax.jit
    def eval_step(state: TrainState, moving, fixed, moving_seg, fixed_seg):
        disp, warped, deform = state.apply_fn({"params": state.params},
                                              moving, fixed, train=False)
        warped_seg = warp_labels(moving_seg.astype(jnp.int32), deform)
        dice = multiclass_dice(warped_seg, fixed_seg.astype(jnp.int32),
                               n_class)
        det = jacobian_determinant(deform)
        folding = jnp.mean((det <= 0).astype(jnp.float32))
        return dice, folding, warped

    return eval_step


def make_joint_reg_step(sim_loss: Callable, reg_loss: Callable,
                        reg_weight: float, anatomy_weight: float,
                        n_class: int, warp_fn: Callable = grid_sample,
                        anatomy_dtype=None, max_disp: int | None = None,
                        fused_anatomy: bool = False,
                        anatomy_kwargs: dict | None = None):
    """Reg-phase step of joint training: updates the reg net against
    similarity + smoothness + anatomy consistency, with the (frozen) seg net
    filling in missing labels.

    ``warp_fn(vol, grid)`` warps the one-hot anatomy (default: the XLA
    composition; pass ``pallas_grid_sample`` for the TPU kernel — XLA's
    gather is prohibitive at C = n_class).  ``fused_anatomy=True`` skips the
    dense C = n_class one-hot warp entirely: in the reg phase both
    anatomies are hard labels (ground truth or the frozen seg net's
    argmax), so the matched-warp kernel (pallas/anatomy.py) computes the
    identical dice at C=1 cost — requires ``max_disp``.

    Signature: (reg_state, seg_state, moving, fixed, moving_seg, fixed_seg,
    moving_has_label, fixed_has_label) -> (reg_state, metrics)
    """
    if fused_anatomy and max_disp is None:
        raise ValueError("fused_anatomy requires max_disp (the Pallas "
                         "anatomy kernels are displacement-bounded)")

    @partial(jax.jit, donate_argnums=(0,))
    def step(reg_state: TrainState, seg_state: TrainState, moving, fixed,
             moving_seg, fixed_seg, moving_has_label, fixed_has_label):
        # frozen seg-net predictions replace missing ground truth — but only
        # where ground truth is actually missing: a fully-labeled side skips
        # its frozen forward entirely (lax.cond), which in the fully-labeled
        # MB101-21 recipe removes two full-size U-Net forwards per reg step
        def _substitute(has_label, gt_seg, images):
            def use_gt():
                return gt_seg.astype(jnp.int32)

            def use_pred():
                logits, _ = _apply_model(seg_state, seg_state.params,
                                         images, train=False)
                pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return jnp.where(has_label[:, None, None, None],
                                 gt_seg.astype(jnp.int32), pred)

            return jax.lax.cond(jnp.all(has_label), use_gt, use_pred)

        lab_m = _substitute(moving_has_label, moving_seg, moving)
        lab_f = _substitute(fixed_has_label, fixed_seg, fixed)
        onehot_m = None if fused_anatomy else one_hot(
            lab_m, n_class, dtype=anatomy_dtype or jnp.float32)

        def loss_fn(params):
            disp, warped, deform = reg_state.apply_fn(
                {"params": params}, moving, fixed, train=True)
            sim = sim_loss(warped.astype(jnp.float32),
                           fixed.astype(jnp.float32))
            reg = reg_loss(disp.astype(jnp.float32))
            # NB: deform stays f32 — bf16 voxel coordinates lose ~0.5 voxel
            # of precision; only the warped *values* may be low-precision
            if fused_anatomy:
                from ..pallas.anatomy import hard_anatomy_dice
                # fused_grad: this loss IS differentiated w.r.t. deform —
                # one joint-loop sweep emits value + gradient planes
                anat = hard_anatomy_dice(lab_m, lab_f, deform, n_class,
                                         max_disp=max_disp, fused_grad=True,
                                         **(anatomy_kwargs or {}))
            else:
                warped_onehot = warp_fn(onehot_m, deform)
                anat = soft_dice_on_probs(warped_onehot, lab_f, n_class)
            return sim + reg_weight * reg + anatomy_weight * anat, \
                (sim, reg, anat, deform)

        (loss, (sim, reg, anat, deform)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(reg_state.params)
        reg_state = reg_state.apply_gradients(grads)
        metrics = {"loss": loss, "sim": sim, "reg": reg, "anatomy": anat}
        if max_disp is not None:
            metrics["disp_overflow"] = displacement_overflow(
                jax.lax.stop_gradient(deform), max_disp)
        return reg_state, metrics

    return step


def make_joint_seg_step(supervised_loss: Callable, anatomy_weight: float,
                        supervised_weight: float, n_class: int,
                        warp_fn: Callable = grid_sample,
                        anatomy_dtype=None,
                        checkpoint_apply: bool = False,
                        two_pass: bool = True,
                        hard_fused: bool = False,
                        max_disp: int | None = None,
                        anatomy_kwargs: dict | None = None,
                        adjoint_warp_fn: Callable | None = None):
    """Seg-phase step of joint training: updates the seg net against the
    supervised loss (where labels exist) + anatomy consistency through the
    (frozen) reg net's warp.

    ``two_pass`` computes the exact gradient as the sum of two sequenced
    passes — first w.r.t. the moving branch (fixed probabilities constant),
    then w.r.t. the fixed branch (warped moving anatomy constant), an
    application of the multivariate chain rule.  The phase otherwise holds
    TWO U-Net backward graphs plus the C = n_class anatomy tensors live at
    once, which exceeds one chip's HBM at full MB101 size.
    ``checkpoint_apply`` additionally makes each forward full-recompute.

    ``hard_fused`` adds a runtime label-structure dispatch (``lax.switch``)
    that resolves which sides of the pair carry ground-truth labels and
    takes the cheapest branch that computes the EXACT same gradients:

    * **both hard** — the anatomy reads only constants (``branch_probs``
      selects the one-hot for both branches), so its gradient w.r.t. the
      seg params is identically zero — the same structural zero the
      reference's autograd would exploit (warping detached one-hots builds
      no graph back to the seg net).  Exact anatomy *value* on the C=1
      matched-warp kernel (pallas/anatomy.py::hard_anatomy_dice),
      supervised-only backwards; the dense C = n_class probability
      warp + splat never runs (~92%% of the phase at MB101 size, BENCH_r02).
    * **moving hard, fixed soft** — the warp input is the constant one-hot:
      ONE dense warp *forward* (no values-VJP/splat); the anatomy gradient
      reaches the seg net only through the fixed branch, elementwise.
    * **fixed hard, moving soft** — the adjoint identity
      ``<warp(m_probs), onehot_f> = <m_probs, splat(onehot_f)>``
      (ops/warp.py::warp_values_adjoint) moves the dense op onto the
      constant side: ONE dense splat, elementwise anatomy gradient, no
      warp at all in the differentiated graph.
    * **neither all-hard** (mixed/unlabeled batches) — the general soft
      path below.

    Requires ``max_disp`` and is only exact when ``warp_fn`` clamps
    displacements the same way (the Pallas warp's ``bound_mode='clamp'``).
    The fully-labeled joint recipe (all MB101-21 volumes labeled) runs the
    both-hard branch every iteration; the semi-supervised recipes (few
    labeled volumes, the paper's headline setting) run the one-sided
    branches for most pairs.

    Signature: (seg_state, reg_state, moving, fixed, moving_seg, fixed_seg,
    moving_has_label, fixed_has_label) -> (seg_state, metrics)
    """
    if hard_fused and max_disp is None:
        raise ValueError("hard_fused requires max_disp (the fused anatomy "
                         "value runs on the displacement-bounded Pallas "
                         "kernels)")
    # one-hot cotangents (the f-hard adjoint splat) want the splat's
    # per-trip mass skip that dense soft-path cotangents should not pay
    # for — callers pass a ct_sparse=True variant here when warp_fn
    # carries ct_sparse=False (pallas/splat.py)
    adjoint_warp_fn = adjoint_warp_fn or warp_fn
    if checkpoint_apply:
        def apply_model(state, params, images, train):
            f = jax.checkpoint(
                lambda p, x: _apply_model(state, p, x, train),
                policy=jax.checkpoint_policies.nothing_saveable)
            return f(params, images)
    else:
        apply_model = _apply_model

    def _soft_dice(warped_m, f_probs):
        inter = jnp.sum(warped_m[..., 1:] * f_probs[..., 1:],
                        axis=(1, 2, 3), dtype=jnp.float32)
        denom = jnp.sum(warped_m[..., 1:], axis=(1, 2, 3),
                        dtype=jnp.float32) + \
            jnp.sum(f_probs[..., 1:], axis=(1, 2, 3), dtype=jnp.float32)
        return 1.0 - jnp.mean(2.0 * inter / (denom + 1e-5))

    @partial(jax.jit, donate_argnums=(0,))
    def step_two_pass(seg_state: TrainState, reg_state: TrainState, moving,
                      fixed, moving_seg, fixed_seg, moving_has_label,
                      fixed_has_label):
        adt = anatomy_dtype or jnp.float32
        disp, warped, deform = reg_state.apply_fn(
            {"params": reg_state.params}, moving, fixed, train=False)
        deform = jax.lax.stop_gradient(deform)

        onehot_m = one_hot(moving_seg.astype(jnp.int32), n_class, dtype=adt)
        onehot_f = one_hot(fixed_seg.astype(jnp.int32), n_class, dtype=adt)
        any_m = jnp.any(moving_has_label).astype(jnp.float32)
        any_f = jnp.any(fixed_has_label).astype(jnp.float32)
        sup_norm = jnp.maximum(any_m + any_f, 1.0)

        def branch_probs(logits, has_label, onehot):
            probs = jax.nn.softmax(logits.astype(jnp.float32),
                                   axis=-1).astype(adt)
            return jnp.where(has_label[:, None, None, None, None], onehot,
                             probs)

        def soft_branch(_):
            # ---- fixed-branch forward ONCE via jax.vjp: its VALUE feeds
            # pass A's constant f_probs (train=True batch-stat
            # normalization makes the logits independent of the running
            # stats), and its PULLBACK closes pass B's backward without a
            # second fixed forward — 2 forwards + 2 backwards total where
            # the naive split pays 3 + 2 (round-2 VERDICT weak #4).  The
            # residuals stay live through pass A (~1 branch of
            # activations); the barrier still sequences the backwards.
            (f_logits, new_bn_f), pull_f = jax.vjp(
                lambda p: apply_model(seg_state, p, fixed, train=True),
                seg_state.params)
            f_probs_const = jax.lax.stop_gradient(
                branch_probs(f_logits, fixed_has_label, onehot_f))

            def loss_a(params):
                logits_m, new_bn = apply_model(seg_state, params, moving,
                                               train=True)
                m_probs = branch_probs(logits_m, moving_has_label, onehot_m)
                warped_m = warp_fn(m_probs, deform)
                anat = _soft_dice(warped_m, f_probs_const)
                sup_m = supervised_loss(logits_m.astype(jnp.float32),
                                        moving_seg.astype(jnp.int32))
                loss = anatomy_weight * anat \
                    + supervised_weight * sup_m * any_m / sup_norm
                return loss, (new_bn, anat, sup_m, warped_m)

            (_, (new_bn, anat, sup_m, warped_m)), grads_a = \
                jax.value_and_grad(loss_a, has_aux=True)(seg_state.params)

            grads_a, warped_const = jax.lax.optimization_barrier(
                (grads_a, jax.lax.stop_gradient(warped_m)))

            # ---- pass B head: an elementwise function of the SAME
            # f_logits value the vjp forward produced; its logits-cotangent
            # drives the saved pullback (one fixed-branch backward)
            def head_b(logits_f):
                f_probs = branch_probs(logits_f, fixed_has_label, onehot_f)
                anat_b = _soft_dice(warped_const, f_probs)
                sup_f = supervised_loss(logits_f.astype(jnp.float32),
                                        fixed_seg.astype(jnp.int32))
                loss = anatomy_weight * anat_b \
                    + supervised_weight * sup_f * any_f / sup_norm
                return loss, sup_f

            (_, sup_f), ct_logits = jax.value_and_grad(
                head_b, has_aux=True)(f_logits)
            grads_b, = pull_f((ct_logits,
                               jax.tree_util.tree_map(jnp.zeros_like,
                                                      new_bn_f)))

            # BatchNorm running stats: the vjp forward updated against the
            # ORIGINAL stats; flax's update is linear (ra' = m*ra +
            # (1-m)*batch, layers.py momentum=0.9), so compose to the
            # sequential moving-then-fixed order in closed form:
            #   wanted = m*new_bn_moving + (1-m)*batch_f
            #          = m*new_bn_moving + (new_bn_f - m*orig)
            new_bn2 = jax.tree_util.tree_map(
                lambda bm, bf, o: _BN_MOMENTUM * bm + bf - _BN_MOMENTUM * o,
                new_bn, new_bn_f, seg_state.batch_stats)

            grads = jax.tree_util.tree_map(jnp.add, grads_a, grads_b)
            return grads, new_bn2, anat, sup_m, sup_f

        def hard_branch(_):
            # Both anatomies are ground-truth one-hots: zero anatomy
            # gradient w.r.t. the seg params.  Exact anatomy value on the
            # C=1 matched-warp kernel; supervised-only backwards (same BN
            # sequencing moving-then-fixed as the soft branch).
            from ..pallas.anatomy import hard_anatomy_dice
            anat = hard_anatomy_dice(
                moving_seg.astype(jnp.int32), fixed_seg.astype(jnp.int32),
                deform, n_class, max_disp=max_disp,
                **(anatomy_kwargs or {}))

            def loss_a(params):
                logits_m, new_bn = apply_model(seg_state, params, moving,
                                               train=True)
                sup_m = supervised_loss(logits_m.astype(jnp.float32),
                                        moving_seg.astype(jnp.int32))
                return supervised_weight * sup_m * any_m / sup_norm, \
                    (new_bn, sup_m)

            (_, (new_bn, sup_m)), grads_a = jax.value_and_grad(
                loss_a, has_aux=True)(seg_state.params)
            grads_a = jax.lax.optimization_barrier(grads_a)

            def loss_b(params):
                logits_f, new_bn2 = apply_model(
                    seg_state.replace(batch_stats=new_bn), params, fixed,
                    train=True)
                sup_f = supervised_loss(logits_f.astype(jnp.float32),
                                        fixed_seg.astype(jnp.int32))
                return supervised_weight * sup_f * any_f / sup_norm, \
                    (new_bn2, sup_f)

            (_, (new_bn2, sup_f)), grads_b = jax.value_and_grad(
                loss_b, has_aux=True)(seg_state.params)
            grads = jax.tree_util.tree_map(jnp.add, grads_a, grads_b)
            return grads, new_bn2, anat, sup_m, sup_f

        def m_hard_branch(_):
            # Moving side fully labeled (fixed not): the warp input is the
            # constant one-hot, so the anatomy is a plain function of the
            # FIXED probabilities against a constant warped volume — dense
            # warp FORWARD only, no values-VJP/splat kernel at all.  Pass A
            # is supervised-only (the anatomy reads no moving logits).
            warped_const = jax.lax.stop_gradient(
                warp_fn(onehot_m, deform))

            def loss_a(params):
                logits_m, new_bn = apply_model(seg_state, params, moving,
                                               train=True)
                sup_m = supervised_loss(logits_m.astype(jnp.float32),
                                        moving_seg.astype(jnp.int32))
                return supervised_weight * sup_m * any_m / sup_norm, \
                    (new_bn, sup_m)

            (_, (new_bn, sup_m)), grads_a = jax.value_and_grad(
                loss_a, has_aux=True)(seg_state.params)
            grads_a = jax.lax.optimization_barrier(grads_a)

            def loss_b(params):
                logits_f, new_bn2 = apply_model(
                    seg_state.replace(batch_stats=new_bn), params, fixed,
                    train=True)
                f_probs = branch_probs(logits_f, fixed_has_label, onehot_f)
                anat_b = _soft_dice(warped_const, f_probs)
                sup_f = supervised_loss(logits_f.astype(jnp.float32),
                                        fixed_seg.astype(jnp.int32))
                loss = anatomy_weight * anat_b \
                    + supervised_weight * sup_f * any_f / sup_norm
                return loss, (new_bn2, anat_b, sup_f)

            (_, (new_bn2, anat, sup_f)), grads_b = jax.value_and_grad(
                loss_b, has_aux=True)(seg_state.params)
            grads = jax.tree_util.tree_map(jnp.add, grads_a, grads_b)
            return grads, new_bn2, anat, sup_m, sup_f

        def f_hard_branch(_):
            # Fixed side fully labeled (moving not): the anatomy touches the
            # seg net only through the MOVING probabilities, so move the
            # dense op onto the constant side with the adjoint identity
            #   <warp(m_probs)_c, onehot_f_c> = <m_probs_c, splat(onehot_f)_c>
            # (ops/warp.py::warp_values_adjoint).  ONE dense splat of a
            # constant; the anatomy gradient w.r.t. m_probs is elementwise —
            # neither the warp forward nor its VJP runs.  splat(ones) for
            # the warped-mass denominator is the free channel-sum of the
            # one-hot splat.
            from ..ops.warp import warp_values_adjoint
            S = jax.lax.stop_gradient(warp_values_adjoint(
                adjoint_warp_fn, onehot_f.astype(jnp.float32), deform))
            w_all = jnp.sum(S, axis=-1)            # splat(ones), (B,D,H,W)
            den_f = jnp.sum(onehot_f[..., 1:], axis=(1, 2, 3),
                            dtype=jnp.float32)

            def loss_a(params):
                logits_m, new_bn = apply_model(seg_state, params, moving,
                                               train=True)
                m_probs = branch_probs(logits_m, moving_has_label,
                                       onehot_m).astype(jnp.float32)
                inter = jnp.sum(m_probs[..., 1:] * S[..., 1:],
                                axis=(1, 2, 3), dtype=jnp.float32)
                den_m = jnp.sum(m_probs[..., 1:] * w_all[..., None],
                                axis=(1, 2, 3), dtype=jnp.float32)
                anat = 1.0 - jnp.mean(2.0 * inter / (den_m + den_f + 1e-5))
                sup_m = supervised_loss(logits_m.astype(jnp.float32),
                                        moving_seg.astype(jnp.int32))
                loss = anatomy_weight * anat \
                    + supervised_weight * sup_m * any_m / sup_norm
                return loss, (new_bn, anat, sup_m)

            (_, (new_bn, anat, sup_m)), grads_a = jax.value_and_grad(
                loss_a, has_aux=True)(seg_state.params)
            grads_a = jax.lax.optimization_barrier(grads_a)

            def loss_b(params):
                logits_f, new_bn2 = apply_model(
                    seg_state.replace(batch_stats=new_bn), params, fixed,
                    train=True)
                sup_f = supervised_loss(logits_f.astype(jnp.float32),
                                        fixed_seg.astype(jnp.int32))
                return supervised_weight * sup_f * any_f / sup_norm, \
                    (new_bn2, sup_f)

            (_, (new_bn2, sup_f)), grads_b = jax.value_and_grad(
                loss_b, has_aux=True)(seg_state.params)
            grads = jax.tree_util.tree_map(jnp.add, grads_a, grads_b)
            return grads, new_bn2, anat, sup_m, sup_f

        if hard_fused:
            am = jnp.all(moving_has_label).astype(jnp.int32)
            af = jnp.all(fixed_has_label).astype(jnp.int32)
            grads, new_bn2, anat, sup_m, sup_f = jax.lax.switch(
                am * 2 + af,
                [soft_branch, f_hard_branch, m_hard_branch, hard_branch],
                None)
        else:
            grads, new_bn2, anat, sup_m, sup_f = soft_branch(None)

        sup = (sup_m * any_m + sup_f * any_f) / sup_norm
        loss = anatomy_weight * anat + supervised_weight * sup
        seg_state = seg_state.apply_gradients(grads, new_bn2)
        return seg_state, {"loss": loss, "anatomy": anat, "supervised": sup}

    if two_pass:
        return step_two_pass

    # single-pass variant (both branches in one backward graph)
    @partial(jax.jit, donate_argnums=(0,))
    def step(seg_state: TrainState, reg_state: TrainState, moving, fixed,
             moving_seg, fixed_seg, moving_has_label, fixed_has_label):
        # frozen reg-net deformation
        disp, warped, deform = reg_state.apply_fn(
            {"params": reg_state.params}, moving, fixed, train=False)
        deform = jax.lax.stop_gradient(deform)

        def loss_fn(params):
            logits_m, new_bn = apply_model(seg_state, params, moving,
                                           train=True)
            logits_f, new_bn2 = apply_model(
                seg_state.replace(batch_stats=new_bn), params, fixed,
                train=True)
            adt = anatomy_dtype or jnp.float32
            probs_m = jax.nn.softmax(logits_m.astype(jnp.float32),
                                     axis=-1).astype(adt)
            probs_f = jax.nn.softmax(logits_f.astype(jnp.float32),
                                     axis=-1).astype(adt)

            # anatomy: moving anatomy (GT one-hot or predicted probs) warped
            # onto fixed anatomy (GT labels or predicted probs)
            onehot_m = one_hot(moving_seg.astype(jnp.int32), n_class,
                               dtype=adt)
            m_probs = jnp.where(
                moving_has_label[:, None, None, None, None], onehot_m,
                probs_m)
            warped_m = warp_fn(m_probs, deform)
            onehot_f = one_hot(fixed_seg.astype(jnp.int32), n_class,
                               dtype=adt)
            f_probs = jnp.where(
                fixed_has_label[:, None, None, None, None], onehot_f,
                probs_f)
            # soft-soft dice over foreground classes (f32 accumulation)
            inter = jnp.sum(warped_m[..., 1:] * f_probs[..., 1:],
                            axis=(1, 2, 3), dtype=jnp.float32)
            denom = jnp.sum(warped_m[..., 1:], axis=(1, 2, 3),
                            dtype=jnp.float32) + \
                jnp.sum(f_probs[..., 1:], axis=(1, 2, 3), dtype=jnp.float32)
            anat = 1.0 - jnp.mean(2.0 * inter / (denom + 1e-5))

            # supervised loss on whichever volumes have labels
            sup_m = supervised_loss(logits_m.astype(jnp.float32),
                                    moving_seg.astype(jnp.int32))
            sup_f = supervised_loss(logits_f.astype(jnp.float32),
                                    fixed_seg.astype(jnp.int32))
            any_m = jnp.any(moving_has_label).astype(jnp.float32)
            any_f = jnp.any(fixed_has_label).astype(jnp.float32)
            sup = (sup_m * any_m + sup_f * any_f) / jnp.maximum(
                any_m + any_f, 1.0)

            loss = anatomy_weight * anat + supervised_weight * sup
            return loss, (new_bn2, anat, sup)

        (loss, (new_bn, anat, sup)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(seg_state.params)
        seg_state = seg_state.apply_gradients(grads, new_bn)
        return seg_state, {"loss": loss, "anatomy": anat, "supervised": sup}

    return step
