"""Spatial (depth-sharded) parallelism: one volume across a mesh axis.

Shards the volume's D axis over devices so whole-volume training scales
past one chip's HBM — the TPU-native alternative to the reference's only
memory lever, border cropping + patch training (lib/transforms.py:124-158,
322-494), which trades away whole-volume context.  Mechanics:

  * convolutions read neighbour boundary planes via halo exchange
    (ops/halo.py::halo_exchange_d, ``ppermute`` over ICI) and pad D VALID —
    numerically the unsharded SAME conv (models/layers.py spatial_axis);
  * max-pool, kernel==stride deconvs and the 1x1x1 head are shard-local;
  * BatchNorm moments and the dice loss's per-(batch, class) sums psum
    over the axis (losses/dice.py axis_name), so loss, gradients and BN
    statistics are exactly the single-device values;
  * per-shard gradient partials combine with pmean after the backward
    (see the in-code note on psum's transpose under check_vma=False).

Constraints (checked at trace time): the PER-SHARD depth must satisfy the
U-Net's divisibility rule (D divisible by n_shards * 2^(levels-1)) and
stay >= 1 plane at the deepest level; upsamplers must be deconvs (kernel
== stride, shard-local).  Composes with data parallelism on an
(data, space) mesh: batch shards over ``data``, depth over ``space`` —
``make_spatial_seg_step`` accepts any mesh containing the named spatial
axis and psums metrics over both axes.

The U-Net may run either conv path: XLA (``packed=False``) or the
lane-packed Pallas tier (``packed=True``, models/packed.py) — the packed
layout keeps D as a plain array axis, so each packed conv halo-exchanges
one plane and slices the interior of the kernel's implicit zero-padded
output, and PackedBatchNorm psums its moments over the axis.  Depth
shards are just smaller volumes; the perf tier is not forfeited when the
volume outgrows a chip.  (VoxelMorph trunks stay XLA under spatial
sharding: the packed stride-2 path is not halo-composed yet.)
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.steps import TrainState, _apply_model
from .collectives import maybe_shard_map, pmean_tree, psum_tree


def shard_volume_batch(batch, mesh: Mesh, axis: str = "space",
                       data_axis: str | None = None):
    """Device-put arrays with D sharded over ``axis`` (and optionally batch
    over ``data_axis``).  Works for (B, D, H, W[, C]) arrays."""
    if mesh.size == 1:
        # degenerate mesh: plain uncommitted put.  Committing a
        # NamedSharding forces jit to compile SPMD-partitioned modules,
        # which the axon TPU client executes pathologically slowly
        # (PERF.md round-5, tools/probe_spatial_inputs.py); at size 1 the
        # sharding carries no information anyway.
        return jax.tree_util.tree_map(jax.device_put, batch)

    def put(x):
        spec = [None] * x.ndim
        spec[1] = axis
        if data_axis is not None:
            spec[0] = data_axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree_util.tree_map(put, batch)


def _spatial_model(model, axis: str):
    """The same flax module with ``spatial_axis`` set (dataclass replace)."""
    if getattr(model, "spatial_axis", "missing") == "missing":
        raise ValueError(
            f"{type(model).__name__} has no spatial_axis support; spatial "
            f"sharding currently covers UNetTemplate-family models")
    return dataclasses.replace(model, spatial_axis=axis)


def make_spatial_seg_step(model, criterion_factory: Callable, n_class: int,
                          mesh: Mesh, axis: str = "space",
                          data_axis: str | None = None,
                          criterion_kwargs: dict | None = None):
    """Jitted supervised seg train step on depth-sharded volumes.

    Args:
      model: a ``UNetTemplate``-family module (XLA or packed conv path).
      criterion_factory: ``get_loss_function("dice")``-style factory taking
        keyword args incl. ``axis_name`` (losses/__init__.py).
      mesh: mesh containing ``axis`` (and ``data_axis`` if given).
      data_axis: optional batch-sharding axis for DP x SP execution.

    Returns ``step(state, images, labels) -> (state, loss, logits)`` with
    ``images (B, D, H, W, C)`` / ``labels (B, D, H, W)`` sharded by
    ``shard_volume_batch``; semantics match train/steps.py's
    ``make_seg_train_step`` exactly (loss, grads, BN stats).
    """
    kw = dict(criterion_kwargs or {})
    # the spatial axis reduces the per-(batch, class) SUMS; the data axis
    # (different batch elements per shard) reduces only the final weighted
    # score combination + the weight normalizer (losses/dice.py)
    loss_axes = (axis,) if data_axis is None else (axis, data_axis)
    criterion = criterion_factory(n_class=n_class, axis_name=axis,
                                  batch_axis_name=data_axis, **kw)
    sp_model = _spatial_model(model, axis)

    vol_spec = (P(None, axis) if data_axis is None
                else P(data_axis, axis))
    state_spec = P()  # params/opt replicated

    def _local_step(state: TrainState, images, labels):
        def loss_fn(params):
            st = state.replace(apply_fn=sp_model.apply)
            logits, new_bn = _apply_model(st, params, images, train=True)
            loss = criterion(logits.astype(jnp.float32), labels)
            return loss, (new_bn, logits)

        (loss, (new_bn, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # combining the per-shard partials: under shard_map WITHOUT
        # replication tracking (check_vma=False) the transpose of the
        # loss's psum is another psum, so every shard's backward already
        # carries an n-fold cotangent — the per-shard grads sum to
        # n * grad, and pmean (NOT psum) recovers the exact single-device
        # gradient (verified leaf-for-leaf in tests/test_spatial.py).
        # BN stats come out identical on every shard (flax axis_name
        # moment reduction) — no extra handling.  pmean_tree: one bucketed
        # all-reduce for the whole grad tree, none at all at mesh-of-1.
        grads = pmean_tree(grads, loss_axes)
        state = state.apply_gradients(grads, new_bn)
        return state, loss, logits

    sharded = maybe_shard_map(
        _local_step, mesh,
        in_specs=(state_spec, vol_spec, vol_spec),
        out_specs=(state_spec, P(), vol_spec), axis_names=loss_axes)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, images, labels):
        return sharded(state, images, labels)

    return step


def make_spatial_reg_step(model, sim_factory: Callable,
                          reg_factory: Callable, reg_weight: float,
                          mesh: Mesh, axis: str = "space",
                          data_axis: str | None = None,
                          sim_kwargs: dict | None = None,
                          reg_kwargs: dict | None = None):
    """Jitted registration train step on depth-sharded volume pairs.

    ``model`` is a ``VoxelMorphCVPR2018`` (XLA trunk); the step mirrors
    train/reg_steps.py::make_reg_train_step: LNCC similarity on the
    halo-exchanged spatial warp output + bending/gradient regularizer on
    the displacement field, both computed with their ``axis_name`` spatial
    reductions (losses/similarity.py, losses/regularizers.py) so the
    sharded loss and gradients equal the single-device clamp-bounded step.

    ``data_axis``: optional batch-sharding axis for DP x SP execution on a
    2-D ``(data, space)`` mesh — both losses are means over equal-size
    local batches, so the global loss/metrics are their ``pmean`` over the
    data axis and the gradient pmean extends over both axes.
    """
    sim_loss = sim_factory(axis_name=axis, **(sim_kwargs or {}))
    reg_loss = reg_factory(axis_name=axis, **(reg_kwargs or {}))
    sp_model = _spatial_model(model, axis)
    vol_spec = (P(None, axis) if data_axis is None
                else P(data_axis, axis))
    loss_axes = (axis,) if data_axis is None else (axis, data_axis)

    def _local_step(state: TrainState, moving, fixed):
        def loss_fn(params):
            disp, warped, deform = sp_model.apply({"params": params},
                                                  moving, fixed, train=True)
            sim = sim_loss(warped.astype(jnp.float32),
                           fixed.astype(jnp.float32))
            reg = reg_loss(disp.astype(jnp.float32))
            return sim + reg_weight * reg, (sim, reg)

        (loss, (sim, reg)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # pmean, not psum: see make_spatial_seg_step on psum's transpose
        grads = pmean_tree(grads, loss_axes)
        state = state.apply_gradients(grads)
        metrics = {"loss": loss, "sim": sim, "reg": reg}
        if data_axis is not None:
            metrics = pmean_tree(metrics, data_axis)
        return state, metrics

    sharded = maybe_shard_map(
        _local_step, mesh,
        in_specs=(P(), vol_spec, vol_spec),
        out_specs=(P(), P()), axis_names=loss_axes)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, moving, fixed):
        return sharded(state, moving, fixed)

    return step


def _spatial_soft_dice(src_probs, tgt_probs, axis: str,
                       eps: float = 1e-5) -> jnp.ndarray:
    """The joint anatomy soft dice (train/reg_steps.py::_soft_dice) with
    its per-(batch, class) sums psum'd over the depth shards — foreground
    channels only, f32 accumulation, identical value on every shard."""
    inter = jnp.sum(src_probs[..., 1:] * tgt_probs[..., 1:], axis=(1, 2, 3),
                    dtype=jnp.float32)
    den = jnp.sum(src_probs[..., 1:], axis=(1, 2, 3), dtype=jnp.float32) + \
        jnp.sum(tgt_probs[..., 1:], axis=(1, 2, 3), dtype=jnp.float32)
    inter, den = psum_tree((inter, den), axis)
    return 1.0 - jnp.mean(2.0 * inter / (den + eps))


def _shard_overflow(deform, max_disp: int, axis: str) -> jnp.ndarray:
    """ops.warp.displacement_overflow for a depth-sharded deformation: the
    identity is the global one sliced per shard, the fraction pmeans over
    equal-size shards."""
    from ..ops.halo import shard_identity_grid
    b, d_loc, h, w = deform.shape[:4]
    disp = deform.astype(jnp.float32) - shard_identity_grid(deform.shape,
                                                            axis)
    n = jax.lax.axis_size(axis)
    scale = jnp.array([(w - 1) / 2.0, (h - 1) / 2.0, (d_loc * n - 1) / 2.0],
                      jnp.float32)
    over = jnp.any(jnp.abs(disp) * scale > max_disp, axis=-1)
    return jax.lax.pmean(jnp.mean(over.astype(jnp.float32)), axis)


def make_spatial_joint_steps(seg_model, reg_model, sim_factory: Callable,
                             reg_factory: Callable,
                             supervised_factory: Callable, n_class: int,
                             reg_weight: float, anatomy_weight: float,
                             supervised_weight: float, mesh: Mesh,
                             axis: str = "space", max_disp: int = 8,
                             sim_kwargs: dict | None = None,
                             reg_kwargs: dict | None = None,
                             supervised_kwargs: dict | None = None):
    """Depth-sharded joint DeepAtlas steps: ``(joint_reg_step,
    joint_seg_step)`` mirroring train/reg_steps.py's
    ``make_joint_reg_step`` / ``make_joint_seg_step`` (soft path) on a
    spatial mesh axis — whole-volume semi-supervised joint training past
    one chip's HBM.

    Both steps run the XLA trunks (``packed=False``) with the halo'ed
    spatial warp (ops/halo.py::spatial_grid_sample, clamp-bounded at
    ``max_disp`` like the single-device Pallas path); anatomy dice sums,
    LNCC/bending reductions, supervised dice sums and BatchNorm moments
    all reduce over ``axis``, so losses/gradients/BN stats equal the
    single-device soft-path steps (pinned in tests/test_spatial.py).

    Signatures match the single-device steps:
      joint_reg_step(reg_state, seg_state, moving, fixed, moving_seg,
                     fixed_seg, moving_has_label, fixed_has_label)
      joint_seg_step(seg_state, reg_state, ...same...)
    with volumes depth-sharded by ``shard_volume_batch`` and label flags
    replicated ``(B,)`` bools.
    """
    from ..ops import one_hot
    from ..ops.halo import spatial_grid_sample

    sim_loss = sim_factory(axis_name=axis, **(sim_kwargs or {}))
    reg_loss = reg_factory(axis_name=axis, **(reg_kwargs or {}))
    supervised = supervised_factory(n_class=n_class, axis_name=axis,
                                    **(supervised_kwargs or {}))
    sp_seg = _spatial_model(seg_model, axis)
    sp_reg = _spatial_model(reg_model, axis)
    vol_spec = P(None, axis)

    def _labels(seg_state, moving, fixed, moving_seg, fixed_seg, m_has,
                f_has):
        """Frozen-seg-net label substitution (reg phase): ground truth
        where it exists, the argmax prediction elsewhere."""
        st = seg_state.replace(apply_fn=sp_seg.apply)
        logits_m, _ = _apply_model(st, seg_state.params, moving, train=False)
        logits_f, _ = _apply_model(st, seg_state.params, fixed, train=False)
        lab_m = jnp.where(m_has[:, None, None, None],
                          moving_seg.astype(jnp.int32),
                          jnp.argmax(logits_m, axis=-1).astype(jnp.int32))
        lab_f = jnp.where(f_has[:, None, None, None],
                          fixed_seg.astype(jnp.int32),
                          jnp.argmax(logits_f, axis=-1).astype(jnp.int32))
        return lab_m, lab_f

    def _reg_local(reg_state, seg_state, moving, fixed, moving_seg,
                   fixed_seg, m_has, f_has):
        lab_m, lab_f = _labels(seg_state, moving, fixed, moving_seg,
                               fixed_seg, m_has, f_has)
        onehot_m = one_hot(lab_m, n_class, dtype=jnp.float32)
        onehot_f = one_hot(lab_f, n_class, dtype=jnp.float32)

        def loss_fn(params):
            disp, warped, deform = sp_reg.apply({"params": params}, moving,
                                                fixed, train=True)
            sim = sim_loss(warped.astype(jnp.float32),
                           fixed.astype(jnp.float32))
            reg = reg_loss(disp.astype(jnp.float32))
            warped_m = spatial_grid_sample(onehot_m, deform, axis,
                                           max_disp=max_disp)
            anat = _spatial_soft_dice(warped_m, onehot_f, axis)
            return sim + reg_weight * reg + anatomy_weight * anat, \
                (sim, reg, anat, deform)

        (loss, (sim, reg, anat, deform)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(reg_state.params)
        grads = pmean_tree(grads, axis)
        reg_state = reg_state.apply_gradients(grads)
        return reg_state, {
            "loss": loss, "sim": sim, "reg": reg, "anatomy": anat,
            "disp_overflow": _shard_overflow(
                jax.lax.stop_gradient(deform), max_disp, axis)}

    def _seg_local(seg_state, reg_state, moving, fixed, moving_seg,
                   fixed_seg, m_has, f_has):
        disp, warped, deform = sp_reg.apply({"params": reg_state.params},
                                            moving, fixed, train=False)
        deform = jax.lax.stop_gradient(deform)
        onehot_m = one_hot(moving_seg.astype(jnp.int32), n_class,
                           dtype=jnp.float32)
        onehot_f = one_hot(fixed_seg.astype(jnp.int32), n_class,
                           dtype=jnp.float32)
        any_m = jnp.any(m_has).astype(jnp.float32)
        any_f = jnp.any(f_has).astype(jnp.float32)
        sup_norm = jnp.maximum(any_m + any_f, 1.0)
        st = seg_state.replace(apply_fn=sp_seg.apply)

        def loss_fn(params):
            logits_m, new_bn = _apply_model(st, params, moving, train=True)
            logits_f, new_bn2 = _apply_model(
                st.replace(batch_stats=new_bn), params, fixed, train=True)
            m_probs = jnp.where(
                m_has[:, None, None, None, None], onehot_m,
                jax.nn.softmax(logits_m.astype(jnp.float32), axis=-1))
            f_probs = jnp.where(
                f_has[:, None, None, None, None], onehot_f,
                jax.nn.softmax(logits_f.astype(jnp.float32), axis=-1))
            warped_m = spatial_grid_sample(m_probs, deform, axis,
                                           max_disp=max_disp)
            anat = _spatial_soft_dice(warped_m, f_probs, axis)
            sup_m = supervised(logits_m.astype(jnp.float32),
                               moving_seg.astype(jnp.int32))
            sup_f = supervised(logits_f.astype(jnp.float32),
                               fixed_seg.astype(jnp.int32))
            sup = (sup_m * any_m + sup_f * any_f) / sup_norm
            return anatomy_weight * anat + supervised_weight * sup, \
                (new_bn2, anat, sup)

        (loss, (new_bn, anat, sup)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(seg_state.params)
        grads = pmean_tree(grads, axis)
        seg_state = seg_state.apply_gradients(grads, new_bn)
        return seg_state, {"loss": loss, "anatomy": anat, "supervised": sup}

    flag_spec = P()
    reg_sharded = maybe_shard_map(
        _reg_local, mesh,
        in_specs=(P(), P(), vol_spec, vol_spec, vol_spec, vol_spec,
                  flag_spec, flag_spec),
        out_specs=(P(), P()), axis_names=(axis,))
    seg_sharded = maybe_shard_map(
        _seg_local, mesh,
        in_specs=(P(), P(), vol_spec, vol_spec, vol_spec, vol_spec,
                  flag_spec, flag_spec),
        out_specs=(P(), P()), axis_names=(axis,))

    @partial(jax.jit, donate_argnums=(0,))
    def joint_reg_step(reg_state, seg_state, moving, fixed, moving_seg,
                       fixed_seg, moving_has_label, fixed_has_label):
        return reg_sharded(reg_state, seg_state, moving, fixed, moving_seg,
                           fixed_seg, moving_has_label, fixed_has_label)

    @partial(jax.jit, donate_argnums=(0,))
    def joint_seg_step(seg_state, reg_state, moving, fixed, moving_seg,
                       fixed_seg, moving_has_label, fixed_has_label):
        return seg_sharded(seg_state, reg_state, moving, fixed, moving_seg,
                           fixed_seg, moving_has_label, fixed_has_label)

    return joint_reg_step, joint_seg_step


def make_spatial_seg_eval_step(model, n_class: int, mesh: Mesh,
                               axis: str = "space"):
    """Jitted depth-sharded eval step: ``(state, images, labels) ->
    (per_class_dice, logits)`` matching train/steps.py's
    ``make_seg_eval_step`` — the per-class confusion counts are additive
    over voxels, so local counts psum over the shards and the dice is the
    single-device value."""
    from ..metrics.confusion import confusion_matrix, dice_from_confusion

    sp_model = _spatial_model(model, axis)
    vol_spec = P(None, axis)

    def _eval(state: TrainState, images, labels):
        st = state.replace(apply_fn=sp_model.apply)
        logits, _ = _apply_model(st, state.params, images, train=False)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        cms = jax.vmap(
            lambda p, t: confusion_matrix(p, t, n_class))(
                preds, labels.astype(jnp.int32))
        cms = jax.lax.psum(cms, axis)
        dice = jax.vmap(lambda cm: dice_from_confusion(cm, 1e-11)[1:])(cms)
        return dice, logits

    sharded = maybe_shard_map(_eval, mesh,
                              in_specs=(P(), vol_spec, vol_spec),
                              out_specs=(P(), vol_spec), axis_names=(axis,))
    return jax.jit(sharded)


def make_spatial_seg_forward(model, mesh: Mesh, axis: str = "space",
                             data_axis: str | None = None):
    """Jitted depth-sharded inference forward: ``(state, images) -> logits``
    (logits come back as a global array sharded like the input)."""
    sp_model = _spatial_model(model, axis)
    vol_spec = (P(None, axis) if data_axis is None
                else P(data_axis, axis))

    def _fwd(state: TrainState, images):
        st = state.replace(apply_fn=sp_model.apply)
        logits, _ = _apply_model(st, state.params, images, train=False)
        return logits

    axes = (axis,) if data_axis is None else (axis, data_axis)
    sharded = maybe_shard_map(_fwd, mesh, in_specs=(P(), vol_spec),
                              out_specs=vol_spec, axis_names=axes)
    return jax.jit(sharded)
