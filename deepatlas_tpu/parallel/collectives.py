"""Bucketed collectives: one fused all-reduce per pytree.

``lax.pmean(tree, axis)`` emits one all-reduce per leaf; a train step's
gradient tree has ~50 leaves and the joint steps add BN-stat and metric
trees on top.  Each collective carries fixed launch latency, so many small
all-reduces waste ICI (and on this host's axon tunnel the per-collective
cost is large enough to show up at mesh-of-1: DP_ONCHIP_r04 measured a 17%
shard_map tax on the joint step).  ``pmean_tree`` ravels the tree into one
flat vector per dtype, reduces once, and unravels — the classic DP
gradient-bucketing pattern (the reference has no distributed layer at all;
SURVEY.md §2 statement).

At axis size 1 (a mesh-of-1, or the spatial tier run on one device) the
reduction is the identity and NO collective is emitted — sizes are static
under ``shard_map``, so this is a trace-time branch, not runtime control
flow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _axis_size(axis_name) -> int:
    if isinstance(axis_name, (tuple, list)):
        n = 1
        for a in axis_name:
            n *= lax.axis_size(a)
        return n
    return lax.axis_size(axis_name)


def _reduce_tree(tree, axis_name, mean: bool):
    n = _axis_size(axis_name)
    if n == 1:
        return tree
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    # group leaves by dtype so the concatenation never promotes
    groups: dict = {}
    for i, leaf in enumerate(leaves):
        groups.setdefault(jnp.asarray(leaf).dtype, []).append(i)
    out = list(leaves)
    for dtype, idxs in groups.items():
        flats = [jnp.ravel(leaves[i]) for i in idxs]
        sizes = [f.size for f in flats]
        merged = lax.psum(jnp.concatenate(flats), axis_name)
        if mean:
            merged = merged / n
        off = 0
        for i, sz in zip(idxs, sizes):
            out[i] = jnp.reshape(
                lax.dynamic_slice_in_dim(merged, off, sz), leaves[i].shape)
            off += sz
    return jax.tree_util.tree_unflatten(treedef, out)


def pmean_tree(tree, axis_name):
    """``lax.pmean`` over a whole pytree with ONE all-reduce per distinct
    leaf dtype (usually exactly one).  ``axis_name`` may be a name or a
    tuple of names.  Identity (and collective-free) when the total axis
    size is 1."""
    return _reduce_tree(tree, axis_name, mean=True)


def psum_tree(tree, axis_name):
    """``lax.psum`` analogue of :func:`pmean_tree`."""
    return _reduce_tree(tree, axis_name, mean=False)


def _bind1(f, axis_name: str):
    """Bind ``axis_name`` around ``f`` with a size-1 ``vmap`` (no mapped
    inputs): ``lax.psum``/``axis_size``/``axis_index``/``ppermute`` inside
    resolve against the trivial axis, so shard_map-local code runs
    unchanged — but the jitted program is a plain single-device module."""
    vm = jax.vmap(f, in_axes=None, out_axes=0, axis_size=1,
                  axis_name=axis_name)

    def g(*args):
        return jax.tree_util.tree_map(lambda x: x[0], vm(*args))

    return g


def maybe_shard_map(f, mesh, in_specs, out_specs, axis_names):
    """``shard_map`` — unless every mesh axis in ``axis_names`` has size 1,
    in which case the axes are bound with size-1 ``vmap``s instead.

    The degenerate-mesh specialization (round-5): a mesh-of-1 shard_map is
    semantically the identity, but jit compiles it as an SPMD-partitioned
    module, and under the axon TPU client SPMD executables materialize
    their non-aliased outputs through the host tunnel — measured 192.8 ms
    vs 34.7 s for the SAME full-size seg train step with and without SPMD
    partitioning (tools/probe_spatial_inputs.py, PERF.md round-5).  On any
    backend the degenerate case also skips SPMD compilation and partition
    bookkeeping outright.  The size-1 ``vmap`` binding runs the IDENTICAL
    local-step code (collectives become identities at trace time), so the
    multi-device and 1-device paths cannot drift; tests/test_spatial.py
    and tests/test_parallel.py pin both against the plain steps."""
    if isinstance(axis_names, str):
        axis_names = (axis_names,)
    n = 1
    for ax in axis_names:
        n *= mesh.shape[ax]
    if n > 1:
        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    g = f
    for ax in axis_names:
        g = _bind1(g, ax)
    return g
