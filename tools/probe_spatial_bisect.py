"""Bisect the spatial mesh-of-1 BACKWARD blowup (r5 probe: the compiled
step has ZERO collectives after trace-time size-1 skips, forward under
shard_map is clean at 63 ms vs 60 ms plain, yet the full spatial seg step
runs 36.8 s vs 190 ms plain — the cost is in the backward's structure).

Times value_and_grad of a dice-free proxy loss (mean of squared logits —
removes the loss from the picture) at full MB101 size on four structural
variants, all on Mesh([dev0], ("space",)):

  A. packed model, spatial_axis="space" inside shard_map   (the slow one)
  B. packed model, spatial_axis=None INSIDE shard_map      (shard_map
     context, no halo pads/slices)                         -> if B fast
     and A slow, the halo structure is the problem; if B slow, shard_map
     context itself poisons the backward
  C. XLA-conv model (packed=False), spatial_axis="space"   -> if C fast,
     the packed kernels' VJP under the halo shapes are the problem; if C
     slow too, it is the halo/slice/pad graph
  D. packed model, plain jit (no shard_map)                (the 190 ms
     reference scaled to this proxy loss)

Each variant prints compile-excluded per-step ms (3 iters).  Run serialized
on the chip: python tools/probe_spatial_bisect.py [--skip A,B,...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P             # noqa: E402

try:                                                           # noqa: E402
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="",
                    help="comma-separated variant letters to skip")
    ap.add_argument("--size", type=int, nargs=3, default=[168, 200, 168])
    args = ap.parse_args()
    skip = set(args.skip.upper().replace(",", ""))

    import dataclasses

    from deepatlas_tpu.models import UNetLight

    d, h, w = args.size
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("space",))
    xi = jax.random.uniform(jax.random.PRNGKey(0), (1, d, h, w, 1),
                            jnp.float32)

    def mk_model(packed):
        return UNetLight(in_channel=1, n_classes=32, bias=True, BN=True,
                         dtype=jnp.bfloat16, packed=packed)

    def grad_fn(model):
        def loss2(params, bs, a):
            out, _ = model.apply({"params": params, "batch_stats": bs}, a,
                                 train=True, mutable=["batch_stats"])
            return jnp.mean(jnp.square(out.astype(jnp.float32)))

        def f(params, bs, a):
            l, g = jax.value_and_grad(loss2)(params, bs, a)
            # reduce grads to one scalar so the sync pulls 4 bytes
            return l + sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                           for x in jax.tree_util.tree_leaves(g))
        return f

    def timed(fn, *fargs, iters=3):
        out = fn(*fargs)
        np.asarray(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*fargs)
        np.asarray(out)
        return (time.time() - t0) / iters

    def run(tag, model, in_shardmap, spatial):
        m = dataclasses.replace(model, spatial_axis="space") if spatial \
            else model
        # init with the UNSHARDED twin: spatial_axis only adds halo pads,
        # the param/batch_stats tree is identical (axis names are unbound
        # outside shard_map)
        variables = jax.device_get(model.init(jax.random.PRNGKey(2), xi,
                                              train=False))
        f = grad_fn(m)
        if in_shardmap:
            g = jax.jit(shard_map(f, mesh=mesh, in_specs=(P(), P(), P()),
                                  out_specs=P(), check_vma=False))
        else:
            g = jax.jit(f)
        t0 = time.time()
        t = timed(g, jax.device_put(variables["params"]),
                  jax.device_put(variables.get("batch_stats", {})), xi)
        print(f"{tag}: {t * 1e3:10.1f} ms   (incl-compile wall "
              f"{time.time() - t0:.0f}s)", flush=True)

    if "A" not in skip:
        run("A packed spatial shard_map ", mk_model(True), True, True)
    if "B" not in skip:
        run("B packed plain-in-shard_map", mk_model(True), True, False)
    if "C" not in skip:
        run("C xla    spatial shard_map ", mk_model(False), True, True)
    if "D" not in skip:
        run("D packed plain jit         ", mk_model(True), False, False)


if __name__ == "__main__":
    main()
