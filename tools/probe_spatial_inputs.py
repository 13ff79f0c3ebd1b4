"""Pin the spatial mesh-of-1 blowup to INPUT SHARDING (r5 follow-up).

probe_spatial_overhead r5 run showed: compiled spatial step has ZERO
collectives, forwards under shard_map are clean (63 ms vs 60 ms), yet
ALL full train steps in that process ran 23-37 s — including the PLAIN
jit step, which benches at ~190 ms elsewhere.  The one variable the slow
cases share is inputs committed with
``NamedSharding(mesh, P(None, "space"))`` (shard_volume_batch); every
fast measurement fed uncommitted arrays.

Four cells, one process, full MB101 size, dice seg train step:

  1. plain   step x uncommitted inputs   (the 190 ms reference)
  2. plain   step x NamedSharding inputs (recompiles: arg shardings are
     part of the jit cache key)
  3. spatial step x uncommitted inputs   (shard_map auto-shards args)
  4. spatial step x NamedSharding inputs (the 36.8 s cell)

If 2 and 4 are slow while 1 and 3 are fast, committed input sharding —
not the spatial tier — is the defect, and the fix is in how arrays are
device_put (or an axon-client sharded-arg pathology to work around).

Run: python tools/probe_spatial_inputs.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
from jax.sharding import Mesh                                 # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(step, state, x, labels, iters=3):
    out = step(state, x, labels)
    np.asarray(out[1])
    st = out[0]
    t0 = time.time()
    for _ in range(iters):
        out = step(st, x, labels)
        st = out[0]
    np.asarray(out[1])
    return (time.time() - t0) / iters


def main():
    from deepatlas_tpu.losses import get_loss_function
    from deepatlas_tpu.models import UNetLight
    from deepatlas_tpu.parallel import (make_spatial_seg_step,
                                        shard_volume_batch)
    from deepatlas_tpu.train.steps import (TrainState, make_optimizer,
                                           make_seg_train_step)

    d, h, w, nc = 168, 200, 168, 32
    model = UNetLight(in_channel=1, n_classes=nc, bias=True, BN=True,
                      dtype=jnp.bfloat16, packed=True)
    key = jax.random.PRNGKey(230)
    x = jax.random.uniform(key, (1, d, h, w, 1), jnp.float32)
    labels = jax.random.randint(jax.random.fold_in(key, 1), (1, d, h, w),
                                0, nc, jnp.int32)
    variables = jax.device_get(
        model.init(jax.random.fold_in(key, 2), x, train=False))

    def fresh_state(apply_fn):
        return TrainState.create(
            apply_fn=apply_fn,
            params=jax.device_put(variables["params"]),
            batch_stats=jax.device_put(variables.get("batch_stats", {})),
            tx=make_optimizer(1e-3))

    factory = get_loss_function("dice")
    crit = factory(n_class=nc, weight_type="Uniform", softmax=True, eps=1e-6)
    plain = make_seg_train_step(crit)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("space",))
    sp_step = make_spatial_seg_step(
        model, factory, n_class=nc, mesh=mesh,
        criterion_kwargs=dict(weight_type="Uniform", softmax=True,
                              eps=1e-6))
    xs, ls = shard_volume_batch((x, labels), mesh)
    print(f"input shardings: x={x.sharding}, xs={xs.sharding}", flush=True)

    t = timed(plain, fresh_state(model.apply), x, labels)
    print(f"1 plain   x uncommitted:  {t * 1e3:10.1f} ms", flush=True)

    t = timed(plain, fresh_state(model.apply), xs, ls)
    print(f"2 plain   x NamedSharding:{t * 1e3:10.1f} ms", flush=True)

    t = timed(sp_step, fresh_state(model.apply), x, labels)
    print(f"3 spatial x uncommitted:  {t * 1e3:10.1f} ms", flush=True)

    t = timed(sp_step, fresh_state(model.apply), xs, ls)
    print(f"4 spatial x NamedSharding:{t * 1e3:10.1f} ms", flush=True)


if __name__ == "__main__":
    main()
