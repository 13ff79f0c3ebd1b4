"""Spatial-tier overhead on one chip: mesh-of-1 depth-sharded seg step.

Round-3 VERDICT next #5 follow-through: with the packed Pallas convs now
halo-composed into the spatial tier (models/packed.py spatial_axis), this
measures what the shard_map wrapper + halo pads + psum no-ops cost at full
size when the mesh has ONE device — the overhead a user pays per shard
before ICI transfer time.  Compares:

  * plain jit packed seg train step (train/steps.py) — the BASELINE.md
    supervised seg step;
  * the same step through make_spatial_seg_step on Mesh([chip], ("space",))
    (halo_exchange_d short-circuits to jnp.pad at axis size 1).

Writes SPATIAL_ONCHIP_r04.json.  Run from the repo root on the chip:

    python tools/bench_spatial_onchip.py [--iters 5]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, iters):
    out = fn(*args)
    state = out[0]
    np.asarray(out[1])                     # sync (axon-safe)
    t0 = time.time()
    for _ in range(iters):
        out = fn(state, *args[1:])
        state = out[0]
    np.asarray(out[1])
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=3, default=[168, 200, 168])
    ap.add_argument("--n-classes", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--packed", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--out", default="SPATIAL_ONCHIP_r04.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from deepatlas_tpu.losses import get_loss_function
    from deepatlas_tpu.models import UNetLight
    from deepatlas_tpu.parallel import (make_spatial_seg_step,
                                        shard_volume_batch)
    from deepatlas_tpu.train.steps import (TrainState, make_optimizer,
                                           make_seg_train_step)

    d, h, w = args.size
    nc = args.n_classes
    model = UNetLight(in_channel=1, n_classes=nc, bias=True, BN=True,
                      dtype=jnp.bfloat16, packed=args.packed)
    key = jax.random.PRNGKey(230)
    x = jax.random.uniform(key, (1, d, h, w, 1), jnp.float32)
    labels = jax.random.randint(jax.random.fold_in(key, 1), (1, d, h, w),
                                0, nc, jnp.int32)
    # master copy on HOST: the train steps donate their state arg, which
    # deletes the device buffers — each fresh_state() re-puts fresh ones
    variables = jax.device_get(
        model.init(jax.random.fold_in(key, 2), x, train=False))

    def fresh_state():
        return TrainState.create(
            apply_fn=model.apply,
            params=jax.device_put(variables["params"]),
            batch_stats=jax.device_put(variables.get("batch_stats", {})),
            tx=make_optimizer(1e-3))

    factory = get_loss_function("dice")
    crit = factory(n_class=nc, weight_type="Uniform", softmax=True, eps=1e-6)

    plain = make_seg_train_step(crit)
    t_plain = timed(plain, (fresh_state(), x, labels), args.iters)
    print(f"plain jit seg step: {t_plain * 1e3:.1f} ms", flush=True)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("space",))
    sp_step = make_spatial_seg_step(
        model, factory, n_class=nc, mesh=mesh,
        criterion_kwargs=dict(weight_type="Uniform", softmax=True,
                              eps=1e-6))
    xs, ls = shard_volume_batch((x, labels), mesh)
    t_sp = timed(sp_step, (fresh_state(), xs, ls), args.iters)
    print(f"spatial mesh-of-1 seg step: {t_sp * 1e3:.1f} ms", flush=True)

    out = {
        "metric": "supervised seg train step, plain jit vs spatial "
                  f"mesh-of-1 ({d}x{h}x{w}, {nc} classes, "
                  f"packed={args.packed})",
        "plain_ms": round(t_plain * 1e3, 1),
        "spatial_1shard_ms": round(t_sp * 1e3, 1),
        "overhead_pct": round(100.0 * (t_sp / t_plain - 1.0), 1),
        "iters": args.iters,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
