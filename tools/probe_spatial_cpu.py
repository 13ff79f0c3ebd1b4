"""CPU-mesh relative comparison for the spatial-step slowdown
(SPATIAL_ONCHIP_r04: 22.9 s spatial vs 189.8 ms plain, packed=True).

The chip probe (probe_spatial_overhead.py) needs the axon tunnel; this
script answers a narrower question locally: is the backward overhead
STRUCTURAL (shard_map / halo / psum transposes — would reproduce on any
backend) or TPU-lowering-specific (Mosaic/axon — would not)?  Runs the
plain jitted seg train step and the spatial mesh-of-1 seg step on a small
volume, XLA conv path (packed interpret mode on CPU is uniformly slow and
would mask the signal), and prints the fwd-only and full-step ratios.

Run: JAX_PLATFORMS=cpu python tools/probe_spatial_cpu.py
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
from jax.sharding import Mesh                                 # noqa: E402


def timed(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("space",))
    d, h, w, nc = 32, 48, 48, 8

    from deepatlas_tpu.losses import get_loss_function
    from deepatlas_tpu.models import UNetLight
    from deepatlas_tpu.parallel import (make_spatial_seg_step,
                                        shard_volume_batch)
    from deepatlas_tpu.train.steps import (TrainState, make_optimizer,
                                           make_seg_train_step)

    x = jax.random.uniform(jax.random.PRNGKey(0), (1, d, h, w, 1),
                           jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(1), (1, d, h, w), 0, nc)
    model = UNetLight(in_channel=1, n_classes=nc, bias=True, BN=True,
                      packed=False)
    variables = model.init(jax.random.PRNGKey(2), x, train=False)

    def fresh():
        return TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=make_optimizer(1e-3))

    factory = get_loss_function("dice")
    kw = dict(weight_type="Uniform", softmax=True, eps=1e-6)

    plain_step = make_seg_train_step(
        model, factory(n_class=nc, **kw), n_class=nc)
    st = fresh()
    st, *_ = plain_step(st, x, labels)
    t_plain = timed(lambda s: plain_step(s, x, labels)[1], st)
    print(f"plain step:    {t_plain * 1e3:8.1f} ms", flush=True)

    sp_step = make_spatial_seg_step(model, factory, n_class=nc, mesh=mesh,
                                    criterion_kwargs=kw)
    xs, ls = shard_volume_batch((x, labels), mesh)
    st2 = fresh()
    st2, *_ = sp_step(st2, xs, ls)
    t_sp = timed(lambda s: sp_step(s, xs, ls)[1], st2)
    print(f"spatial step:  {t_sp * 1e3:8.1f} ms   "
          f"(ratio {t_sp / t_plain:.2f}x)", flush=True)

    # forward-only comparison (same criterion, no grad)
    import dataclasses

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    fwd = jax.jit(partial(model.apply, train=False))
    t_f = timed(fwd, variables, x, iters=3)
    sp_model = dataclasses.replace(model, spatial_axis="space")
    sp_fwd = jax.jit(shard_map(partial(sp_model.apply, train=False),
                               mesh=mesh, in_specs=(P(), P(None, "space")),
                               out_specs=P(None, "space"),
                               check_vma=False))
    t_sf = timed(sp_fwd, variables, xs, iters=3)
    print(f"fwd plain:     {t_f * 1e3:8.1f} ms", flush=True)
    print(f"fwd spatial:   {t_sf * 1e3:8.1f} ms   "
          f"(ratio {t_sf / t_f:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
