"""Isolate the spatial mesh-of-1 slowdown (SPATIAL_ONCHIP_r04: 22.9 s vs
189.8 ms plain).  Times, on the default backend with Mesh([dev0], ("space",)):

  1. plain jit elementwise step (dispatch baseline)
  2. shard_map, no collectives
  3. shard_map, 1 psum
  4. shard_map, 32 psums (the packed U-Net's BN moment count is ~2/BN x
     ~17 BN layers; dice adds ~4; grad pmean adds ~1/leaf ~ 50)
  5. the spatial seg step WITHOUT BN (isolates PackedBatchNorm psums)
  6. the packed model forward with spatial_axis at D+2 halo shapes,
     plain jit (isolates the halo'd conv shapes from shard_map)

Run: python tools/probe_spatial_overhead.py
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

# NOTE: do NOT enable faulthandler.dump_traceback_later here — its watchdog
# thread deadlocks the axon TPU client (bisected r05: the identical script
# ran with it removed and hung with it present).

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P             # noqa: E402

try:                                                           # noqa: E402
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def timed(fn, *args, iters=5):
    """``fn`` must return a jit-produced SCALAR: the two r05 launch
    attempts hung forever in the warmup sync because the old
    ``out.ravel()[0]`` dispatched EAGER ops through the axon tunnel
    (bench.py/bench_spatial_onchip, which only np.asarray jit outputs,
    ran fine in the same window)."""
    out = fn(*args)
    np.asarray(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.time() - t0) / iters


def main():
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("space",))
    x = jnp.ones((8, 256, 256), jnp.float32)

    t = timed(jax.jit(lambda v: jnp.sum(v * 2.0 + 1.0)), x)
    print(f"1 plain jit elementwise:        {t * 1e3:8.1f} ms", flush=True)

    def mk(n_psum):
        def body(v):
            v = v * 2.0 + 1.0
            for _ in range(n_psum):
                v = v + jax.lax.psum(jnp.sum(v[:1, :1]), "space") * 0.0
            return jnp.sum(v)
        return jax.jit(shard_map(body, mesh=mesh, in_specs=(P(),),
                                 out_specs=P(), check_vma=False))

    for n in (0, 1, 32):
        t = timed(mk(n), x)
        print(f"2 shard_map psums={n:3d}:          {t * 1e3:8.1f} ms",
              flush=True)

    # packed model forward, plain jit, with and without spatial_axis=None
    import dataclasses

    from deepatlas_tpu.models import UNetLight

    d, h, w = 168, 200, 168
    xi = jax.random.uniform(jax.random.PRNGKey(0), (1, d, h, w, 1),
                            jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(1), (1, d, h, w), 0, 32)
    model = UNetLight(in_channel=1, n_classes=32, bias=True, BN=True,
                      dtype=jnp.bfloat16, packed=True)
    variables = jax.device_get(model.init(jax.random.PRNGKey(2), xi,
                                          train=False))

    fwd = jax.jit(lambda v, a: jnp.sum(
        model.apply(v, a, train=False).astype(jnp.float32)))
    t = timed(fwd, jax.device_put(variables), xi, iters=3)
    print(f"3 packed fwd plain:             {t * 1e3:8.1f} ms", flush=True)

    sp_model = dataclasses.replace(model, spatial_axis="space")

    def sp_fwd(v, a):
        return jnp.sum(sp_model.apply(v, a, train=False)
                       .astype(jnp.float32))

    sp_jit = jax.jit(shard_map(sp_fwd, mesh=mesh,
                               in_specs=(P(), P(None, "space")),
                               out_specs=P(),
                               check_vma=False))
    t = timed(sp_jit, jax.device_put(variables), xi, iters=3)
    print(f"4 packed fwd spatial shardmap:  {t * 1e3:8.1f} ms", flush=True)

    # full spatial seg step (grads + BN + dice psums) for reference
    from deepatlas_tpu.losses import get_loss_function
    from deepatlas_tpu.parallel import (make_spatial_seg_step,
                                        shard_volume_batch)
    from deepatlas_tpu.train.steps import TrainState, make_optimizer

    factory = get_loss_function("dice")
    sp_step = make_spatial_seg_step(
        model, factory, n_class=32, mesh=mesh,
        criterion_kwargs=dict(weight_type="Uniform", softmax=True,
                              eps=1e-6))
    xs, ls = shard_volume_batch((xi, labels), mesh)

    def fresh():
        return TrainState.create(
            apply_fn=model.apply,
            params=jax.device_put(variables["params"]),
            batch_stats=jax.device_put(variables.get("batch_stats", {})),
            tx=make_optimizer(1e-3))

    def run_step(step, tag, model_=None, collect=False):
        mv = (jax.device_get(model_.init(jax.random.PRNGKey(2), xi,
                                         train=False))
              if model_ is not None else variables)

        def fresh_():
            return TrainState.create(
                apply_fn=(model_ or model).apply,
                params=jax.device_put(mv["params"]),
                batch_stats=jax.device_put(mv.get("batch_stats", {})),
                tx=make_optimizer(1e-3))

        st = fresh_()
        if collect:
            low = step.lower(st, xs, ls)
            txt = low.compile().as_text()
            n_ar = txt.count("all-reduce")
            n_cp = txt.count("collective-permute")
            n_cc = txt.count("custom-call")
            print(f"  [{tag} compiled HLO: all-reduce x{n_ar}, "
                  f"collective-permute x{n_cp}, custom-call x{n_cc}]",
                  flush=True)
        out = step(st, xs, ls)
        np.asarray(out[1])
        st = out[0]
        t0 = time.time()
        for _ in range(3):
            out = step(st, xs, ls)
            st = out[0]
        np.asarray(out[1])
        print(f"{tag}: {(time.time() - t0) / 3 * 1e3:8.1f} ms", flush=True)

    run_step(sp_step, "5 spatial seg step", collect=True)

    # 6: BN=False removes the 2-per-BN sequential moment psums (fwd + their
    # transposes in the backward) — if this collapses the time, the
    # collective COUNT/latency is the problem, not the halo or the grads
    model_nobn = UNetLight(in_channel=1, n_classes=32, bias=True, BN=False,
                           dtype=jnp.bfloat16, packed=True)
    step_nobn = make_spatial_seg_step(
        model_nobn, factory, n_class=32, mesh=mesh,
        criterion_kwargs=dict(weight_type="Uniform", softmax=True,
                              eps=1e-6))
    run_step(step_nobn, "6 spatial seg step BN=False", model_=model_nobn,
             collect=True)

    # 7: plain-jit full step on the same model (the 190 ms reference)
    from deepatlas_tpu.train.steps import make_seg_train_step
    criterion = factory(n_class=32, weight_type="Uniform", softmax=True,
                        eps=1e-6)
    plain_step = make_seg_train_step(criterion)
    run_step(plain_step, "7 plain jit seg step")


if __name__ == "__main__":
    main()
