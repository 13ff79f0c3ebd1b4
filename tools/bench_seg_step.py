"""Supervised seg train-step benchmark (packed-depth comparison).

Times ``make_seg_train_step`` on UNet_light at the MB101 recipe size for
different ``packed_levels`` (how many top resolution levels run on the
lane-packed Pallas convs vs XLA) — the round-2 headroom question: is the
quarter-resolution C=64 level worth packing?

  python tools/bench_seg_step.py --packed-levels 2 3
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=3, default=[168, 200, 168])
    ap.add_argument("--n-classes", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--packed-levels", type=int, nargs="+", default=[2, 3])
    ap.add_argument("--no-bn", action="store_true")
    args = ap.parse_args()

    from deepatlas_tpu.losses import get_loss_function
    from deepatlas_tpu.models import UNetLight
    from deepatlas_tpu.train.steps import (TrainState, make_optimizer,
                                           make_seg_train_step)

    d, h, w = args.size
    nc = args.n_classes
    key = jax.random.PRNGKey(230)
    images = jax.random.uniform(key, (1, d, h, w, 1), jnp.float32)
    labels = jax.random.randint(jax.random.fold_in(key, 1), (1, d, h, w),
                                0, nc, jnp.int32)
    crit = get_loss_function("dice")(n_class=nc, weight_type="Uniform",
                                     softmax=True)

    for pl_levels in args.packed_levels:
        model = UNetLight(in_channel=1, n_classes=nc, bias=True,
                          BN=not args.no_bn, dtype=jnp.bfloat16,
                          packed=True, packed_levels=pl_levels)
        variables = model.init(jax.random.fold_in(key, 2), images,
                               train=False)
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=make_optimizer(1e-3))
        step = make_seg_train_step(crit)
        t0 = time.time()
        state, loss, _ = step(state, images, labels)
        np.asarray(loss)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            state, loss, _ = step(state, images, labels)
        np.asarray(loss)
        ms = (time.time() - t0) / args.iters * 1e3
        print(f"packed_levels={pl_levels}: seg train step {ms:.1f} ms "
              f"(compile {compile_s:.1f} s)", flush=True)


if __name__ == "__main__":
    main()
