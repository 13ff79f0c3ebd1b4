"""Decompose the supervised seg train step's time (round-3 #5 follow-up).

Times, at the MB101 recipe size on the real chip:
  * forward only (train=True)           — the packed conv fwd pipeline
  * value_and_grad step (no optimizer)  — adds bwd (dgrad+wgrad) + loss
  * the full train step                 — adds Adam + BN-stat plumbing
for each requested ``packed_levels``, so the fwd/bwd/update split and the
packing-depth marginal are measured rather than guessed.

  python tools/profile_seg_step.py --packed-levels 3 4
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # sync by pulling a SCALAR: np.asarray of a big array (e.g. fwd logits,
    # ~360 MB) drags it through the axon tunnel and dominates the timing
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def timed(fn, *a, iters=5):
    out = fn(*a)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*a)
    _sync(out)
    return (time.time() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=3, default=[168, 200, 168])
    ap.add_argument("--n-classes", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--packed-levels", type=int, nargs="+", default=[3])
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

    for pl in args.packed_levels:
        model = UNetLight(in_channel=1, n_classes=nc, bias=True,
                          BN=not args.no_bn, dtype=jnp.bfloat16,
                          packed=True, packed_levels=pl)
        variables = model.init(jax.random.fold_in(key, 2), images,
                               train=False)
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=make_vars(variables),
            tx=make_optimizer(1e-3))

        @jax.jit
        def fwd(params, bstats, x):
            out = model.apply({"params": params, "batch_stats": bstats}, x,
                              train=True, mutable=["batch_stats"])
            return out[0]

        @jax.jit
        def vag(params, bstats, x, y):
            def loss_fn(p):
                logits, _ = model.apply(
                    {"params": p, "batch_stats": bstats}, x, train=True,
                    mutable=["batch_stats"])
                return crit(logits.astype(jnp.float32), y)
            return jax.value_and_grad(loss_fn)(params)

        step = make_seg_train_step(crit)

        ms_f = timed(fwd, state.params, state.batch_stats, images,
                     iters=args.iters)
        ms_g = timed(vag, state.params, state.batch_stats, images, labels,
                     iters=args.iters)

        st = state
        st, loss, _ = step(st, images, labels)
        np.asarray(loss)
        t0 = time.time()
        for _ in range(args.iters):
            st, loss, _ = step(st, images, labels)
        np.asarray(loss)
        ms_s = (time.time() - t0) / args.iters * 1e3

        print(f"packed_levels={pl}: fwd {ms_f:.1f} ms | "
              f"fwd+loss+bwd {ms_g:.1f} ms | full step {ms_s:.1f} ms "
              f"(bwd+loss {ms_g - ms_f:.1f}, update {ms_s - ms_g:.1f})",
              flush=True)


def make_vars(variables):
    return variables.get("batch_stats", {})


if __name__ == "__main__":
    main()
