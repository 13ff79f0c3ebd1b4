"""Microbench: multi-plane (block) packed conv vs the shipped one-plane
rotating-accumulator kernel, per flagship U-Net conv shape.

VERDICT r4 #9 follow-through: PERF.md's round-4 roofline showed the deep
small-M conv shapes running latency-bound (0.3–7 TF/s) and named
"fusing shift variants into fewer, larger dots" as the ≤150 ms lever.
`packed_conv3d_block` (pallas/conv3d.py) amortizes per-grid-step overhead
over ``p_blk`` output planes at the cost of rebuilding the 2-plane halo's
variants per block.  This tool times FORWARD passes of both kernels on
every k3 conv shape of the flagship seg U-Net and prints ms per shape per
p_blk, so the adopt/park decision is a measurement, not a guess.

  python tools/bench_block_conv.py [--iters 10] [--p-blks 2 4 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, *args, iters=10):
    out = fn(*args)
    np.asarray(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--size", type=int, nargs=3, default=[168, 200, 168])
    ap.add_argument("--n-classes", type=int, default=32)
    ap.add_argument("--p-blks", type=int, nargs="+", default=[2, 4, 8])
    args = ap.parse_args()

    from bench_packed_conv import collect_shapes  # tools/ sibling
    from deepatlas_tpu.pallas.conv3d import (packed_conv3d,
                                             packed_conv3d_block)

    calls = collect_shapes(args.size, args.n_classes)
    seen = set()
    rng = np.random.RandomState(0)
    print(f"{'x (D,Hs,lanes)':>20} {'k':>10} | {'1-plane':>8} | "
          + " | ".join(f"P={p:>2}" for p in args.p_blks), flush=True)
    for kind, x_shape, k_shape, kw in calls:
        if kind != "conv" or k_shape[0] != 3:
            continue
        key = (x_shape, k_shape)
        if key in seen:
            continue
        seen.add(key)
        x = jnp.asarray(rng.rand(*x_shape).astype(np.float32)) \
            .astype(jnp.bfloat16)
        k = jnp.asarray(0.1 * rng.randn(*k_shape).astype(np.float32))
        base = jax.jit(lambda xx, kk: packed_conv3d(
            xx, kk, c_in=kw["c_in"], w_valid=kw["w_valid"],
            h_valid=kw.get("h_valid"), kernel_size=3))
        t0 = timed(base, x, k, iters=args.iters)
        row = [f"{t0 * 1e3:8.2f}"]
        # numeric spot check on the first p_blk
        checked = False
        for p in args.p_blks:
            blk = jax.jit(lambda xx, kk, p=p: packed_conv3d_block(
                xx, kk, c_in=kw["c_in"], w_valid=kw["w_valid"],
                h_valid=kw.get("h_valid"), p_blk=p))
            try:
                tb = timed(blk, x, k, iters=args.iters)
                if not checked:
                    err = float(jnp.max(jnp.abs(
                        base(x, k).astype(jnp.float32)
                        - blk(x, k).astype(jnp.float32))))
                    assert err < 1e-1, f"block kernel mismatch: {err}"
                    checked = True
                row.append(f"{tb * 1e3:8.2f}")
            except Exception as e:  # VMEM overflow etc.
                row.append(f"   {type(e).__name__[:5]}")
        ci, co = k_shape[3], k_shape[4]
        print(f"{str(x_shape):>20} {f'3³·{ci}→{co}':>10} | "
              + " | ".join(row), flush=True)


if __name__ == "__main__":
    main()
