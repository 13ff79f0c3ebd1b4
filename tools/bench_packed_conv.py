"""Per-shape roofline for the packed Pallas conv path (round-3 review #4).

Collects every (packed_conv3d / packed_deconv2x) call the flagship
UNet_light(packed=True, packed_levels=3) forward makes at the MB101 recipe
size (one jax.eval_shape trace with the kernel entry points hooked), then
times each unique shape on the chip — forward, and forward+backward via
jax.grad — and prints a roofline row per shape:

  * true MACs (the convolution's arithmetic),
  * billed MACs (the banded block-Toeplitz formulation runs the MXU on a
    3x band for k3 convs — pallas/conv3d.py:28-31; k1 and the k2s2
    deconv bill 1x),
  * HBM bytes (unpadded packed operands: in + out + kernel bank),
  * measured ms and achieved TFLOP/s, vs the MXU-bound and HBM-bound
    floors (v5e: ~197 bf16 TFLOP/s, ~819 GB/s),

plus a summary MFU statement for the whole supervised seg step using the
measured step time (tools/profile_seg_step.py).

  python tools/bench_packed_conv.py [--iters 10] [--step-ms 194]
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

PEAK_TFLOPS = 197.0          # v5e bf16
PEAK_GBS = 819.0             # v5e HBM


def collect_shapes(size, nc):
    """One eval_shape trace of the packed UNet_light forward with the
    kernel entry points hooked; returns [(kind, x_shape, k_shape, kwargs)]
    in call order (train=True so BN runs too — it adds no conv calls)."""
    from deepatlas_tpu.models import UNetLight
    import deepatlas_tpu.models.packed as mp

    calls = []
    orig_conv, orig_deconv = mp.packed_conv3d, mp.packed_deconv2x

    def hook_conv(x, k, **kw):
        calls.append(("conv", tuple(x.shape), tuple(k.shape),
                      {m: kw[m] for m in ("c_in", "w_valid", "h_valid",
                                          "kernel_size") if m in kw}))
        return orig_conv(x, k, **kw)

    def hook_deconv(x, k, **kw):
        calls.append(("deconv", tuple(x.shape), tuple(k.shape),
                      {m: kw[m] for m in ("c_in", "w_valid_out")
                       if m in kw}))
        return orig_deconv(x, k, **kw)

    mp.packed_conv3d, mp.packed_deconv2x = hook_conv, hook_deconv
    try:
        model = UNetLight(in_channel=1, n_classes=nc, bias=True, BN=True,
                          dtype=jnp.bfloat16, packed=True, packed_levels=3)
        d, h, w = size
        x = jax.ShapeDtypeStruct((1, d, h, w, 1), jnp.float32)
        key = jax.random.PRNGKey(0)
        jax.eval_shape(lambda xx: model.init(key, xx, train=True), x)
    finally:
        mp.packed_conv3d, mp.packed_deconv2x = orig_conv, orig_deconv
    return calls


def analyze(kind, x_shape, k_shape, kw):
    """(true_macs, billed_macs, hbm_bytes, out_shape-ish D*H for display)"""
    d, hs, lanes = x_shape
    if kind == "conv":
        ks = k_shape[0]
        cin, cout = k_shape[3], k_shape[4]
        w_valid = kw["w_valid"]
        h_valid = kw.get("h_valid") or hs
        vox = d * h_valid * w_valid
        true_macs = vox * cin * cout * ks ** 3
        billed = true_macs * (3 if ks == 3 else 1)
        bytes_ = 2 * (d * hs * lanes) + 2 * (d * hs * (lanes // cin) * cout) \
            + 2 * int(np.prod(k_shape)) * (9 if ks == 3 else 1)
    else:
        cin, cout = k_shape[3], k_shape[4]
        w_valid_out = kw["w_valid_out"]
        vox_in = d * hs * (w_valid_out // 2)
        true_macs = vox_in * cin * cout * 8
        billed = true_macs
        bytes_ = 2 * (d * hs * lanes) \
            + 2 * (2 * d * 2 * hs * (lanes // cin) * cout) \
            + 2 * int(np.prod(k_shape)) * 8
    return true_macs, billed, bytes_


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=3, default=[168, 200, 168])
    ap.add_argument("--n-classes", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--step-ms", type=float, default=None,
                    help="measured full supervised seg-step ms (from "
                         "tools/profile_seg_step.py) for the summary MFU")
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    from deepatlas_tpu.pallas.conv3d import packed_conv3d
    from deepatlas_tpu.pallas.deconv3d import packed_deconv2x

    calls = collect_shapes(args.size, args.n_classes)
    uniq = {}
    for c in calls:
        key = (c[0], c[1], c[2], tuple(sorted(c[3].items())))
        uniq.setdefault(key, [c, 0])
        uniq[key][1] += 1

    print(f"{len(calls)} packed kernel calls, {len(uniq)} unique shapes "
          f"(fwd, size {args.size})", flush=True)
    header = (f"{'kind':7} {'x (D,Hs,L)':>18} {'k':>16} {'n':>2} "
              f"{'ms':>8} {'TF/s':>6} {'bill%MXU':>8} {'HBMms':>6} "
              f"{'MXUms':>6}")
    print(header, flush=True)

    tot_true_f = 0.0
    rng = np.random.RandomState(0)
    for (kind, xs, ks_, kwt), (call, n) in uniq.items():
        kw = dict(call[3])
        true_macs, billed, bytes_ = analyze(kind, xs, ks_, kw)
        x = jnp.asarray(rng.rand(*xs).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.rand(*ks_).astype(np.float32) * 0.1,
                        jnp.float32)
        if kind == "conv":
            fn = jax.jit(lambda a, b, _kw=kw: packed_conv3d(a, b, **_kw))
        else:
            fn = jax.jit(lambda a, b, _kw=kw: packed_deconv2x(a, b, **_kw))
        out = fn(x, k)
        np.asarray(jnp.sum(out))
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(x, k)
        np.asarray(jnp.sum(out))
        ms = (time.time() - t0) / args.iters * 1e3
        tfs = 2 * true_macs / ms / 1e9
        bill_frac = 2 * billed / ms / 1e9 / PEAK_TFLOPS * 100
        hbm_ms = bytes_ / PEAK_GBS / 1e6
        mxu_ms = 2 * billed / PEAK_TFLOPS / 1e9
        tot_true_f += n * 2 * true_macs
        print(f"{kind:7} {str(xs):>18} {str(ks_):>16} {n:>2} "
              f"{ms:8.2f} {tfs:6.1f} {bill_frac:7.1f}% {hbm_ms:6.2f} "
              f"{mxu_ms:6.2f}", flush=True)

    print(f"\npacked fwd conv FLOPs (true): {tot_true_f/1e12:.3f} TF",
          flush=True)
    if args.step_ms:
        # fwd+bwd ~= 3x fwd FLOPs (dgrad + wgrad); packed levels carry
        # ~all the volume-sized arithmetic of the step
        step_f = 3 * tot_true_f
        mfu = step_f / (args.step_ms * 1e-3) / (PEAK_TFLOPS * 1e12) * 100
        print(f"supervised seg step MFU (true conv FLOPs / {args.step_ms} "
              f"ms / {PEAK_TFLOPS} TF/s peak): {mfu:.1f}%", flush=True)


if __name__ == "__main__":
    main()
