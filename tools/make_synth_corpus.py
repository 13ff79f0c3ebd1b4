"""Generate a full-size synthetic MindBoggle-layout corpus for benches.

Writes 182x218x182 (MNI152 1mm grid) volumes — the raw shape that the
reference seg recipe's border crop [0,10,7,14,8,7] reduces to the
168x200x168 training shape (reference train_seg.py:51, crop semantics at
lib/transforms.py:124-158) — under the MindBoggle directory layout
(reference lib/datasets.py:325-326):

  <root>/mindboggle/image_in_MNI152_normalized/<name>.nii.gz
  <root>/mindboggle/label_31_reID_merged/<name>.nii.gz

plus the list files the drivers expect (reference train_seg.py:65-83):
MMRR-21-flip.txt (train), NKI-RS-21-valid.txt, NKI-RS-21-train.txt.

The images are smooth random blobs with label-correlated intensity so a
training run does real work; this is an ingest/throughput corpus, not an
accuracy corpus.

  python tools/make_synth_corpus.py --root /tmp/mb_full [--n 21]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepatlas_tpu.data import NiftiImage, write_nifti  # noqa: E402


def smooth_noise(rng, shape, scale=8):
    """Low-frequency noise: coarse grid linearly upsampled to ``shape``."""
    coarse = rng.rand(*(max(2, s // scale) for s in shape)).astype(np.float32)
    out = coarse
    for axis in range(3):
        idx = np.linspace(0, out.shape[axis] - 1, shape[axis])
        lo = np.floor(idx).astype(np.int64)
        hi = np.minimum(lo + 1, out.shape[axis] - 1)
        frac = (idx - lo).astype(np.float32)
        shp = [1, 1, 1]
        shp[axis] = shape[axis]
        out = (np.take(out, lo, axis=axis) * (1 - frac.reshape(shp))
               + np.take(out, hi, axis=axis) * frac.reshape(shp))
    return out


def make_volume(rng, shape, n_classes):
    """Blobby multi-class segmentation + label-correlated image."""
    field = smooth_noise(rng, shape, scale=12)
    # spherical "brain" support so borders are background like real MNI data
    zz, yy, xx = np.meshgrid(*(np.linspace(-1, 1, s) for s in shape),
                             indexing="ij")
    support = (zz ** 2 + yy ** 2 + xx ** 2) < 0.8
    # quantize the smooth field into labels inside the support
    lv = np.clip((field - field.min()) / (np.ptp(field) + 1e-6), 0, 1)
    seg = (1 + np.floor(lv * (n_classes - 1))).astype(np.uint8)
    seg = np.where(support, np.minimum(seg, n_classes - 1), 0)
    img = (seg.astype(np.float32) / n_classes * 0.7
           + smooth_noise(rng, shape, scale=4) * 0.2
           + rng.rand(*shape).astype(np.float32) * 0.1)
    img *= support.astype(np.float32)
    return img.astype(np.float32), seg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/mb_full")
    ap.add_argument("--n", type=int, default=21, help="training volumes")
    ap.add_argument("--n-valid", type=int, default=3)
    ap.add_argument("--n-test", type=int, default=3)
    ap.add_argument("--shape", type=int, nargs=3, default=[182, 218, 182])
    ap.add_argument("--n-classes", type=int, default=32)
    ap.add_argument("--seed", type=int, default=230)
    args = ap.parse_args()

    root = os.path.join(args.root, "mindboggle")
    img_dir = os.path.join(root, "image_in_MNI152_normalized")
    seg_dir = os.path.join(root, "label_31_reID_merged")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(seg_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    shape = tuple(args.shape)

    groups = {"MMRR-21-flip.txt": args.n,
              "NKI-RS-21-valid.txt": args.n_valid,
              "NKI-RS-21-train.txt": args.n_test}
    idx = 0
    for list_name, count in groups.items():
        names = []
        for _ in range(count):
            name = f"synth{idx:03d}"
            idx += 1
            img, seg = make_volume(rng, shape, args.n_classes)
            write_nifti(os.path.join(img_dir, name + ".nii.gz"),
                        NiftiImage(img))
            write_nifti(os.path.join(seg_dir, name + ".nii.gz"),
                        NiftiImage(seg))
            names.append(name)
            print(f"wrote {name} ({list_name})", flush=True)
        with open(os.path.join(root, list_name), "w") as f:
            f.write("".join(n + "\n" for n in names))
    print(f"corpus at {root}: {idx} volumes of {shape}, "
          f"{args.n_classes} classes")


if __name__ == "__main__":
    main()
