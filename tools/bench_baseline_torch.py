"""One-time PyTorch-CPU baseline measurement for BENCH comparisons.

Measures the reference-equivalent joint DeepAtlas iteration WITH the anatomy
losses (the alternating MICCAI'19 scheme): one registration update
(VoxelMorph fwd + LNCC + bending energy + anatomy dice through the warped
one-hot segmentation + backward + Adam) and one segmentation update
(UNet_light fwd on both volumes + supervised dice + anatomy consistency
through the frozen warp + backward + Adam), in PyTorch on CPU with all
cores, at the MindBoggle101 cropped volume size the reference trains on
(train_seg.py:51 crop of 182x218x182 -> 168x200x168, batch 1, 32 classes).

The torch networks are built from the same channel plans our Flax modules use
(models/__init__.py UNET_LIGHT_* constants; voxel_morph.py:42-46 filters) —
architecture-equivalent, independently written.

Writes {"torch_cpu_volumes_per_sec": X, ...} to BASELINE_MEASURED.json, which
bench.py reads for its ``vs_baseline`` field.  Run from the repo root:

    python tools/bench_baseline_torch.py [--size D H W] [--iters N]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

ENCODERS = ((8, 16), (16, 16, 32), (32, 32, 64), (64, 64, 64))
DECODERS = ((64, 64, 64), (64, 32, 32), (32, 16, 16))


def conv_block(cin, cout, bn=True):
    layers = [nn.Conv3d(cin, cout, 3, padding=1, bias=True)]
    if bn:
        layers.append(nn.BatchNorm3d(cout))
    layers.append(nn.LeakyReLU(0.01))
    return nn.Sequential(*layers)


class UNetLightTorch(nn.Module):
    def __init__(self, in_channel=1, n_classes=32):
        super().__init__()
        self.encs = nn.ModuleList()
        prev = in_channel
        for i, plan in enumerate(ENCODERS):
            chain = []
            for c in plan:
                chain.append(conv_block(prev, c))
                prev = c
            self.encs.append(nn.Sequential(*chain))
        self.decs = nn.ModuleList()
        self.ups = nn.ModuleList()
        for j, plan in enumerate(DECODERS):
            self.ups.append(nn.ConvTranspose3d(prev, plan[0], 2, stride=2,
                                               bias=True))
            skip_ch = ENCODERS[len(ENCODERS) - 2 - j][-1]
            prev2 = plan[0] + skip_ch
            chain = []
            for c in plan[1:]:
                chain.append(conv_block(prev2, c))
                prev2 = c
            self.decs.append(nn.Sequential(*chain))
            prev = prev2
        self.final = nn.Conv3d(prev, n_classes, 1, bias=True)

    def forward(self, x):
        skips = []
        for i, enc in enumerate(self.encs):
            x = enc(x)
            if i < len(self.encs) - 1:
                skips.append(x)
                x = F.max_pool3d(x, 2)
        for up, dec in zip(self.ups, self.decs):
            x = torch.cat([up(x), skips.pop()], dim=1)
            x = dec(x)
        return self.final(x)


class VoxelMorphTorch(nn.Module):
    def __init__(self, enc=(16, 32, 32, 32, 32), dec=(32, 32, 32, 8, 8)):
        super().__init__()
        self.enc = nn.ModuleList()
        prev = 2
        for i, c in enumerate(enc):
            self.enc.append(nn.Sequential(
                nn.Conv3d(prev, c, 3, stride=1 if i == 0 else 2, padding=1),
                nn.ReLU()))
            prev = c
        chans = [enc[-1], dec[0] + enc[3], dec[1] + enc[2], dec[2] + enc[1],
                 dec[3]]
        self.dec = nn.ModuleList(
            nn.Sequential(nn.Conv3d(cin, c, 3, padding=1), nn.ReLU())
            for cin, c in zip(chans, dec))
        self.flow = nn.Conv3d(dec[4] + enc[0], 3, 3, padding=1)

    def forward(self, source, target):
        x = torch.cat([source, target], dim=1)
        encs = []
        for e in self.enc:
            x = e(x)
            encs.append(x)
        return self._forward_ladder(source, encs)

    def _forward_ladder(self, source, encs):
        e1, e2, e3, e4, e5 = encs
        d1 = self.dec[0](F.interpolate(e5, size=e4.shape[2:]))
        d2 = self.dec[1](F.interpolate(torch.cat([d1, e4], 1),
                                       size=e3.shape[2:]))
        d3 = self.dec[2](F.interpolate(torch.cat([d2, e3], 1),
                                       size=e2.shape[2:]))
        d4 = self.dec[3](torch.cat([d3, e2], 1))
        d5 = self.dec[4](F.interpolate(d4, size=e1.shape[2:]))
        disp = self.flow(torch.cat([d5, e1], 1))

        b, _, D, H, W = disp.shape
        zz = torch.linspace(-1, 1, D).view(D, 1, 1).expand(D, H, W)
        yy = torch.linspace(-1, 1, H).view(1, H, 1).expand(D, H, W)
        xx = torch.linspace(-1, 1, W).view(1, 1, W).expand(D, H, W)
        ident = torch.stack([xx, yy, zz], dim=-1)[None]
        grid = disp.permute(0, 2, 3, 4, 1) + ident
        warped = F.grid_sample(source, grid, mode="bilinear",
                               padding_mode="zeros", align_corners=True)
        return disp, warped, grid


def lncc_loss(a, b, win=9):
    pad = win // 2
    kernel = torch.ones(1, 1, win, win, win) / win ** 3
    conv = lambda x: F.conv3d(x, kernel, padding=pad)
    mu_a, mu_b = conv(a), conv(b)
    var_a = conv(a * a) - mu_a ** 2
    var_b = conv(b * b) - mu_b ** 2
    cov = conv(a * b) - mu_a * mu_b
    cc = cov ** 2 / (var_a * var_b + 1e-5)
    return 1 - cc.mean()


def bending_energy(disp):
    d2 = disp[:, :, 2:] + disp[:, :, :-2] - 2 * disp[:, :, 1:-1]
    h2 = disp[:, :, :, 2:] + disp[:, :, :, :-2] - 2 * disp[:, :, :, 1:-1]
    w2 = (disp[..., 2:] + disp[..., :-2] - 2 * disp[..., 1:-1])
    return (d2 ** 2).mean() + (h2 ** 2).mean() + (w2 ** 2).mean()


def dice_loss(logits, labels, n_class):
    probs = torch.softmax(logits, dim=1)
    onehot = F.one_hot(labels, n_class).permute(0, 4, 1, 2, 3).float()
    inter = (probs * onehot).sum(dim=(2, 3, 4))
    denom = probs.sum(dim=(2, 3, 4)) + onehot.sum(dim=(2, 3, 4))
    return 1 - (2 * inter / (denom + 1e-7)).mean()


def soft_dice(src_probs, tgt_probs):
    """Soft-soft dice over foreground channels (reg_steps.py semantics)."""
    inter = (src_probs[:, 1:] * tgt_probs[:, 1:]).sum(dim=(2, 3, 4))
    denom = src_probs[:, 1:].sum(dim=(2, 3, 4)) + \
        tgt_probs[:, 1:].sum(dim=(2, 3, 4))
    return 1 - (2 * inter / (denom + 1e-5)).mean()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=3, default=[168, 200, 168])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--n-classes", type=int, default=32)
    args = ap.parse_args()

    torch.set_num_threads(os.cpu_count())
    torch.manual_seed(230)
    D, H, W = args.size
    nc = args.n_classes
    moving = torch.rand(1, 1, D, H, W)
    fixed = torch.rand(1, 1, D, H, W)
    labels_m = torch.randint(0, nc, (1, D, H, W))
    labels_f = torch.randint(0, nc, (1, D, H, W))

    seg = UNetLightTorch(1, nc)
    reg = VoxelMorphTorch()
    opt_s = torch.optim.Adam(seg.parameters(), lr=1e-3)
    opt_r = torch.optim.Adam(reg.parameters(), lr=1e-3)

    def onehot(lab):
        return F.one_hot(lab, nc).permute(0, 4, 1, 2, 3).float()

    def joint_iter():
        # --- reg phase: similarity + smoothness + anatomy dice
        opt_r.zero_grad()
        disp, warped, grid = reg(moving, fixed)
        warped_oh = F.grid_sample(onehot(labels_m), grid, mode="bilinear",
                                  padding_mode="zeros", align_corners=True)
        anat_r = soft_dice(warped_oh, onehot(labels_f))
        (lncc_loss(warped, fixed) + bending_energy(disp) + anat_r).backward()
        opt_r.step()
        # --- seg phase: supervised dice on both volumes + anatomy
        # consistency through the frozen warp (two-branch form,
        # reg_steps.py:make_joint_seg_step semantics)
        opt_s.zero_grad()
        logits_m = seg(moving)
        logits_f = seg(fixed)
        probs_m = torch.softmax(logits_m, dim=1)
        probs_f = torch.softmax(logits_f, dim=1)
        warped_m = F.grid_sample(probs_m, grid.detach(), mode="bilinear",
                                 padding_mode="zeros", align_corners=True)
        anat_s = soft_dice(warped_m, probs_f)
        sup = 0.5 * (dice_loss(logits_m, labels_m, nc)
                     + dice_loss(logits_f, labels_f, nc))
        (anat_s + sup).backward()
        opt_s.step()

    joint_iter()  # warmup
    t0 = time.time()
    for _ in range(args.iters):
        joint_iter()
    dt = (time.time() - t0) / args.iters
    vols_per_sec = 2.0 / dt  # the (moving, fixed) pair per joint iteration

    out = {
        "torch_cpu_volumes_per_sec": vols_per_sec,
        "torch_cpu_sec_per_joint_iter": dt,
        "volume_size": [D, H, W],
        "n_classes": nc,
        "n_threads": torch.get_num_threads(),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
