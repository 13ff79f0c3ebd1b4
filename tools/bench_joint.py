"""Joint DeepAtlas step benchmark at the MB101 recipe size (config 3).

Measures the alternating joint steps (reg phase / seg phase, with the
anatomy one-hot warps) on the default backend.  Run from the repo root.

Status on one v5e chip (15.75G HBM): the reg phase runs at ~7.3 s/step
(32-channel Pallas anatomy warp).  The seg phase — two U-Net grads + the
C=32 anatomy graph — still exceeds HBM at the full 168x200x168 volume even
with the exact two-pass gradient split (XLA materializes BatchNorm-backward
temporaries in channel-minor layouts with 8x padding); it runs at reduced
crops or patch size (the joint CLI path), and fits as-is on >=2 chips via
the DP joint steps.  Tracked for round 2: per-class presence skipping of
the one-hot warps and a layout-friendly BN gradient.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, numpy as np, jax.numpy as jnp
from deepatlas_tpu.losses import get_loss_function
from deepatlas_tpu.models import UNetLight, VoxelMorphCVPR2018
from deepatlas_tpu.train.reg_steps import make_joint_reg_step, make_joint_seg_step
from deepatlas_tpu.train.steps import TrainState, make_optimizer
d,h,w,nc = 168,200,168,32
ks = jax.random.split(jax.random.PRNGKey(230),6)
moving = jax.random.uniform(ks[0], (1,d,h,w,1), jnp.float32)
fixed = jax.random.uniform(ks[1], (1,d,h,w,1), jnp.float32)
mseg = jax.random.randint(ks[2], (1,d,h,w), 0, nc, jnp.int32)
fseg = jax.random.randint(ks[3], (1,d,h,w), 0, nc, jnp.int32)
has = jnp.ones((1,), bool)
seg_model = UNetLight(in_channel=1, n_classes=nc, bias=True, BN=True, dtype=jnp.bfloat16, remat=True)
reg_model = VoxelMorphCVPR2018(dtype=jnp.bfloat16, remat=True, use_pallas_warp=True, max_disp=8)
sv = seg_model.init(ks[4], moving, train=False)
rv = reg_model.init(ks[5], moving, fixed)
ss = TrainState.create(apply_fn=seg_model.apply, params=sv["params"], batch_stats=sv.get("batch_stats", {}), tx=make_optimizer(1e-3))
rs = TrainState.create(apply_fn=reg_model.apply, params=rv["params"], batch_stats={}, tx=make_optimizer(1e-3))
sim = get_loss_function("lncc")(filter_size=9)
regl = get_loss_function("bendingEnergy")()
sup = get_loss_function("dice")(n_class=nc, weight_type="Uniform", softmax=True)
from deepatlas_tpu.pallas import pallas_grid_sample
from functools import partial
wfn = partial(pallas_grid_sample, max_disp=8)
jr = make_joint_reg_step(sim, regl, 1.0, 1.0, nc, warp_fn=wfn, anatomy_dtype=jnp.bfloat16)
js = make_joint_seg_step(sup, 1.0, 1.0, nc, warp_fn=wfn, anatomy_dtype=jnp.bfloat16, two_pass=True)
import sys
if "--seg-only" in sys.argv:
    pass
t0=time.time(); rs2, m = jr(rs, ss, moving, fixed, mseg, fseg, has, has); np.asarray(m["loss"])
print("joint reg step compile+run", round(time.time()-t0,1), "s", flush=True)
t0=time.time()
for _ in range(3): rs2, m = jr(rs2, ss, moving, fixed, mseg, fseg, has, has)
np.asarray(m["loss"]); print("joint reg step:", round((time.time()-t0)/3*1e3,1), "ms", flush=True)
t0=time.time(); ss2, m2 = js(ss, rs, moving, fixed, mseg, fseg, has, has); np.asarray(m2["loss"])
print("joint seg step compile+run", round(time.time()-t0,1), "s", flush=True)
t0=time.time()
for _ in range(3): ss2, m2 = js(ss2, rs, moving, fixed, mseg, fseg, has, has)
np.asarray(m2["loss"]); print("joint seg step:", round((time.time()-t0)/3*1e3,1), "ms", flush=True)
