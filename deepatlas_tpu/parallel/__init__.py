"""Parallelism: device meshes, data-parallel and spatial (depth-sharded)
training.

The reference is single-process, single-GPU (SURVEY.md §2 statement); this
package is the TPU-native scaling layer BASELINE.json config 5 requires:
an explicit ``jax.sharding.Mesh``, shard_map data-parallel train/eval steps
with gradient ``pmean`` over ICI, cross-replica BatchNorm statistics, and
halo-exchanged spatial sharding of whole volumes (spatial.py) for training
past one chip's HBM — composable with DP on a 2-D (data, space) mesh.
The mesh abstraction is DCN-ready (any device list forms the mesh) even
though a single v4/v5e host only exercises ICI.
"""
from .mesh import make_mesh, local_device_count
from .dp import (make_dp_seg_train_step, make_dp_seg_eval_step,
                 make_dp_confusion_eval_step, make_dp_reg_train_step,
                 make_dp_joint_steps, shard_batch, replicate)
from .spatial import (make_spatial_joint_steps, make_spatial_reg_step,
                      make_spatial_seg_eval_step, make_spatial_seg_forward,
                      make_spatial_seg_step, shard_volume_batch)

__all__ = ["make_mesh", "local_device_count", "make_dp_seg_train_step",
           "make_dp_seg_eval_step", "make_dp_confusion_eval_step",
           "make_dp_reg_train_step", "make_dp_joint_steps", "shard_batch",
           "replicate", "make_spatial_joint_steps", "make_spatial_reg_step",
           "make_spatial_seg_eval_step",
           "make_spatial_seg_forward", "make_spatial_seg_step",
           "shard_volume_batch"]
