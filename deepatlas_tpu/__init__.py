"""DeepAtlas-TPU: a TPU-native (JAX/XLA/Pallas) framework for joint semi-supervised
learning of 3D medical-image registration and segmentation.

Re-designed from scratch for TPU hardware with the capability set of the DeepAtlas
reference (uncbiag/DeepAtlas, MICCAI 2019): segmentation training, pairwise
deformable registration training, joint alternating semi-supervised training, and
patch-based sliding-window inference — as pure functions + pytrees compiled by XLA,
with `jax.sharding` data parallelism and Pallas kernels on the hot path.

Layout convention: volumes are channel-last ``(B, D, H, W, C)`` (XLA/TPU friendly),
segmentation masks are ``(B, D, H, W)`` integer arrays, and dense deformation /
displacement fields are ``(B, D, H, W, 3)`` with the last axis ordered ``(x, y, z)``
— x indexes W, y indexes H, z indexes D — normalized to ``[-1, 1]`` with
align-corners semantics (matching the reference's grid convention,
lib/utils.py:89-102 + voxel_morph.py:85-91, so warp outputs are bit-comparable).
"""

__version__ = "0.1.0"
