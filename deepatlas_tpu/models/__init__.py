"""Network registry.

Mirrors lib/network_factory/__init__.py:9-27: keys ``voxel_morph_cvpr``,
``UNet``, ``UNet_light`` (the UNetTemplate instantiation with the reference's
channel plan).  ``get_network(name)`` returns a Flax module factory callable
with the reference's ``model_settings`` kwargs
(e.g. ``{'in_channel': 1, 'n_classes': 32, 'bias': True, 'BN': True}``,
train_seg.py:47).
"""
from __future__ import annotations

from functools import partial

from .unet import UNet, UNetTemplate
from .voxelmorph import VoxelMorphCVPR2018

__all__ = ["UNet", "UNetTemplate", "VoxelMorphCVPR2018", "UNetLight",
           "network_dic", "get_network", "get_available_networks",
           "resolve_model_settings"]

# the UNet_light channel plan (network_factory/__init__.py:12-15)
UNET_LIGHT_ENCODERS = ((8, 16), (16, 16, 32), (32, 32, 64), (64, 64, 64))
UNET_LIGHT_DECODERS = ((64, 64, 64), (64, 32, 32), (32, 16, 16))

UNetLight = partial(UNetTemplate,
                    encoders=UNET_LIGHT_ENCODERS,
                    decoders=UNET_LIGHT_DECODERS,
                    act="LeakyReLU", maxpool=True, upsample=False, res=False)

network_dic = {
    "voxel_morph_cvpr": VoxelMorphCVPR2018,
    "UNet": UNet,
    "UNet_light": UNetLight,
}


def get_network(network_name: str):
    if network_name not in network_dic:
        raise KeyError(f'Network "{network_name}" is not available!\n '
                       f"Choose from: {get_available_networks()}")
    return network_dic[network_name]


def get_available_networks():
    return tuple(network_dic.keys())


def resolve_model_settings(settings: dict) -> dict:
    """Make JSON-borne model settings constructor-ready: the config
    snapshot stores ``dtype`` as a string ("bfloat16"/"float32"); convert
    to the jnp dtype the Flax modules expect."""
    import jax.numpy as jnp

    out = dict(settings)
    dt = out.get("dtype")
    if isinstance(dt, str):
        out["dtype"] = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                        "float16": jnp.float16}[dt]
    return out
