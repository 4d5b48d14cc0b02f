"""Class registry: explicit replacement for the reference's dotted-name
dynamic construction (dnnlib/util.py:301 ``construct_class_by_name``).

Reference YAML configs name torch classes (e.g. ``networks.generator.Generator``);
we keep those configs loadable by aliasing the reference names onto the TPU
implementations, so a user can point ``train.py`` at an unmodified reference
YAML and get the equivalent TPU component.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

_REGISTRY: Dict[str, str] = {}

# Reference class_name -> our implementation (module:attr), resolved lazily to
# avoid import cycles and to keep `import vfm_vae_tpu` light.
_ALIASES: Dict[str, str] = {
    "networks.generator.Generator": "vfm_vae_tpu.models.generator:Generator",
    "networks.discriminator.ProjectedDiscriminator": "vfm_vae_tpu.models.discriminator:ProjectedDiscriminator",
    "training.loss.TotalLoss": "vfm_vae_tpu.train.loss:TotalLoss",
    "training.data_wds.WdsWrapper": "vfm_vae_tpu.data.wds:WdsWrapper",
    "training.data_zip.ImageFolderDataset": "vfm_vae_tpu.data.zipfolder:ImageFolderDataset",
    "torch.optim.Adam": "vfm_vae_tpu.train.optim:Adam",
}


def register(name: str) -> Callable:
    """Decorator: register a class/function under ``name``."""

    def deco(obj):
        _REGISTRY[name] = obj
        return obj

    return deco


def get_class_by_name(name: str) -> Any:
    if name in _REGISTRY:
        return _REGISTRY[name]
    target = _ALIASES.get(name)
    if target is None:
        # Allow direct module:attr or dotted paths into our own package.
        target = name
    if ":" in target:
        mod_name, attr = target.split(":")
    else:
        mod_name, _, attr = target.rpartition(".")
    mod = importlib.import_module(mod_name)
    obj = getattr(mod, attr)
    _REGISTRY[name] = obj
    return obj


def construct_class_by_name(*args, class_name: str, **kwargs) -> Any:
    """Build an instance from a config's class_name (reference: dnnlib/util.py:301)."""
    return get_class_by_name(class_name)(*args, **kwargs)
