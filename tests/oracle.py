"""Test oracle: execute the PyTorch reference implementation on CPU to
produce golden values. We import the reference package read-only from
/root/reference (never copying its code into this repo); a stub `timm`
module supplies the two symbols the reference pulls from timm
(trunc_normal_, get_norm_layer) since timm is not installed here.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _install_timm_stub():
    if "timm" in sys.modules and not getattr(sys.modules["timm"], "_is_stub", False):
        return
    import torch.nn as nn

    timm = types.ModuleType("timm")
    timm._is_stub = True
    layers = types.ModuleType("timm.layers")

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        import torch

        with torch.no_grad():
            return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

    def get_norm_layer(name):
        assert name == "layernorm", name
        return nn.LayerNorm

    layers.trunc_normal_ = trunc_normal_
    layers.get_norm_layer = get_norm_layer
    timm.layers = layers
    models = types.ModuleType("timm.models")
    models_layers = types.ModuleType("timm.models.layers")
    models_layers.trunc_normal_ = trunc_normal_
    models_layers.get_norm_layer = get_norm_layer
    models.layers = models_layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.layers"] = layers
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = models_layers


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    try:
        import torchvision  # noqa: F401

        return
    except ImportError:
        pass

    def normalize(tensor, mean, std, inplace=False):
        import torch

        mean = torch.as_tensor(mean, dtype=tensor.dtype, device=tensor.device)
        std = torch.as_tensor(std, dtype=tensor.dtype, device=tensor.device)
        if mean.ndim == 1:
            mean = mean.view(1, -1, 1, 1)
        if std.ndim == 1:
            std = std.view(1, -1, 1, 1)
        return (tensor - mean) / std

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    functional.normalize = normalize
    transforms.functional = functional
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional


def _install_pkg_resources_stub():
    if "pkg_resources" in sys.modules:
        return
    try:
        import pkg_resources  # noqa: F401

        return
    except ImportError:
        pass
    from packaging.version import parse as parse_version

    stub = types.ModuleType("pkg_resources")
    stub.parse_version = parse_version
    sys.modules["pkg_resources"] = stub


def reference_available() -> bool:
    import os

    return os.path.isdir(REFERENCE_ROOT)


def import_reference(module: str):
    """Import a module from the reference repo (e.g. 'torch_utils.ops.upfirdn2d')."""
    _install_timm_stub()
    _install_pkg_resources_stub()
    _install_torchvision_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    return importlib.import_module(module)


def to_nhwc(x) -> np.ndarray:
    """torch NCHW tensor -> numpy NHWC."""
    return np.ascontiguousarray(x.detach().cpu().numpy().transpose(0, 2, 3, 1))


def to_nchw_tensor(x: np.ndarray):
    """numpy NHWC -> torch NCHW tensor."""
    import torch

    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))
