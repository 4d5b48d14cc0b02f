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


def _mk_module(name: str) -> types.ModuleType:
    """Stub module with a valid __spec__ (importlib.util.find_spec chokes
    on spec-less modules, which transformers probes for timm)."""
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def _install_timm_stub():
    if "timm" in sys.modules and not getattr(sys.modules["timm"], "_is_stub", False):
        return
    import torch.nn as nn

    timm = _mk_module("timm")
    timm._is_stub = True
    layers = _mk_module("timm.layers")

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
    data = _mk_module("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    timm.data = data
    sys.modules["timm.data"] = data

    def create_model(*args, **kwargs):
        raise RuntimeError("timm stub: no pretrained models available offline")

    timm.create_model = create_model
    models = _mk_module("timm.models")
    models_layers = _mk_module("timm.models.layers")
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

    tv = _mk_module("torchvision")
    transforms = _mk_module("torchvision.transforms")
    functional = _mk_module("torchvision.transforms.functional")
    functional.normalize = normalize
    transforms.functional = functional

    class Normalize:
        def __init__(self, mean, std):
            self.mean, self.std = mean, std

        def __call__(self, tensor):
            return normalize(tensor, list(self.mean), list(self.std))

    class RandomCrop:
        def __init__(self, size):
            self.size = size

        def __call__(self, img):
            import random

            h, w = img.shape[-2:]
            th = tw = self.size if isinstance(self.size, int) else self.size[0]
            i = random.randint(0, h - th)
            j = random.randint(0, w - tw)
            return img[..., i : i + th, j : j + tw]

    transforms.Normalize = Normalize
    transforms.RandomCrop = RandomCrop
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional


def _install_torchaudio_stub():
    if "torchaudio" in sys.modules:
        return
    try:
        import torchaudio  # noqa: F401

        return
    except ImportError:
        pass
    import torch

    ta = _mk_module("torchaudio")
    functional = _mk_module("torchaudio.functional")

    def edit_distance(seq1, seq2):
        a = [int(x) for x in seq1]
        b = [int(x) for x in seq2]
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev = dp[0]
            dp[0] = i
            for j in range(1, len(b) + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return torch.tensor(float(dp[-1]))

    functional.edit_distance = edit_distance
    ta.functional = functional
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.functional"] = functional


def _install_pkg_resources_stub():
    if "pkg_resources" in sys.modules:
        return
    try:
        import pkg_resources  # noqa: F401

        return
    except ImportError:
        pass
    from packaging.version import parse as parse_version

    stub = _mk_module("pkg_resources")
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
    _install_torchaudio_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib
    import os

    top = module.split(".")[0]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.isdir(os.path.join(repo_root, top)):
        # Name collision between a reference package and one of our own
        # top-level directories (e.g. `tools`): whichever got imported first
        # wins the sys.modules cache, so the dotted import is test-order
        # dependent. Load the reference file directly under a mangled module
        # name instead. (Only safe for leaf modules without sibling imports,
        # which is all we use this path for.)
        path = os.path.join(REFERENCE_ROOT, *module.split(".")) + ".py"
        spec = importlib.util.spec_from_file_location("_ref_" + module.replace(".", "_"), path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    return importlib.import_module(module)


def to_nhwc(x) -> np.ndarray:
    """torch NCHW tensor -> numpy NHWC."""
    return np.ascontiguousarray(x.detach().cpu().numpy().transpose(0, 2, 3, 1))


def to_nchw_tensor(x: np.ndarray):
    """numpy NHWC -> torch NCHW tensor."""
    import torch

    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))
