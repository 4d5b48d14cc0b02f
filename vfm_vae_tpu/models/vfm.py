"""Frozen vision-foundation-model encoder facade.

Reference: networks/utils/vfm_utils.py (dispatch by name substring,
layer-index convention) + vfms/siglip2_utils.py (preprocessing: optional
EQ-prior antialiased downscale -> scale_factor bilinear resize -> normalize
mean/std 0.5). DINOv2 / MAE / EVA / Qwen towers plug into the same dispatch
as they land (SURVEY.md section 2.3 rows).

The tower runs frozen: outputs are wrapped in stop_gradient and its params
are masked out of the optimizer (train/optim.py), mirroring requires_grad_(False).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_bilinear
from .vit import SigLIPVisionTower

# Known tower geometries (config.json values of the HF checkpoints the
# reference names in configs/*.yaml:36; hardcoded so the framework does not
# need HF hub access at build time).
VFM_PRESETS: Dict[str, Dict[str, Any]] = {
    "siglip2-large-patch16-512": dict(
        hidden_size=1024, num_layers=24, num_heads=16, mlp_dim=4096,
        patch_size=16, image_size=512, text_hidden_size=1024,
    ),
    "siglip2-large-patch16-256": dict(
        hidden_size=1024, num_layers=24, num_heads=16, mlp_dim=4096,
        patch_size=16, image_size=256, text_hidden_size=1024,
    ),
    "siglip2-base-patch16-256": dict(
        hidden_size=768, num_layers=12, num_heads=12, mlp_dim=3072,
        patch_size=16, image_size=256, text_hidden_size=768,
    ),
    "siglip2-so400m-patch16-512": dict(
        hidden_size=1152, num_layers=27, num_heads=16, mlp_dim=4304,
        patch_size=16, image_size=512, text_hidden_size=1152,
    ),
    "dinov2-large": dict(
        hidden_size=1024, num_layers=24, num_heads=16, mlp_dim=4096,
        patch_size=14, image_size=518, text_hidden_size=1024,
    ),
    "dinov2-base": dict(
        hidden_size=768, num_layers=12, num_heads=12, mlp_dim=3072,
        patch_size=14, image_size=518, text_hidden_size=768,
    ),
    "vit-mae-large": dict(
        hidden_size=1024, num_layers=24, num_heads=16, mlp_dim=4096,
        patch_size=16, image_size=224, text_hidden_size=1024,
    ),
    "vit-mae-base": dict(
        hidden_size=768, num_layers=12, num_heads=12, mlp_dim=3072,
        patch_size=16, image_size=224, text_hidden_size=768,
    ),
    "eva02-large-patch14-448": dict(
        hidden_size=1024, num_layers=24, num_heads=16, mlp_dim=2730,
        patch_size=14, image_size=448, text_hidden_size=1024,
    ),
    # The reference wrapper's default model (eva_utils.py:19).
    "eva02-large-patch14-clip-336": dict(
        hidden_size=1024, num_layers=24, num_heads=16, mlp_dim=2730,
        patch_size=14, image_size=336, text_hidden_size=1024,
    ),
    "eva02-base-patch14-448": dict(
        hidden_size=768, num_layers=12, num_heads=12, mlp_dim=2048,
        patch_size=14, image_size=448, text_hidden_size=768,
    ),
    "qwen2.5-vl-7b": dict(
        hidden_size=1280, num_layers=32, num_heads=16, mlp_dim=3420,
        patch_size=14, image_size=0, text_hidden_size=3584,
        out_hidden_size=3584, temporal_patch_size=2, spatial_merge_size=2,
        window_size=112, fullatt_block_indexes=(7, 15, 23, 31),
    ),
}

# Per-family preprocessing constants (siglip2_utils.py:62-63,
# dinov2_utils.py:54-57).
VFM_NORMALIZATION = {
    "siglip": ([0.5, 0.5, 0.5], [0.5, 0.5, 0.5]),
    "qwen": ([0.48145466, 0.4578275, 0.40821073], [0.26862954, 0.26130258, 0.27577711]),
    "dinov2": ([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    "mae": ([0.485, 0.456, 0.406], [0.229, 0.224, 0.225]),
    "eva": ([0.48145466, 0.4578275, 0.40821073], [0.26862954, 0.26130258, 0.27577711]),
}

VFM2INTERPOLATION = {
    "siglip": "bilinear",
    "qwen": "bicubic",
    "dino": "bicubic",
    "mae": "bilinear",
    "eva": "bicubic",
}


def infer_patch_size(model_name: str, default: int = 16) -> int:
    m = re.search(r"patch(\d+)", model_name.lower())
    return int(m.group(1)) if m else default


def vfm_family(model_name: str) -> str:
    n = model_name.lower()
    for fam in ("qwen", "siglip", "dinov2", "mae", "eva"):
        if fam in n:
            return "siglip" if fam == "siglip" else fam
    raise ValueError(f"unknown VFM family for {model_name!r}")


def vfm_preset(model_name: str) -> Dict[str, Any]:
    base = model_name.rstrip("/").split("/")[-1].lower()
    for key, preset in VFM_PRESETS.items():
        if key in base:
            return preset
    # Fall back to a local HF config.json if the name is a path.
    import json
    import os

    cfg_path = os.path.join(model_name, "config.json")
    if os.path.isfile(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
        v = cfg.get("vision_config", cfg)
        mlp_dim = v.get("intermediate_size")
        if mlp_dim is None:  # dinov2 configs use mlp_ratio instead
            mlp_dim = int(v["hidden_size"] * v.get("mlp_ratio", 4))
        return dict(
            hidden_size=v["hidden_size"],
            num_layers=v["num_hidden_layers"],
            num_heads=v["num_attention_heads"],
            mlp_dim=mlp_dim,
            patch_size=v["patch_size"],
            image_size=v["image_size"],
            text_hidden_size=cfg.get("text_config", {}).get("hidden_size", v["hidden_size"]),
        )
    raise ValueError(f"no preset or local config for VFM {model_name!r}")


class VFMEncoder(nn.Module):
    """Dispatching frozen encoder (vfm_utils.py:26-123)."""

    model_name: str
    scale_factor: float
    patch_from_layers: Sequence[int]
    conditional: bool = False
    label_type: str = "cls2text"
    compute_dtype: Any = jnp.float32
    remat: bool = False

    @property
    def family(self) -> str:
        return vfm_family(self.model_name)

    @property
    def preset(self) -> Dict[str, Any]:
        return vfm_preset(self.model_name)

    @property
    def patch_size(self) -> int:
        return self.preset["patch_size"]

    @property
    def text_hidden_size(self) -> int:
        return self.preset["text_hidden_size"]

    @property
    def has_cls_prefix(self) -> bool:
        return self.family in ("dinov2", "mae", "eva")

    def setup(self):
        fam = self.family
        p = self.preset
        common = dict(
            hidden_size=p["hidden_size"],
            num_layers=p["num_layers"],
            num_heads=p["num_heads"],
            mlp_dim=p["mlp_dim"],
            patch_size=p["patch_size"],
            image_size=p["image_size"],
            name="tower",
        )
        if fam == "siglip":
            self.tower = SigLIPVisionTower(remat=self.remat, **common)
        elif fam == "dinov2":
            from .vit import Dinov2Tower

            self.tower = Dinov2Tower(**common)
        elif fam == "mae":
            from .vit import MAETower

            self.tower = MAETower(**common)
        elif fam == "eva":
            from .eva import EVATower

            # Paper-derived rope constants are config knobs (PARITY.md §2.3);
            # presets/local configs may override them for divergent ckpts.
            self.tower = EVATower(
                rope_temperature=p.get("rope_temperature", 10000.0),
                rope_ref_grid=p.get("rope_ref_grid"),
                **common,
            )
        elif fam == "qwen":
            from .qwen import QwenVisionTower

            self.tower = QwenVisionTower(
                hidden_size=p["hidden_size"],
                depth=p["num_layers"],
                num_heads=p["num_heads"],
                mlp_dim=p["mlp_dim"],
                out_hidden_size=p["out_hidden_size"],
                patch_size=p["patch_size"],
                temporal_patch_size=p.get("temporal_patch_size", 2),
                spatial_merge_size=p.get("spatial_merge_size", 2),
                window_size=p.get("window_size", 112),
                fullatt_block_indexes=tuple(p.get("fullatt_block_indexes", (7, 15, 23, 31))),
                name="tower",
            )
        else:
            raise NotImplementedError(
                f"VFM family {fam!r} tower not yet implemented in the TPU build"
            )
        if fam == "siglip" and self.conditional and self.label_type in ("text", "cls2text"):
            from .vit import SigLIPTextTower

            self.text_tower = SigLIPTextTower(
                hidden_size=p["text_hidden_size"],
                num_layers=p["num_layers"],
                num_heads=p["num_heads"],
                mlp_dim=p["mlp_dim"],
                name="text_tower",
            )

    def _hidden_indices(self) -> List[int]:
        """Map patch_from_layers (vfm_utils.py:31-38) to hidden-state
        indices; -1 means post-LN final sequence (handled separately)."""
        n = self.preset["num_layers"]
        idxs = []
        for i in self.patch_from_layers:
            if i == -1:
                continue
            idxs.append(i if i >= 0 else n + (i + 1))
        return idxs

    def preprocess(
        self, img: jnp.ndarray, eq_scale_factor: float = 1.0, is_eq_prior: bool = False
    ) -> jnp.ndarray:
        """[0,1] NHWC -> model input (siglip2_utils.py:94-110 bilinear,
        dinov2_utils.py:77-95 bicubic; VFM2INTERPOLATION table)."""
        import numpy as np

        from ..ops.resize import resize_bicubic

        resize = resize_bicubic if VFM2INTERPOLATION.get(self.family) == "bicubic" else resize_bilinear
        if is_eq_prior and eq_scale_factor < 1.0:
            img = resize(img, scale_factor=eq_scale_factor, antialias=True)
        if self.scale_factor != 1.0:
            img = resize(
                img, scale_factor=self.scale_factor, antialias=(self.scale_factor < 1.0)
            )
        mean, std = VFM_NORMALIZATION.get(self.family, ([0.5] * 3, [0.5] * 3))
        mean = jnp.asarray(np.asarray(mean, np.float32))
        std = jnp.asarray(np.asarray(std, np.float32))
        return (img - mean) / std

    def encode_image(
        self,
        img: jnp.ndarray,  # (B, H, W, 3) float in [0,1]
        eq_scale_factor: float = 1.0,
        is_eq_prior: bool = False,
        need_pooled: bool = True,
    ) -> Tuple[List[jnp.ndarray], Optional[jnp.ndarray]]:
        x = self.preprocess(img, eq_scale_factor, is_eq_prior)
        x = x.astype(self.compute_dtype)
        # Frozen tower: optional int8 serving path (ops/quantized.py).
        # Opt-in via VFM_VAE_INT8_VFM=1 OR an already-active caller scope —
        # int8_linear_scope(int8_vfm_enabled()) alone silently DISABLED a
        # caller's scope (the round-2 'int8 e2e unchanged' A/B measured a
        # bf16 tower because of exactly that; only the unmirrored adapter
        # Linears quantized, which is where its 1.6% drift came from).
        from ..ops.quantized import int8_vfm_enabled
        from .layers import _INT8_SCOPE, int8_linear_scope

        tower_int8 = int8_vfm_enabled() or _INT8_SCOPE[0]
        if self.family == "qwen":
            with int8_linear_scope(tower_int8):
                return self._encode_image_qwen(x)
        collect = self._hidden_indices()
        with int8_linear_scope(tower_int8):
            hs, last, pooled = self.tower(
                x, collect=collect, interpolate_pos_encoding=True, need_pooled=need_pooled
            )
        n = self.preset["num_layers"]
        feats = []
        for i in self.patch_from_layers:
            f = last if i == -1 else hs[i if i >= 0 else n + (i + 1)]
            if self.has_cls_prefix:
                f = f[:, 1:]  # strip CLS (dinov2_utils.py:119-126)
            feats.append(f)
        # Frozen backbone: fp32 outputs, no grads (siglip2_utils.py:114-137).
        feats = [jax.lax.stop_gradient(f.astype(jnp.float32)) for f in feats]
        pooled = (
            jax.lax.stop_gradient(pooled.astype(jnp.float32)) if pooled is not None else None
        )
        return feats, pooled

    def _encode_image_qwen(self, x):
        """Qwen path (qwen_utils.py:205-261): manual patchify, per-block
        hook features in window order, merger output as layer -1, mean-pooled
        global token."""
        from .qwen import qwen_patchify

        p = self.preset
        patches, grid = qwen_patchify(
            x, p["patch_size"], p.get("temporal_patch_size", 2), p.get("spatial_merge_size", 2)
        )
        n = p["num_layers"]
        collect = [i if i >= 0 else n + (i + 1) for i in self.patch_from_layers if i != -1]
        hidden, merged, pooled = self.tower(patches, grid, collect=collect)
        feats = []
        for i in self.patch_from_layers:
            f = merged if i == -1 else hidden[i if i >= 0 else n + (i + 1)]
            feats.append(jax.lax.stop_gradient(f.astype(jnp.float32)))
        return feats, jax.lax.stop_gradient(pooled.astype(jnp.float32))

    def encode_text(self, text):
        """Text branch (siglip2_utils.py:139-164): takes PRE-TOKENIZED input
        {'input_ids': (B, 64) int32, 'attention_mask': (B, 64)} produced by
        data/tokenize.py (the host-side tokenizer; padding='max_length' 64).
        Returns (fine_tokens, pooled, bool_mask); None triple when the
        config is unconditional."""
        if not (self.conditional and self.label_type in ("text", "cls2text")):
            return None, None, None
        assert isinstance(text, dict) and "input_ids" in text, (
            "conditional text path expects tokenized {'input_ids', 'attention_mask'}"
        )
        ids = text["input_ids"].astype(jnp.int32)
        seq, pooled = self.text_tower(ids)
        seq = jax.lax.stop_gradient(seq.astype(jnp.float32))
        pooled = jax.lax.stop_gradient(pooled.astype(jnp.float32))
        mask = text.get("attention_mask")
        mask = mask.astype(bool) if mask is not None else jnp.ones(ids.shape, bool)
        return seq, pooled, mask
