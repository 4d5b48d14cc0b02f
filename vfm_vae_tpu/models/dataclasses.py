"""Structured model outputs (reference: networks/utils/dataclasses.py:16,56,108)
as pytree-compatible flax struct dataclasses, so they flow through jit."""

from __future__ import annotations

from typing import Any, List, Optional

import flax.struct


@flax.struct.dataclass
class EncodeOutput:
    z: Any
    vf_loss: Any = 0.0
    vf_last_layer: Any = None
    kl_loss: Any = 0.0
    vq_loss: Any = 0.0
    entropy_loss: Any = 0.0
    codebook_usages: Any = 0.0


@flax.struct.dataclass
class GeneratorForwardOutput:
    gen_img: Any
    gen_multiscale_imgs: List[Any]
    vf_loss: Any = 0.0
    vf_last_layer: Any = None
    kl_loss: Any = 0.0
    vq_loss: Any = 0.0
    entropy_loss: Any = 0.0
    codebook_usages: Any = 0.0
    eq_scale_factor: Any = flax.struct.field(pytree_node=False, default=1.0)
    eq_angle_factor: Any = flax.struct.field(pytree_node=False, default=0)
    global_text_tokens: Optional[Any] = None


@flax.struct.dataclass
class DiscriminatorForwardOutput:
    stylegan_t_logits: Optional[Any] = None
    patchgan_logits: Optional[Any] = None
    patchgan_features: Optional[Any] = None
