"""VFM-VAE Generator: frozen VFM encoder -> LDM adapter -> mapping ->
synthesis (reference: networks/generator.py:915-1206).

Functional facade: `__call__` is the training forward (EQ transform values
arrive as *static* host-sampled arguments -> one compiled variant per EQ
bucket), `encode`/`decode` are the tokenizer inference API
(generator.py:1130-1150).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import adaptive_avg_pool2d, resize_bilinear, rot90_traced
from .adapter import EquivarianceTransform, LDMAdapter
from .dataclasses import EncodeOutput, GeneratorForwardOutput
from .synthesis import MappingNetwork, SynthesisNetwork, synthesis_channels
from .vfm import VFMEncoder


class Generator(nn.Module):
    # Conditioning.
    conditional: bool = False
    label_type: str = "cls2text"
    label_dim: Optional[int] = 0
    # VFM.
    vfm_name: str = "siglip2-large-patch16-512"
    scale_factor: float = 2.0
    patch_from_layers: Sequence[int] = (0, 12, -1)
    patch_in_dimensions: Sequence[int] = (1024, 1024, 1024)
    patch_out_dimensions: Sequence[int] = (64, 64, 64)
    # Compression.
    compression_mode: str = "continuous"
    how_to_compress: str = "attnproj"
    how_to_decompress: str = "attnproj"
    decompress_factor: int = 16
    attnproj_quant_layers: int = 1
    attnproj_post_quant_layers: int = 1
    # Latent.
    resolution_compression_factor: int = 16
    z_dimension: int = 32
    vocab_width: int = 64
    z_pooled_resolution: int = 1
    z_dim_for_mapping_mlp_output: int = 128
    # VQ.
    vocab_size: int = 32768
    vocab_beta: float = 0.25
    use_entropy_loss: bool = False
    entropy_temp: float = 0.01
    num_codebooks: int = 8
    # Losses.
    use_kl_loss: bool = False
    use_vf_loss: bool = False
    use_adaptive_vf_loss: bool = False
    distmat_margin: float = 0.0
    cos_margin: float = 0.0
    distmat_weight: float = 1.0
    cos_weight: float = 1.0
    # Concat z.
    concat_z_block_indices: Sequence[int] = ()
    concat_z_mapped_dims: Sequence[int] = ()
    how_to_process_concat_z: str = "unshuffle"
    activation_for_concat_z: str = "gelu"
    # Architecture.
    use_multiscale_output: bool = True
    attn_block_indices: Sequence[int] = ()
    attn_depths: Sequence[int] = ()
    use_self_attn: bool = True
    use_cross_attn: bool = False
    use_convnext: bool = True
    use_gaussian_blur: bool = True
    add_additional_convnext: bool = True
    # EQ regularization.
    use_equivariance_regularization: bool = False
    equivariance_regularization_p_prior: float = 0.5
    equivariance_regularization_p_prior_scale: float = 0.25
    # Output.
    img_resolution: int = 256
    img_channels: int = 3
    # Training.
    train_mode: str = "train_all"
    num_blocks: int = 6
    num_fp16_res: int = 3
    conv_clamp: Optional[float] = 256
    legacy: bool = False
    synthesis_kwargs: Dict[str, Any] = None
    compute_dtype: Any = jnp.float32
    remat: Any = False  # rematerialize ViT + ConvNeXt blocks (training memory).
    # Bool or a decoder policy string ("full"/"dots"/"names", see
    # synthesis.remat_layer); the ViT tower treats any truthy value as
    # blanket per-block remat (no named residuals there to select on).

    # ------------------------------------------------------------ derived

    @property
    def z_resolution(self) -> int:
        return int(self.img_resolution // self.resolution_compression_factor)

    @property
    def z_dim(self) -> int:
        return self.z_dimension if self.compression_mode == "continuous" else self.vocab_width

    @property
    def z_dim_for_mapping(self) -> int:
        return self.z_dim * self.decompress_factor * self.z_pooled_resolution**2

    @property
    def z_dim_for_concatenated(self) -> int:
        return self.z_dim * self.decompress_factor

    @property
    def c_dim(self) -> int:
        if not self.conditional:
            return 0
        if self.label_type in ("text", "cls2text"):
            from .vfm import vfm_preset

            return vfm_preset(self.vfm_name)["text_hidden_size"]
        return int(self.label_dim or 0)

    @property
    def w_dim(self) -> int:
        if self.conditional and self.label_type in ("text", "cls2text"):
            return self.z_dim_for_mapping_mlp_output + self.c_dim
        return self.z_dim_for_mapping_mlp_output

    @property
    def z_dim_for_mapping_mlp_input(self) -> int:
        if self.conditional and self.label_type == "cls2id":
            return self.z_dim_for_mapping  # embed concat handled in mapping
        return self.z_dim_for_mapping

    @property
    def num_ws(self) -> int:
        return self._synthesis_def().num_ws

    @property
    def block_resolutions(self) -> List[int]:
        return synthesis_channels(
            self.img_resolution, self.num_blocks,
            (self.synthesis_kwargs or {}).get("channel_base", 32768),
            (self.synthesis_kwargs or {}).get("channel_max", 512),
        )[0]

    def _synthesis_def(self, name: Optional[str] = None) -> SynthesisNetwork:
        sk = dict(self.synthesis_kwargs or {})
        return SynthesisNetwork(
            c_dim=self.c_dim,
            w_dim=self.w_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            channel_base=sk.get("channel_base", 32768),
            channel_max=sk.get("channel_max", 512),
            num_res_blocks=sk.get("num_res_blocks", 3),
            architecture=sk.get("architecture", "skip"),
            num_fp16_res=self.num_fp16_res,
            conv_clamp=self.conv_clamp,
            num_blocks=self.num_blocks,
            z_resolution=self.z_resolution,
            z_dim=self.z_dim_for_concatenated,
            concat_z_block_indices=self.concat_z_block_indices,
            concat_z_mapped_dims=self.concat_z_mapped_dims,
            how_to_process_concat_z=self.how_to_process_concat_z,
            activation_for_concat_z=self.activation_for_concat_z,
            use_multiscale_output=self.use_multiscale_output,
            attn_block_indices=self.attn_block_indices,
            attn_depths=self.attn_depths,
            use_self_attn=self.use_self_attn,
            use_cross_attn=self.use_cross_attn,
            use_convnext=self.use_convnext,
            use_gaussian_blur=self.use_gaussian_blur,
            add_additional_convnext=self.add_additional_convnext,
            legacy=self.legacy,
            compute_dtype=self.compute_dtype,
            remat=self.remat,
            name=name,
        )

    def setup(self):
        self.vfm_encoder = VFMEncoder(
            model_name=self.vfm_name,
            scale_factor=self.scale_factor,
            patch_from_layers=self.patch_from_layers,
            conditional=self.conditional,
            label_type=self.label_type,
            compute_dtype=self.compute_dtype,
            remat=bool(self.remat),
            name="vfm_encoder",
        )
        patch_res = int(self.img_resolution * self.scale_factor // self.vfm_encoder.patch_size)
        assert self.img_resolution * self.scale_factor % self.vfm_encoder.patch_size == 0
        self.patch_resolutions = [patch_res for _ in self.patch_from_layers]

        self.ldm_adapter = LDMAdapter(
            patch_from_layers=self.patch_from_layers,
            patch_resolutions=self.patch_resolutions,
            patch_in_dimensions=self.patch_in_dimensions,
            patch_out_dimensions=self.patch_out_dimensions,
            compression_mode=self.compression_mode,
            how_to_compress=self.how_to_compress,
            how_to_decompress=self.how_to_decompress,
            decompress_factor=self.decompress_factor,
            attnproj_quant_layers=self.attnproj_quant_layers,
            attnproj_post_quant_layers=self.attnproj_post_quant_layers,
            z_resolution=self.z_resolution,
            z_dimension=self.z_dimension,
            vocab_width=self.vocab_width,
            vocab_size=self.vocab_size,
            vocab_beta=self.vocab_beta,
            use_entropy_loss=self.use_entropy_loss,
            entropy_temp=self.entropy_temp,
            num_codebooks=self.num_codebooks,
            use_kl_loss=self.use_kl_loss,
            use_vf_loss=self.use_vf_loss,
            use_adaptive_vf_loss=self.use_adaptive_vf_loss,
            distmat_margin=self.distmat_margin,
            cos_margin=self.cos_margin,
            distmat_weight=self.distmat_weight,
            cos_weight=self.cos_weight,
            name="ldm_adapter",
        )
        self.mapping = MappingNetwork(
            z_dim_input=self.z_dim_for_mapping_mlp_input,
            z_dim_output=self.z_dim_for_mapping_mlp_output,
            c_dim=self.c_dim,
            w_dim=self.w_dim,
            label_type=self.label_type,
            num_ws=self._synthesis_def().num_ws,
            name="mapping",
        )
        self.synthesis = self._synthesis_def(name="synthesis")

    # ------------------------------------------------------------ helpers

    def _map_and_synthesize(
        self, z: jnp.ndarray, c, truncation_psi: float, train: bool
    ):
        z_pooled = adaptive_avg_pool2d(
            z, (self.z_pooled_resolution, self.z_pooled_resolution)
        ).reshape(z.shape[0], -1)
        if self.conditional and self.label_type in ("text", "cls2text"):
            fine_text, global_text, text_mask = self.vfm_encoder.encode_text(c)
            ws = self.mapping(z_pooled, global_text, truncation_psi=truncation_psi, train=train)
            img, ms = self.synthesis(z, ws, fine_text, text_mask)
            return img, ms, global_text
        ws = self.mapping(z_pooled, c, truncation_psi=truncation_psi, train=train)
        img, ms = self.synthesis(z, ws, None, None)
        return img, ms, None

    # ------------------------------------------------------------ forward

    def __call__(
        self,
        img: jnp.ndarray,  # (B, H, W, 3) in [0, 1]
        c=None,
        rng: Optional[jax.Array] = None,
        eq: Tuple[float, int, bool] = (1.0, 0, False),  # host-sampled EQ bucket
        truncation_psi: float = 1.0,
        validation: bool = False,
        train: bool = True,
    ) -> GeneratorForwardOutput:
        eq_scale_factor, eq_angle_factor, is_eq_prior = eq
        # need_pooled=True even though forward drops it: the MAP-head params
        # must exist in the tree (tools use them), and XLA dead-code
        # eliminates the unused head compute.
        patch_features, _ = self.vfm_encoder.encode_image(
            img,
            eq_scale_factor=eq_scale_factor if is_eq_prior else 1.0,
            is_eq_prior=is_eq_prior,
            need_pooled=True,
        )
        ldm_out: EncodeOutput = self.ldm_adapter.encode(patch_features, rng=rng, train=train)
        z = ldm_out.z

        # Latent-side EQ (generator.py:1167-1170), training only. The angle
        # may be a traced int32 (EQ angle folding: one compiled step covers
        # all four rot90 buckets) — rot90_traced handles both.
        if not validation and not is_eq_prior:
            if eq_scale_factor != 1.0:
                z = resize_bilinear(z, scale_factor=eq_scale_factor)
            # torch.rot90(z, k, dims=[-1,-2]) on NCHW == rot in (W,H).
            z = rot90_traced(z, eq_angle_factor, axes=(2, 1))

        z = self.ldm_adapter.decode(z)
        gen_img, gen_ms, global_text = self._map_and_synthesize(z, c, truncation_psi, train)

        return GeneratorForwardOutput(
            gen_img=gen_img,
            gen_multiscale_imgs=gen_ms,
            vf_loss=ldm_out.vf_loss,
            vf_last_layer=None,
            kl_loss=ldm_out.kl_loss,
            vq_loss=ldm_out.vq_loss,
            entropy_loss=ldm_out.entropy_loss,
            codebook_usages=ldm_out.codebook_usages,
            eq_scale_factor=eq_scale_factor,
            eq_angle_factor=eq_angle_factor,
            global_text_tokens=global_text,
        )

    # ------------------------------------------------------------ tokenizer API

    def encode(
        self,
        img: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        return_z_before_quantize: bool = False,
        eq_scale_factor: float = 1.0,
        is_eq_prior: bool = False,
    ) -> jnp.ndarray:
        """Image -> latent z, (B, zh, zw, z_dim) NHWC (generator.py:1130-1134).
        Pass `rng` to sample the posterior (reference always samples); omit
        for the deterministic mode/mean."""
        patch_features, _ = self.vfm_encoder.encode_image(
            img, eq_scale_factor=eq_scale_factor, is_eq_prior=is_eq_prior, need_pooled=True
        )
        out = self.ldm_adapter.encode(
            patch_features, rng=rng, return_z_before_quantize=return_z_before_quantize,
            train=False,
        )
        return out.z

    def decode(self, z: jnp.ndarray, c=None, truncation_psi: float = 1.0) -> jnp.ndarray:
        """Latent z -> image in [-1, 1] (generator.py:1137-1150)."""
        z = self.ldm_adapter.decode(z)
        img, _, _ = self._map_and_synthesize(z, c, truncation_psi, train=False)
        return img


# ---------------------------------------------------------------- freezing


def trainable_path_predicates(
    train_mode: str,
    conditional: bool = False,
    label_type: str = "cls2text",
    block_resolutions: Sequence[int] = (),
    concat_z_block_indices: Sequence[int] = (),
) -> List[str]:
    """Prefixes of trainable param paths per train_mode
    (generator.py:1100-1128). The VFM tower is never trainable.

    Note: for 'train_the_second_half_decoder' the reference builds names
    like 'synthesis.b{res}' / 'z_convs.{res}' that do not match its own
    module names (latent no-op); we implement the documented intent —
    blocks and z-injectors whose output resolution exceeds 32px.
    """
    if train_mode == "train_all":
        layers = ["synthesis", "mapping/mlp", "ldm_adapter"]
        if conditional and label_type == "cls2id":
            layers.append("mapping/embed")
    elif train_mode == "train_text_encoder":
        layers = ["clip"]
    elif train_mode == "train_decoder":
        layers = ["synthesis", "mapping/mlp", "ldm_adapter/post_quant"]
        if conditional and label_type == "cls2id":
            layers.append("mapping/embed")
    elif train_mode == "train_the_second_half_decoder":
        layers = []
        for idx, res in enumerate(block_resolutions):
            if res > 32:
                layers.append(f"synthesis/b{idx}")
                if idx in concat_z_block_indices:
                    layers.append(f"synthesis/z_convs_{idx}")
    else:
        raise ValueError(f"Unknown train_mode {train_mode}")
    return layers


def trainable_mask(params, predicates: Sequence[str]):
    """Bool pytree for optax.masked: True where the param path starts with
    one of the predicate prefixes (and never inside the frozen VFM)."""
    import flax.traverse_util as tu

    flat_params = tu.flatten_dict(params, sep="/")
    mask_flat = {}
    for key in flat_params:
        trainable = any(key == p or key.startswith(p + "/") for p in predicates)
        if key.startswith("vfm_encoder/"):
            trainable = False
        mask_flat[key] = trainable
    return tu.unflatten_dict(mask_flat, sep="/")
