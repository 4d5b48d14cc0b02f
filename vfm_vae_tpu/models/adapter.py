"""LDM adapter: compress multi-level VFM features into the latent z and
decompress back (reference: networks/utils/ldm_utils.py; attention projection
lineage UniTok).

Token-major design: features stay (B, N, D) through the attention
projections (pure MXU matmuls); maps are only formed where spatial structure
matters (pixel unshuffle, VF loss, the z output, NHWC).
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import dot_product_attention
from ..ops.pixelshuffle import pixel_unshuffle
from ..ops.resize import adaptive_avg_pool2d, _adaptive_matrix
from .dataclasses import EncodeOutput
from .distributions import DiagonalGaussianDistribution
from .layers import LayerNormFp32, Linear, l2_normalize, trunc_normal_init, xavier_normal_init
from .quantize import VectorQuantizerM


def tokens_to_map(x: jnp.ndarray) -> jnp.ndarray:
    """(B, N, D) -> (B, s, s, D) with s = sqrt(N)."""
    B, N, D = x.shape
    s = int(math.isqrt(N))
    assert s * s == N, N
    return x.reshape(B, s, s, D)


def map_to_tokens(x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, D = x.shape
    return x.reshape(B, H * W, D)


class PlainAttention(nn.Module):
    """Dimension-changing attention (ldm_utils.py:55-93): qkv with
    (q_bias, 0, v_bias); when in_dim > out_dim the output is the head-mean
    (optionally adaptively pooled to out_dim)."""

    in_dim: int
    out_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, _ = x.shape
        wide = max(self.in_dim, self.out_dim)
        head_dim = wide // self.num_heads

        qkv_w = self.param("qkv", trunc_normal_init(0.02), (self.in_dim, wide * 3))
        q_bias = self.param("q_bias", nn.initializers.zeros, (wide,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (wide,))
        bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])

        variant = os.environ.get("VFM_VAE_ADAPTER_ATTN", "3mm-xla")
        if variant.startswith("3mm"):
            # Three separate (in, wide) matmuls from trace-time slices of the
            # packed weight (checkpoint layout unchanged) — the same pattern
            # as the ViT encoder blocks, which XLA fuses into its fast
            # attention form. The packed single matmul + split was 2x slower
            # in-context: its slice/reshape layout copies showed 0.43 ms/img
            # at B128 (adapter.py split lines in the serving trace).
            w = qkv_w.astype(x.dtype)
            q = x @ w[:, :wide] + q_bias.astype(x.dtype)
            k = x @ w[:, wide:2 * wide]
            v = x @ w[:, 2 * wide:] + v_bias.astype(x.dtype)
            q = q.reshape(B, N, self.num_heads, head_dim)
            k = k.reshape(B, N, self.num_heads, head_dim)
            v = v.reshape(B, N, self.num_heads, head_dim)
            out = dot_product_attention(q, k, v, prefer_flash=variant == "3mm-flash")
        else:
            qkv = x @ qkv_w.astype(x.dtype) + bias.astype(x.dtype)
            # Contiguous last-axis split (the packed layout is [q | k | v]
            # blocks) instead of a (B, N, 3, heads, hd) reshape + middle-dim
            # slices — the latter's strided views knocked XLA into slow
            # layouts for the downstream attention in-context.
            q, k, v = (t.reshape(B, N, self.num_heads, head_dim)
                       for t in jnp.split(qkv, 3, axis=-1))
            out = dot_product_attention(q, k, v, prefer_flash=True)

        if self.in_dim > self.out_dim:
            out = jnp.mean(out, axis=2)  # head mean -> (B, N, hd)
            if head_dim != self.out_dim:
                M = _adaptive_matrix(head_dim, self.out_dim)
                out = out @ jnp.asarray(M.T, out.dtype)
        else:
            out = out.reshape(B, N, wide)
        return Linear(
            self.out_dim, self.out_dim,
            kernel_init=trunc_normal_init(0.02), bias_init=nn.initializers.zeros,
            name="proj",
        )(out)


class GeGluMlp(nn.Module):
    """LN -> gelu_tanh(w0) * w1 -> w2 (ldm_utils.py:96-114)."""

    in_features: int
    hidden_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = LayerNormFp32(self.in_features, eps=1e-6, name="norm")(x)
        a = Linear(self.in_features, self.hidden_features,
                   kernel_init=trunc_normal_init(0.02), bias_init=nn.initializers.zeros,
                   name="w0")(x)
        b = Linear(self.in_features, self.hidden_features,
                   kernel_init=trunc_normal_init(0.02), bias_init=nn.initializers.zeros,
                   name="w1")(x)
        h = jax.nn.gelu(a, approximate=True) * b
        return Linear(self.hidden_features, self.in_features,
                      kernel_init=trunc_normal_init(0.02), bias_init=nn.initializers.zeros,
                      name="w2")(h)


class AttnProjectionBlock(nn.Module):
    """x = proj(norm3(x)) + attn(norm1(x)); x = x + mlp(norm2(x))
    (ldm_utils.py:117-138)."""

    in_dim: int
    out_dim: int
    num_heads: int
    mlp_ratio: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = PlainAttention(self.in_dim, self.out_dim, self.num_heads, name="attn")(
            LayerNormFp32(self.in_dim, name="norm1")(x)
        )
        p = Linear(self.in_dim, self.out_dim,
                   kernel_init=trunc_normal_init(0.02), bias_init=nn.initializers.zeros,
                   name="proj")(
            LayerNormFp32(self.in_dim, name="norm3")(x)
        )
        x = p + h
        x = x + GeGluMlp(self.out_dim, int(self.out_dim * self.mlp_ratio), name="mlp")(
            LayerNormFp32(self.out_dim, name="norm2")(x)
        )
        return x


class AttnProjection(nn.Module):
    """Stack of AttnProjectionBlocks; quant stacks change dim at the END,
    post-quant stacks change dim at the START (ldm_utils.py:140-166)."""

    in_dim: int
    out_dim: int
    num_heads: int
    num_layers: int
    is_quant: bool
    mlp_ratio: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.out_dim % self.in_dim == 0 or self.in_dim % self.out_dim == 0
        for i in range(self.num_layers):
            if self.is_quant:
                din = self.in_dim
                dout = self.in_dim if i < self.num_layers - 1 else self.out_dim
            else:
                din = self.in_dim if i == 0 else self.out_dim
                dout = self.out_dim
            x = AttnProjectionBlock(din, dout, self.num_heads, self.mlp_ratio, name=f"blocks_{i}")(x)
        return x


class EquivarianceTransform:
    """Host-side EQ sampler (ldm_utils.py:491-517). Returns static python
    values; the jitted step is compiled per (scale, angle, prior) bucket —
    a bounded set {0.25,0.5,0.75,1.0} x {0..3} x {prior, latent}."""

    SCALES = (0.25, 0.5, 0.75, 1.0)
    PRIOR_SCALES = (0.25, 0.5, 0.75)

    def __init__(self, apply: bool = False, p_eq_prior: float = 0.5, p_eq_prior_scale: float = 0.25):
        self.apply = apply
        self.p_eq_prior = p_eq_prior
        self.p_eq_prior_scale = p_eq_prior_scale

    def __call__(self, rng: Optional[np.random.Generator] = None, validation: bool = False):
        if not self.apply or validation:
            return 1.0, 0, False
        rng = rng or np.random.default_rng()
        if rng.random() < self.p_eq_prior:
            return float(rng.choice(self.SCALES)), int(rng.integers(0, 4)), False
        if rng.random() < self.p_eq_prior_scale:
            return float(rng.choice(self.PRIOR_SCALES)), 0, True
        return 1.0, 0, True


class LDMAdapter(nn.Module):
    """Compress/decompress neck (ldm_utils.py:199-488)."""

    patch_from_layers: Sequence[int]
    patch_resolutions: Sequence[int]
    patch_in_dimensions: Sequence[int]
    patch_out_dimensions: Sequence[int]
    compression_mode: str  # 'continuous' | 'discrete'
    how_to_compress: str  # 'conv' | 'attnproj'
    how_to_decompress: str  # 'conv' | 'attnproj'
    decompress_factor: int
    attnproj_quant_layers: int = 1
    attnproj_post_quant_layers: int = 1
    z_resolution: int = 16
    z_dimension: int = 32
    vocab_width: int = 64
    vocab_size: int = 32768
    vocab_beta: float = 0.25
    use_entropy_loss: bool = False
    entropy_temp: float = 0.01
    num_codebooks: int = 8
    use_kl_loss: bool = False
    use_vf_loss: bool = False
    use_adaptive_vf_loss: bool = False
    distmat_margin: float = 0.0
    cos_margin: float = 0.0
    distmat_weight: float = 1.0
    cos_weight: float = 1.0

    @property
    def final_in_dimension(self) -> int:
        total = 0
        for res, dout in zip(self.patch_resolutions, self.patch_out_dimensions):
            if res > self.z_resolution:
                total += dout * (res // self.z_resolution) ** 2
            else:
                total += dout
        return total

    @property
    def final_out_dimension(self) -> int:
        return self.z_dimension * 2 if self.compression_mode == "continuous" else self.vocab_width

    def setup(self):
        assert (
            len(self.patch_from_layers)
            == len(self.patch_resolutions)
            == len(self.patch_in_dimensions)
            == len(self.patch_out_dimensions)
        )
        for res in self.patch_resolutions:
            assert res >= self.z_resolution and res % self.z_resolution == 0

        n = len(self.patch_from_layers)
        if self.how_to_compress == "conv":
            self.patch_quants = [
                Linear(  # 1x1 conv on tokens == linear
                    self.patch_in_dimensions[i],
                    self.patch_out_dimensions[i],
                    kernel_init=xavier_normal_init(0.5),
                    bias_init=nn.initializers.zeros,
                    name=f"patch_quant_{i}",
                )
                for i in range(n)
            ]
        else:
            self.patch_quants = [
                AttnProjection(
                    in_dim=self.patch_in_dimensions[i],
                    out_dim=self.patch_out_dimensions[i],
                    num_heads=max(1, self.patch_in_dimensions[i] // self.patch_out_dimensions[i]),
                    num_layers=self.attnproj_quant_layers,
                    is_quant=True,
                    name=f"patch_quant_{i}",
                )
                for i in range(n)
            ]

        if self.how_to_compress == "conv":
            self.final_quant = Linear(
                self.final_in_dimension,
                self.final_out_dimension,
                kernel_init=xavier_normal_init(0.5),
                bias_init=nn.initializers.zeros,
                name="final_quant",
            )
        else:
            self.final_quant = AttnProjection(
                in_dim=self.final_in_dimension,
                out_dim=self.final_out_dimension,
                num_heads=max(1, self.final_in_dimension // self.final_out_dimension),
                num_layers=self.attnproj_quant_layers,
                is_quant=True,
                name="final_quant",
            )

        in_ch = self.z_dimension if self.compression_mode == "continuous" else self.vocab_width
        out_ch = in_ch * self.decompress_factor
        if self.how_to_decompress == "conv":
            self.post_quant = Linear(
                in_ch, out_ch,
                kernel_init=xavier_normal_init(0.5), bias_init=nn.initializers.zeros,
                name="post_quant",
            )
        else:
            self.post_quant = AttnProjection(
                in_dim=in_ch,
                out_dim=out_ch,
                num_heads=max(1, out_ch // in_ch),
                num_layers=self.attnproj_post_quant_layers,
                is_quant=False,
                name="post_quant",
            )

        if self.compression_mode == "discrete":
            self.quantizer = VectorQuantizerM(
                vocab_size=self.vocab_size,
                vocab_width=self.vocab_width,
                beta=self.vocab_beta,
                use_entropy_loss=self.use_entropy_loss,
                entropy_temp=self.entropy_temp,
                num_codebooks=self.num_codebooks,
                name="quantizer",
            )

        if self.use_vf_loss:
            assert -1 in list(self.patch_from_layers)
            vf_dim = self.patch_in_dimensions[list(self.patch_from_layers).index(-1)]
            in_dim = self.z_dimension if self.compression_mode == "continuous" else self.vocab_width
            self.linear_proj = Linear(
                in_dim, vf_dim, use_bias=False,
                kernel_init=xavier_normal_init(0.5), name="linear_proj",
            )

    # -------------------------------------------------------------- VF loss
    def _compute_vf_loss(self, z_map: jnp.ndarray, aux_map: jnp.ndarray) -> jnp.ndarray:
        """Pairwise channel-cosine distance matrix + per-pixel cosine
        (ldm_utils.py:385-395)."""
        z = map_to_tokens(z_map).astype(jnp.float32)  # (B, HW, C)
        aux = map_to_tokens(aux_map).astype(jnp.float32)
        z_n = l2_normalize(z, axis=-1)
        aux_n = l2_normalize(aux, axis=-1)
        z_cos = jnp.einsum("bic,bjc->bij", z_n, z_n)
        aux_cos = jnp.einsum("bic,bjc->bij", aux_n, aux_n)
        diff = jnp.abs(z_cos - aux_cos)
        vf_loss_1 = jnp.mean(jax.nn.relu(diff - self.distmat_margin))
        cos = jnp.sum(z_n * aux_n, axis=-1)
        vf_loss_2 = jnp.mean(jax.nn.relu(1.0 - self.cos_margin - cos))
        return vf_loss_1 * self.distmat_weight + vf_loss_2 * self.cos_weight

    # -------------------------------------------------------------- encode
    def encode(
        self,
        patch_features: List[jnp.ndarray],  # each (B, N_i, D_i)
        rng: Optional[jax.Array] = None,
        return_z_before_quantize: bool = False,
        train: bool = True,
    ) -> EncodeOutput:
        assert len(patch_features) == len(self.patch_quants)
        mids = []
        for x, proj, res in zip(patch_features, self.patch_quants, self.patch_resolutions):
            x = proj(x)  # (B, N, Dout)
            if res > self.z_resolution:
                r = res // self.z_resolution
                x = map_to_tokens(pixel_unshuffle(tokens_to_map(x), r))
            mids.append(x)
        x = jnp.concatenate(mids, axis=-1)
        x = self.final_quant(x)  # (B, z_res^2, final_out)
        x_map = tokens_to_map(x)  # NHWC

        vq_loss = entropy_loss = usages = kl_loss = 0.0
        z_before_quantize = x_map

        if self.compression_mode == "continuous":
            dist = DiagonalGaussianDistribution(x_map)
            if rng is None:
                z = dist.mode()
            else:
                z = dist.sample(rng)
            if self.use_kl_loss:
                kl_loss = jnp.mean(dist.kl())
        else:
            z_tok, vq_loss, entropy_loss, usages = self.quantizer(x, train=train)
            z = tokens_to_map(z_tok)

        vf_loss = 0.0
        if self.use_vf_loss:
            aux = jax.lax.stop_gradient(
                patch_features[list(self.patch_from_layers).index(-1)]
            )
            aux_map = tokens_to_map(aux)
            ht = z.shape[1]
            if aux_map.shape[1] != ht:
                aux_map = adaptive_avg_pool2d(aux_map, (ht, ht))
            z_vf = self.linear_proj(z)
            vf_loss = self._compute_vf_loss(z_vf, aux_map)

        return EncodeOutput(
            z=z_before_quantize if return_z_before_quantize else z,
            vf_loss=vf_loss,
            vf_last_layer=None,  # loss pulls the param by path, see vf_last_layer_path()
            kl_loss=kl_loss,
            vq_loss=vq_loss,
            entropy_loss=entropy_loss,
            codebook_usages=usages,
        )

    def vf_last_layer_path(self) -> Tuple[str, ...]:
        """Param-tree path of the adaptive-VF-loss anchor tensor
        (ldm_utils.py:461-465)."""
        if self.how_to_compress == "conv":
            return ("final_quant", "weight")
        last = self.attnproj_quant_layers - 1
        return ("final_quant", f"blocks_{last}", "mlp", "w2", "weight")

    # -------------------------------------------------------------- decode
    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, z_dim) -> (B, H, W, z_dim * decompress_factor)."""
        B, H, W, _ = z.shape
        t = self.post_quant(map_to_tokens(z))
        return t.reshape(B, H, W, -1)

    # -------------------------------------------------------------- tokens
    def f_to_idx(self, patch_features: List[jnp.ndarray]) -> jnp.ndarray:
        out = self.encode(patch_features, rng=None, return_z_before_quantize=True, train=False)
        tokens = map_to_tokens(out.z)
        return self.quantizer.f_to_idx(tokens)
