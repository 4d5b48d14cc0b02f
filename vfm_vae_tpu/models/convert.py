"""Torch-checkpoint -> JAX-pytree weight converters.

Layout rules (cf. models/layers.py):
  torch Linear  (out, in)        -> ours (in, out)        : W.T
  torch Conv2d  (O, I, kh, kw)   -> ours HWIO (kh,kw,I,O) : transpose(2,3,1,0)
  torch depthwise Conv2d (C,1,k,k) -> HWIO (k,k,1,C)      : transpose(2,3,1,0)
  norms / biases / embeddings    -> unchanged

These functions take a flat ``{key: numpy array}`` state dict (call
``.numpy()`` on torch tensors first, or load with safetensors) so torch is
not a runtime dependency of the framework — only of the conversion step.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _arr(w) -> np.ndarray:
    # Copy: torch `.numpy()` views share storage with the live module, and
    # ops like SpectralNorm's power iteration mutate buffers in place.
    return np.array(w, copy=True)


def _set(tree: Dict[str, Any], path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_siglip_vision(sd: Dict[str, np.ndarray], prefix: str = "vision_model.") -> Dict[str, Any]:
    """HF SiglipVisionModel state_dict -> SigLIPVisionTower params."""
    p: Dict[str, Any] = {}
    g = lambda k: sd[prefix + k]

    _set(p, "patch_embedding_weight", _conv(g("embeddings.patch_embedding.weight")))
    _set(p, "patch_embedding_bias", _arr(g("embeddings.patch_embedding.bias")))
    _set(p, "position_embedding", _arr(g("embeddings.position_embedding.weight")))

    n_layers = 0
    while prefix + f"encoder.layers.{n_layers}.layer_norm1.weight" in sd:
        n_layers += 1
    for i in range(n_layers):
        lp = f"encoder.layers.{i}."
        _set(p, f"layers_{i}/norm1/weight", _arr(g(lp + "layer_norm1.weight")))
        _set(p, f"layers_{i}/norm1/bias", _arr(g(lp + "layer_norm1.bias")))
        _set(p, f"layers_{i}/norm2/weight", _arr(g(lp + "layer_norm2.weight")))
        _set(p, f"layers_{i}/norm2/bias", _arr(g(lp + "layer_norm2.bias")))
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _set(p, f"layers_{i}/attn/{proj}/weight", _t(g(lp + f"self_attn.{proj}.weight")))
            _set(p, f"layers_{i}/attn/{proj}/bias", _arr(g(lp + f"self_attn.{proj}.bias")))
        for fc in ("fc1", "fc2"):
            _set(p, f"layers_{i}/mlp/{fc}/weight", _t(g(lp + f"mlp.{fc}.weight")))
            _set(p, f"layers_{i}/mlp/{fc}/bias", _arr(g(lp + f"mlp.{fc}.bias")))

    _set(p, "post_layernorm/weight", _arr(g("post_layernorm.weight")))
    _set(p, "post_layernorm/bias", _arr(g("post_layernorm.bias")))

    if prefix + "head.probe" in sd:
        _set(p, "head/probe", _arr(g("head.probe")))
        _set(p, "head/in_proj_weight", _arr(g("head.attention.in_proj_weight")))
        _set(p, "head/in_proj_bias", _arr(g("head.attention.in_proj_bias")))
        _set(p, "head/out_proj/weight", _t(g("head.attention.out_proj.weight")))
        _set(p, "head/out_proj/bias", _arr(g("head.attention.out_proj.bias")))
        _set(p, "head/layernorm/weight", _arr(g("head.layernorm.weight")))
        _set(p, "head/layernorm/bias", _arr(g("head.layernorm.bias")))
        _set(p, "head/mlp/fc1/weight", _t(g("head.mlp.fc1.weight")))
        _set(p, "head/mlp/fc1/bias", _arr(g("head.mlp.fc1.bias")))
        _set(p, "head/mlp/fc2/weight", _t(g("head.mlp.fc2.weight")))
        _set(p, "head/mlp/fc2/bias", _arr(g("head.mlp.fc2.bias")))
    return p



def convert_siglip_text(sd: Dict[str, np.ndarray], prefix: str = "text_model.") -> Dict[str, Any]:
    """HF SiglipTextModel state_dict -> SigLIPTextTower params."""
    p: Dict[str, Any] = {}
    g = lambda k: sd[prefix + k]
    _set(p, "token_embedding", _arr(g("embeddings.token_embedding.weight")))
    _set(p, "position_embedding", _arr(g("embeddings.position_embedding.weight")))
    i = 0
    while prefix + f"encoder.layers.{i}.layer_norm1.weight" in sd:
        lp = f"encoder.layers.{i}."
        _set(p, f"layers_{i}/norm1/weight", _arr(g(lp + "layer_norm1.weight")))
        _set(p, f"layers_{i}/norm1/bias", _arr(g(lp + "layer_norm1.bias")))
        _set(p, f"layers_{i}/norm2/weight", _arr(g(lp + "layer_norm2.weight")))
        _set(p, f"layers_{i}/norm2/bias", _arr(g(lp + "layer_norm2.bias")))
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _set(p, f"layers_{i}/attn/{proj}/weight", _t(g(lp + f"self_attn.{proj}.weight")))
            _set(p, f"layers_{i}/attn/{proj}/bias", _arr(g(lp + f"self_attn.{proj}.bias")))
        for fc in ("fc1", "fc2"):
            _set(p, f"layers_{i}/mlp/{fc}/weight", _t(g(lp + f"mlp.{fc}.weight")))
            _set(p, f"layers_{i}/mlp/{fc}/bias", _arr(g(lp + f"mlp.{fc}.bias")))
        i += 1
    _set(p, "final_layer_norm/weight", _arr(g("final_layer_norm.weight")))
    _set(p, "final_layer_norm/bias", _arr(g("final_layer_norm.bias")))
    _set(p, "head/weight", _t(g("head.weight")))
    _set(p, "head/bias", _arr(g("head.bias")))
    return p


# ---------------------------------------------------------------- decoder


def convert_fcl(sd, prefix: str) -> Dict[str, Any]:
    """shared.py FullyConnectedLayer: raw (out,in) weight -> (in,out)."""
    out = {"weight": _t(sd[prefix + "weight"])}
    if prefix + "bias" in sd:
        out["bias"] = _arr(sd[prefix + "bias"])
    return out


def convert_style_split(sd, prefix: str) -> Dict[str, Any]:
    return {"proj": convert_fcl(sd, prefix + "proj.")}


def convert_groupnorm(sd, prefix: str) -> Dict[str, Any]:
    return {"weight": _arr(sd[prefix + "weight"]), "bias": _arr(sd[prefix + "bias"])}


def convert_convnext_layer(sd, prefix: str, legacy: bool = False):
    """ConvNeXtSynthesisLayer (convnext_utils.py:78). Returns (params, buffers)."""
    p: Dict[str, Any] = {
        "affine_pw1": convert_style_split(sd, prefix + "affine_pw1."),
        "dwconv": {
            "weight": _conv(sd[prefix + "dwconv.weight"]),
            "bias": _arr(sd[prefix + "dwconv.bias"]),
        },
        "norm": convert_groupnorm(sd, prefix + "norm."),
        "pwconv1": {
            "weight": _t(np.asarray(sd[prefix + "pwconv1.weight"])[:, :, 0, 0]),
            "bias": np.asarray(sd[prefix + "pwconv1.bias"]).reshape(-1),
        },
        "pwconv2": {
            "weight": _conv(sd[prefix + "pwconv2.weight"]),
            "bias": _arr(sd[prefix + "pwconv2.bias"]),
        },
        "gamma": np.asarray(sd[prefix + "gamma"]).reshape(-1),
    }
    b: Dict[str, Any] = {}
    if legacy:
        p["noise_strength"] = _arr(sd[prefix + "noise_strength"])
        b["noise_const"] = _arr(sd[prefix + "noise_const"])
    return p, b


def convert_separable_upsample(sd, prefix: str) -> Dict[str, Any]:
    return {
        "norm": convert_groupnorm(sd, prefix + "norm."),
        "depthwise": {"weight": _conv(sd[prefix + "depthwise.weight"])},
        "pointwise": {"weight": _conv(sd[prefix + "pointwise.weight"])},
    }


def convert_convnext_torgb(sd, prefix: str) -> Dict[str, Any]:
    return {
        "weight": _conv(sd[prefix + "weight"]),
        "bias": np.asarray(sd[prefix + "bias"]).reshape(-1),
        "affine": convert_style_split(sd, prefix + "affine."),
    }


def convert_self_attention_block(sd, prefix: str) -> Dict[str, Any]:
    """gigagan_utils.py SelfAttentionBlock."""
    return {
        "attn": {
            "norm": {"gamma": np.asarray(sd[prefix + "attn.norm.gamma"]).reshape(-1)},
            "to_q": {"weight": _conv(sd[prefix + "attn.to_q.weight"])},
            "to_k": {"weight": _conv(sd[prefix + "attn.to_k.weight"])},
            "to_v": {"weight": _conv(sd[prefix + "attn.to_v.weight"])},
            "null_kv": _arr(sd[prefix + "attn.null_kv"]),
            "to_out": {"weight": _conv(sd[prefix + "attn.to_out.weight"])},
        },
        "ff": {
            "norm": {"gamma": np.asarray(sd[prefix + "ff.0.gamma"]).reshape(-1)},
            "proj1": {
                "weight": _conv(sd[prefix + "ff.1.weight"]),
                "bias": _arr(sd[prefix + "ff.1.bias"]),
            },
            "proj2": {
                "weight": _conv(sd[prefix + "ff.3.weight"]),
                "bias": _arr(sd[prefix + "ff.3.bias"]),
            },
        },
    }


def convert_cross_attention_block(sd, prefix: str) -> Dict[str, Any]:
    return {
        "attn": {
            "norm": {"gamma": np.asarray(sd[prefix + "attn.norm.gamma"]).reshape(-1)},
            "norm_context": {"gamma": _arr(sd[prefix + "attn.norm_context.gamma"])},
            "to_q": {"weight": _conv(sd[prefix + "attn.to_q.weight"])},
            "to_kv": {"weight": _t(sd[prefix + "attn.to_kv.weight"])},
            "null_kv": _arr(sd[prefix + "attn.null_kv"]),
            "to_out": {"weight": _conv(sd[prefix + "attn.to_out.weight"])},
        },
        "ff": {
            "norm": {"gamma": np.asarray(sd[prefix + "ff.0.gamma"]).reshape(-1)},
            "proj1": {
                "weight": _conv(sd[prefix + "ff.1.weight"]),
                "bias": _arr(sd[prefix + "ff.1.bias"]),
            },
            "proj2": {
                "weight": _conv(sd[prefix + "ff.3.weight"]),
                "bias": _arr(sd[prefix + "ff.3.bias"]),
            },
        },
    }


# ---------------------------------------------------------------- adapter


def convert_linear(sd, prefix: str) -> Dict[str, Any]:
    out = {"weight": _t(sd[prefix + "weight"])}
    if prefix + "bias" in sd:
        out["bias"] = _arr(sd[prefix + "bias"])
    return out


def convert_layernorm(sd, prefix: str) -> Dict[str, Any]:
    return {"weight": _arr(sd[prefix + "weight"]), "bias": _arr(sd[prefix + "bias"])}


def convert_plain_attention(sd, prefix: str) -> Dict[str, Any]:
    return {
        "qkv": _t(sd[prefix + "qkv.weight"]),
        "q_bias": _arr(sd[prefix + "q_bias"]),
        "v_bias": _arr(sd[prefix + "v_bias"]),
        "proj": convert_linear(sd, prefix + "proj."),
    }


def convert_geglu_mlp(sd, prefix: str) -> Dict[str, Any]:
    return {
        "norm": convert_layernorm(sd, prefix + "norm."),
        "w0": convert_linear(sd, prefix + "w0."),
        "w1": convert_linear(sd, prefix + "w1."),
        "w2": convert_linear(sd, prefix + "w2."),
    }


def convert_attn_projection_block(sd, prefix: str) -> Dict[str, Any]:
    return {
        "norm1": convert_layernorm(sd, prefix + "norm1."),
        "norm2": convert_layernorm(sd, prefix + "norm2."),
        "norm3": convert_layernorm(sd, prefix + "norm3."),
        "attn": convert_plain_attention(sd, prefix + "attn."),
        "proj": convert_linear(sd, prefix + "proj."),
        "mlp": convert_geglu_mlp(sd, prefix + "mlp."),
    }


def convert_attn_projection(sd, prefix: str) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    i = 0
    while prefix + f"blocks.{i}.norm1.weight" in sd:
        out[f"blocks_{i}"] = convert_attn_projection_block(sd, prefix + f"blocks.{i}.")
        i += 1
    return out


def convert_ldm_adapter(sd, prefix: str, how_to_compress: str, how_to_decompress: str,
                        compression_mode: str = "continuous", use_vf_loss: bool = False):
    """LDMAdapter (ldm_utils.py:199). Returns (params, buffers)."""
    p: Dict[str, Any] = {}
    i = 0
    while any(k.startswith(prefix + f"patch_quants.{i}.") for k in sd):
        if how_to_compress == "conv":
            p[f"patch_quant_{i}"] = {
                "weight": _t(np.asarray(sd[prefix + f"patch_quants.{i}.0.weight"])[:, :, 0, 0]),
                "bias": _arr(sd[prefix + f"patch_quants.{i}.0.bias"]),
            }
        else:
            p[f"patch_quant_{i}"] = convert_attn_projection(sd, prefix + f"patch_quants.{i}.0.")
        i += 1

    if how_to_compress == "conv":
        p["final_quant"] = {
            "weight": _t(np.asarray(sd[prefix + "final_quant.weight"])[:, :, 0, 0]),
            "bias": _arr(sd[prefix + "final_quant.bias"]),
        }
    else:
        p["final_quant"] = convert_attn_projection(sd, prefix + "final_quant.")

    if how_to_decompress == "conv":
        p["post_quant"] = {
            "weight": _t(np.asarray(sd[prefix + "post_quant.weight"])[:, :, 0, 0]),
            "bias": _arr(sd[prefix + "post_quant.bias"]),
        }
    else:
        p["post_quant"] = convert_attn_projection(sd, prefix + "post_quant.")

    if use_vf_loss and prefix + "linear_proj.weight" in sd:
        p["linear_proj"] = {
            "weight": _t(np.asarray(sd[prefix + "linear_proj.weight"])[:, :, 0, 0])
        }

    b: Dict[str, Any] = {}
    if compression_mode == "discrete":
        q: Dict[str, Any] = {}
        qb: Dict[str, Any] = {}
        j = 0
        while prefix + f"quantizer.codebooks.{j}.codebook.weight" in sd:
            q[f"codebook_{j}"] = {"codebook": _arr(sd[prefix + f"quantizer.codebooks.{j}.codebook.weight"])}
            qb[f"codebook_{j}"] = {
                "vocab_usage": _arr(sd[prefix + f"quantizer.codebooks.{j}.vocab_usage"]),
                "usage_record_times": np.zeros((), np.int32),
            }
            j += 1
        p["quantizer"] = q
        b["quantizer"] = qb
    return p, b


def convert_dinov2(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict[str, Any]:
    """HF Dinov2Model state_dict -> Dinov2Tower params."""
    p: Dict[str, Any] = {}
    g = lambda k: sd[prefix + k]
    _set(p, "patch_embedding_weight", _conv(g("embeddings.patch_embeddings.projection.weight")))
    _set(p, "patch_embedding_bias", _arr(g("embeddings.patch_embeddings.projection.bias")))
    _set(p, "cls_token", _arr(g("embeddings.cls_token")))
    _set(p, "position_embeddings", np.asarray(g("embeddings.position_embeddings"))[0])
    i = 0
    while prefix + f"encoder.layer.{i}.norm1.weight" in sd:
        lp = f"encoder.layer.{i}."
        _set(p, f"layers_{i}/norm1/weight", _arr(g(lp + "norm1.weight")))
        _set(p, f"layers_{i}/norm1/bias", _arr(g(lp + "norm1.bias")))
        _set(p, f"layers_{i}/norm2/weight", _arr(g(lp + "norm2.weight")))
        _set(p, f"layers_{i}/norm2/bias", _arr(g(lp + "norm2.bias")))
        for ours, theirs in (
            ("q_proj", "attention.attention.query"),
            ("k_proj", "attention.attention.key"),
            ("v_proj", "attention.attention.value"),
            ("out_proj", "attention.output.dense"),
        ):
            _set(p, f"layers_{i}/attn/{ours}/weight", _t(g(lp + theirs + ".weight")))
            _set(p, f"layers_{i}/attn/{ours}/bias", _arr(g(lp + theirs + ".bias")))
        _set(p, f"layers_{i}/mlp/fc1/weight", _t(g(lp + "mlp.fc1.weight")))
        _set(p, f"layers_{i}/mlp/fc1/bias", _arr(g(lp + "mlp.fc1.bias")))
        _set(p, f"layers_{i}/mlp/fc2/weight", _t(g(lp + "mlp.fc2.weight")))
        _set(p, f"layers_{i}/mlp/fc2/bias", _arr(g(lp + "mlp.fc2.bias")))
        _set(p, f"layers_{i}/ls1", _arr(g(lp + "layer_scale1.lambda1")))
        _set(p, f"layers_{i}/ls2", _arr(g(lp + "layer_scale2.lambda1")))
        i += 1
    _set(p, "layernorm/weight", _arr(g("layernorm.weight")))
    _set(p, "layernorm/bias", _arr(g("layernorm.bias")))
    return p



def convert_mae(sd: Dict[str, np.ndarray], prefix: str = "") -> Dict[str, Any]:
    """HF ViTMAEModel state_dict -> MAETower (params, buffers)."""
    p: Dict[str, Any] = {}
    g = lambda k: sd[prefix + k]
    _set(p, "patch_embedding_weight", _conv(g("embeddings.patch_embeddings.projection.weight")))
    _set(p, "patch_embedding_bias", _arr(g("embeddings.patch_embeddings.projection.bias")))
    _set(p, "cls_token", _arr(g("embeddings.cls_token")))
    i = 0
    while prefix + f"encoder.layer.{i}.layernorm_before.weight" in sd:
        lp = f"encoder.layer.{i}."
        _set(p, f"layers_{i}/norm1/weight", _arr(g(lp + "layernorm_before.weight")))
        _set(p, f"layers_{i}/norm1/bias", _arr(g(lp + "layernorm_before.bias")))
        _set(p, f"layers_{i}/norm2/weight", _arr(g(lp + "layernorm_after.weight")))
        _set(p, f"layers_{i}/norm2/bias", _arr(g(lp + "layernorm_after.bias")))
        for ours, theirs in (
            ("q_proj", "attention.attention.query"),
            ("k_proj", "attention.attention.key"),
            ("v_proj", "attention.attention.value"),
            ("out_proj", "attention.output.dense"),
        ):
            _set(p, f"layers_{i}/attn/{ours}/weight", _t(g(lp + theirs + ".weight")))
            _set(p, f"layers_{i}/attn/{ours}/bias", _arr(g(lp + theirs + ".bias")))
        _set(p, f"layers_{i}/mlp/fc1/weight", _t(g(lp + "intermediate.dense.weight")))
        _set(p, f"layers_{i}/mlp/fc1/bias", _arr(g(lp + "intermediate.dense.bias")))
        _set(p, f"layers_{i}/mlp/fc2/weight", _t(g(lp + "output.dense.weight")))
        _set(p, f"layers_{i}/mlp/fc2/bias", _arr(g(lp + "output.dense.bias")))
        i += 1
    _set(p, "layernorm/weight", _arr(g("layernorm.weight")))
    _set(p, "layernorm/bias", _arr(g("layernorm.bias")))
    b = {"position_embeddings": np.asarray(g("embeddings.position_embeddings"))[0]}
    return p, b


# ------------------------------------------------------------- discriminator


def convert_spectral_conv1d(sd, prefix: str):
    """torch SpectralNorm state: weight_orig / weight_u / weight_v."""
    p = {"weight": _arr(sd[prefix + "weight_orig"]), "bias": _arr(sd[prefix + "bias"])}
    b = {"u": _arr(sd[prefix + "weight_u"]), "v": _arr(sd[prefix + "weight_v"])}
    return p, b


def convert_disc_head(sd, prefix: str, c_dim: int = 0):
    """DiscHead (discriminator.py:116-142): main = [make_block(k1),
    Residual(make_block(k9))]; block = [SpectralConv1d, BatchNormLocal]."""
    p: Dict[str, Any] = {}
    b: Dict[str, Any] = {}
    for ours, theirs in (("main0", "main.0."), ("main1", "main.1.fn.")):
        cp, cb = convert_spectral_conv1d(sd, prefix + theirs + "0.")
        p[ours] = {
            "conv": cp,
            "bn": {
                "weight": _arr(sd[prefix + theirs + "1.weight"]),
                "bias": _arr(sd[prefix + theirs + "1.bias"]),
            },
        }
        b[ours] = {"conv": cb}
    cp, cb = convert_spectral_conv1d(sd, prefix + "cls.")
    p["cls"], b["cls"] = cp, cb
    if c_dim > 0:
        p["cmapper"] = convert_fcl(sd, prefix + "cmapper.")
    return p, b


def convert_dino_timm(sd, prefix: str = "model.model.") -> Dict[str, Any]:
    """timm vit_small_patch16_224_dino state_dict -> DINOBackbone params.
    timm fuses qkv; we split into q/k/v projections."""
    p: Dict[str, Any] = {
        "patch_weight": _conv(sd[prefix + "patch_embed.proj.weight"]),
        "patch_bias": _arr(sd[prefix + "patch_embed.proj.bias"]),
        "cls_token": _arr(sd[prefix + "cls_token"]),
        "pos_embed": np.asarray(sd[prefix + "pos_embed"])[0],
    }
    i = 0
    while prefix + f"blocks.{i}.norm1.weight" in sd:
        lp = f"blocks.{i}."
        qkv_w = np.asarray(sd[prefix + lp + "attn.qkv.weight"])  # (3D, D)
        qkv_b = np.asarray(sd[prefix + lp + "attn.qkv.bias"])
        D = qkv_w.shape[1]
        blk = {
            "norm1": convert_layernorm(sd, prefix + lp + "norm1."),
            "norm2": convert_layernorm(sd, prefix + lp + "norm2."),
            "attn": {
                "q_proj": {"weight": _t(qkv_w[:D]), "bias": qkv_b[:D]},
                "k_proj": {"weight": _t(qkv_w[D : 2 * D]), "bias": qkv_b[D : 2 * D]},
                "v_proj": {"weight": _t(qkv_w[2 * D :]), "bias": qkv_b[2 * D :]},
                "out_proj": convert_linear(sd, prefix + lp + "attn.proj."),
            },
            "mlp": {
                "fc1": convert_linear(sd, prefix + lp + "mlp.fc1."),
                "fc2": convert_linear(sd, prefix + lp + "mlp.fc2."),
            },
        }
        p[f"blocks_{i}"] = blk
        i += 1
    return p


def convert_nlayer_discriminator(sd, prefix: str, n_layers: int = 3, get_interm_feat: bool = False,
                                 scale_fmt: Optional[str] = None) -> Dict[str, Any]:
    """NLayerDiscriminator (discriminator.py:180-228). When get_interm_feat,
    torch names are scale{i}_layer{j} via scale_fmt; else one flat Sequential."""
    p: Dict[str, Any] = {}
    if get_interm_feat:
        assert scale_fmt is not None
        # layer0 = [conv, lrelu]; layers 1..n = [conv, bn, lrelu]; last = [conv]
        p["conv0"] = {
            "weight": _conv(sd[prefix + scale_fmt.format(0) + ".0.weight"]),
            "bias": _arr(sd[prefix + scale_fmt.format(0) + ".0.bias"]),
        }
        for j in range(1, n_layers + 1):
            p[f"conv{j}"] = {
                "weight": _conv(sd[prefix + scale_fmt.format(j) + ".0.weight"]),
                "bias": _arr(sd[prefix + scale_fmt.format(j) + ".0.bias"]),
            }
            p[f"bn{j}"] = {
                "weight": _arr(sd[prefix + scale_fmt.format(j) + ".1.weight"]),
                "bias": _arr(sd[prefix + scale_fmt.format(j) + ".1.bias"]),
            }
        p[f"conv{n_layers + 1}"] = {
            "weight": _conv(sd[prefix + scale_fmt.format(n_layers + 1) + ".0.weight"]),
            "bias": _arr(sd[prefix + scale_fmt.format(n_layers + 1) + ".0.bias"]),
        }
    else:
        # Flat Sequential indices: conv at 0, then (conv, bn) pairs at
        # (2,3), (5,6), (8,9), final conv at 11 for n_layers=3.
        seq = 0
        p["conv0"] = {
            "weight": _conv(sd[prefix + f"{seq}.weight"]),
            "bias": _arr(sd[prefix + f"{seq}.bias"]),
        }
        seq = 2
        for j in range(1, n_layers + 1):
            p[f"conv{j}"] = {
                "weight": _conv(sd[prefix + f"{seq}.weight"]),
                "bias": _arr(sd[prefix + f"{seq}.bias"]),
            }
            p[f"bn{j}"] = {
                "weight": _arr(sd[prefix + f"{seq + 1}.weight"]),
                "bias": _arr(sd[prefix + f"{seq + 1}.bias"]),
            }
            seq += 3
        p[f"conv{n_layers + 1}"] = {
            "weight": _conv(sd[prefix + f"{seq}.weight"]),
            "bias": _arr(sd[prefix + f"{seq}.bias"]),
        }
    return p


def convert_multiscale_discriminator(sd, prefix: str, num_D: int = 3, n_layers: int = 3,
                                     get_interm_feat: bool = True) -> Dict[str, Any]:
    p: Dict[str, Any] = {}
    for i in range(num_D):
        if get_interm_feat:
            p[f"scale{i}"] = convert_nlayer_discriminator(
                sd, prefix, n_layers, True, scale_fmt=f"scale{i}_layer{{}}"
            )
        else:
            p[f"scale{i}"] = convert_nlayer_discriminator(
                sd, prefix + f"layer{i}.", n_layers, False
            )
    return p


def convert_projected_discriminator(
    sd, prefix: str = "", c_dim: int = 0,
    use_stylegan_t: bool = True, use_patchgan: bool = False,
    get_interm_feat: bool = True, n_hooks: int = 5,
):
    params: Dict[str, Any] = {}
    buffers: Dict[str, Any] = {}
    if use_stylegan_t:
        params["dino"] = convert_dino_timm(sd, prefix + "dino.model.model.")
        for i in range(n_hooks):
            hp, hb = convert_disc_head(sd, prefix + f"heads.{i}.", c_dim)
            params[f"heads_{i}"] = hp
            buffers[f"heads_{i}"] = hb
    if use_patchgan:
        params["patchgan"] = convert_multiscale_discriminator(
            sd, prefix + "patchgan_discriminator.", get_interm_feat=get_interm_feat
        )
    return params, buffers


# ---------------------------------------------------------------- synthesis


def convert_synthesis_input(sd, prefix: str):
    p = {
        "weight": _arr(sd[prefix + "weight"]),
        "affine": convert_fcl(sd, prefix + "affine."),
    }
    b = {
        "transform": _arr(sd[prefix + "transform"]),
        "freqs": _arr(sd[prefix + "freqs"]),
        "phases": _arr(sd[prefix + "phases"]),
    }
    return p, b


def convert_zconv(sd, prefix: str, kind: str) -> Dict[str, Any]:
    """z_convs.{idx} Sequential (generator.py:726-784). kind in
    {'down' (unshuffle,3x3,1x1), 'same' (3x3,1x1), 'up' (3x3,shuffle,1x1)}."""
    if kind == "down":
        i3, i1 = 1, 2
    elif kind == "same":
        i3, i1 = 0, 1
    else:
        i3, i1 = 0, 2
    return {
        "conv0_dw": {"weight": _conv(sd[prefix + f"{i3}.0.weight"])},
        "conv0_pw": {"weight": _conv(sd[prefix + f"{i3}.1.weight"])},
        "conv0_gn": convert_groupnorm(sd, prefix + f"{i3}.2."),
        "conv1_pw": {"weight": _conv(sd[prefix + f"{i1}.0.weight"])},
        "conv1_gn": convert_groupnorm(sd, prefix + f"{i1}.1."),
    }


def convert_synthesis_block(sd, prefix: str, legacy: bool = False, use_convnext: bool = True):
    """SynthesisBlock (generator.py:322). Returns (params, buffers)."""
    p: Dict[str, Any] = {}
    b: Dict[str, Any] = {}
    if use_convnext:
        if prefix + "seperate_upsample_conv.depthwise.weight" in sd:
            p["seperate_upsample_conv"] = convert_separable_upsample(
                sd, prefix + "seperate_upsample_conv."
            )
        if prefix + "conv0.dwconv.weight" in sd:
            p["conv0"], bb = convert_convnext_layer(sd, prefix + "conv0.", legacy)
            if bb:
                b["conv0"] = bb
        i = 0
        while prefix + f"convs1.{i}.dwconv.weight" in sd:
            p[f"convs1_{i}"], bb = convert_convnext_layer(sd, prefix + f"convs1.{i}.", legacy)
            if bb:
                b[f"convs1_{i}"] = bb
            i += 1
        if prefix + "torgb.weight" in sd:
            p["torgb"] = convert_convnext_torgb(sd, prefix + "torgb.")
        if prefix + "last_upsample_conv.depthwise.weight" in sd:
            p["last_upsample_conv"] = convert_separable_upsample(sd, prefix + "last_upsample_conv.")
    if prefix + "input.weight" in sd:
        p["input"], b["input"] = convert_synthesis_input(sd, prefix + "input.")
    i = 0
    while prefix + f"self_attns.{i}.attn.to_q.weight" in sd:
        p[f"self_attns_{i}"] = convert_self_attention_block(sd, prefix + f"self_attns.{i}.")
        i += 1
    i = 0
    while prefix + f"cross_attns.{i}.attn.to_q.weight" in sd:
        p[f"cross_attns_{i}"] = convert_cross_attention_block(sd, prefix + f"cross_attns.{i}.")
        i += 1
    return p, b


def convert_mapping(sd, prefix: str):
    p: Dict[str, Any] = {"mlp": {}}
    i = 0
    while prefix + f"mlp.fc{i}.weight" in sd:
        p["mlp"][f"fc{i}"] = convert_fcl(sd, prefix + f"mlp.fc{i}.")
        i += 1
    if prefix + "embed.weight" in sd:
        p["embed"] = convert_fcl(sd, prefix + "embed.")
    b = {"x_avg": _arr(sd[prefix + "x_avg"])} if prefix + "x_avg" in sd else {}
    return p, b


def convert_generator(
    sd: Dict[str, np.ndarray],
    *,
    how_to_compress: str = "attnproj",
    how_to_decompress: str = "attnproj",
    compression_mode: str = "continuous",
    use_vf_loss: bool = False,
    legacy: bool = False,
    use_convnext: bool = True,
    z_resolution: int = 16,
    concat_z_block_indices: Sequence[int] = (),
    block_resolutions: Sequence[int] = (),
    prefix: str = "",
):
    """Full reference Generator state_dict -> (params, buffers) pytrees.

    This is the production .pth importer (tools/import_checkpoint.py wraps
    it); layout notes at module top. ``block_resolutions`` is needed to pick
    the z_convs sequential layout per block (generator.py:729-782)."""
    from typing import Sequence as _Seq  # noqa

    params: Dict[str, Any] = {}
    buffers: Dict[str, Any] = {}

    # Frozen VFM tower (SigLIP2Encoder.vision_model = HF SiglipVisionModel).
    vfm_prefix = prefix + "vfm_encoder.encoder.vision_model."
    if any(k.startswith(vfm_prefix) for k in sd):
        params["vfm_encoder"] = {
            "tower": convert_siglip_vision(sd, vfm_prefix + "vision_model.")
        }

    # Adapter.
    ap, ab = convert_ldm_adapter(
        sd, prefix + "ldm_adapter.", how_to_compress, how_to_decompress,
        compression_mode, use_vf_loss,
    )
    params["ldm_adapter"] = ap
    if ab:
        buffers["ldm_adapter"] = ab

    # Mapping.
    mp, mb = convert_mapping(sd, prefix + "mapping.")
    params["mapping"] = mp
    if mb:
        buffers["mapping"] = mb

    # Synthesis.
    syn_p: Dict[str, Any] = {}
    syn_b: Dict[str, Any] = {}
    for idx, res in enumerate(block_resolutions):
        bp, bb = convert_synthesis_block(
            sd, prefix + f"synthesis.blocks.{idx}.", legacy, use_convnext
        )
        syn_p[f"b{idx}"] = bp
        if bb:
            syn_b[f"b{idx}"] = bb
        if idx in list(concat_z_block_indices):
            if res < z_resolution * 2:
                kind = "down"
            elif res == z_resolution * 2:
                kind = "same"
            else:
                kind = "up"
            syn_p[f"z_convs_{idx}"] = convert_zconv(
                sd, prefix + f"synthesis.z_convs.{idx}.", kind
            )
    params["synthesis"] = syn_p
    if syn_b:
        buffers["synthesis"] = syn_b
    return params, buffers


def siglip_tower_config(hf_config) -> Dict[str, Any]:
    """Kwargs for SigLIPVisionTower from an HF SiglipVisionConfig."""
    return dict(
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        mlp_dim=hf_config.intermediate_size,
        patch_size=hf_config.patch_size,
        image_size=hf_config.image_size,
        eps=hf_config.layer_norm_eps,
    )
