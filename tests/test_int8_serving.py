"""Int8 serving-path routing through the frozen tower.

Regression for the round-2 A/B bug: VFMEncoder.encode_image wrapped the
tower in int8_linear_scope(int8_vfm_enabled()), which silently DISABLED a
caller's active scope whenever VFM_VAE_INT8_VFM was unset — so the "int8"
benchmarks measured a bf16 tower. The tower now honors env OR caller scope
(models/vfm.py). Reference int8 context: the reference has no quantized
serving path; this is TPU-added capability (ops/quantized.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import flax.traverse_util as tu


@pytest.fixture(scope="module")
def tiny_vfm_dir(tmp_path_factory):
    import torch
    from transformers import SiglipVisionConfig, SiglipVisionModel

    d = tmp_path_factory.mktemp("vfm") / "siglip2-tiny-patch8-32"
    cfg = SiglipVisionConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=8,
        num_channels=3,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    SiglipVisionModel(cfg).save_pretrained(d)
    return str(d)


@pytest.fixture(scope="module")
def enc_and_vars(tiny_vfm_dir):
    from vfm_vae_tpu.models.vfm import VFMEncoder

    enc = VFMEncoder(
        model_name=tiny_vfm_dir, scale_factor=1.0, patch_from_layers=[0, -1]
    )
    img = jnp.asarray(
        np.random.default_rng(0).random((2, 32, 32, 3)), jnp.float32
    )
    variables = enc.init(jax.random.PRNGKey(0), img, method=enc.encode_image)
    return enc, variables, img


def _flat_out(y):
    return jnp.concatenate(
        [jnp.ravel(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(y)]
    )


def test_outer_scope_reaches_the_tower(enc_and_vars):
    """An active caller int8 scope must actually quantize the tower — the
    bug made this a silent no-op (identical outputs)."""
    from vfm_vae_tpu.models.layers import int8_linear_scope
    from vfm_vae_tpu.ops.quantized import prequantize_linears

    enc, variables, img = enc_and_vars
    v8 = dict(variables)
    v8["int8"] = prequantize_linears(variables["params"])

    y_bf16 = _flat_out(enc.apply(variables, img, method=enc.encode_image))
    with int8_linear_scope(True):
        y_int8 = _flat_out(enc.apply(v8, img, method=enc.encode_image))

    diff = float(jnp.mean(jnp.abs(y_bf16 - y_int8)))
    assert diff > 0.0, "int8 scope did not reach the tower (bf16 ran instead)"
    # ... but it is the same function up to quantization noise.
    rel = diff / (float(jnp.mean(jnp.abs(y_bf16))) + 1e-12)
    assert rel < 0.05, rel


def test_env_opt_in_reaches_the_tower(enc_and_vars, monkeypatch):
    from vfm_vae_tpu.ops.quantized import prequantize_linears

    enc, variables, img = enc_and_vars
    v8 = dict(variables)
    v8["int8"] = prequantize_linears(variables["params"])

    y_bf16 = _flat_out(enc.apply(variables, img, method=enc.encode_image))
    monkeypatch.setenv("VFM_VAE_INT8_VFM", "1")
    y_int8 = _flat_out(enc.apply(v8, img, method=enc.encode_image))
    assert float(jnp.mean(jnp.abs(y_bf16 - y_int8))) > 0.0


def test_decoder_mlp_int8_static_path():
    """ConvNeXt MLP W8A8: mirrors at the layer path + calibrated as_u/as_h
    scales route the block through the static-int8 dots; output must track
    the fp32 path within quantization noise, and the folded algebra
    (GN-affine + modulate in A, demod in e1) must match the unfused form."""
    from vfm_vae_tpu.models.convnext import ConvNeXtSynthesisLayer
    from vfm_vae_tpu.ops.quantized import (
        calibrate_int8_act_scales,
        prequantize_decoder_mlps,
    )

    rng = np.random.default_rng(1)
    B, H, W, C, wdim = 2, 8, 8, 32, 16
    layer = ConvNeXtSynthesisLayer(channels=C, w_dim=wdim, kernel_size=7)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    wlat = jnp.asarray(rng.standard_normal((B, wdim)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x, wlat)

    y_ref = layer.apply(variables, x, wlat)

    m = prequantize_decoder_mlps(variables["params"])
    assert set(tu.flatten_dict(m)) == {("w1q",), ("ws1",), ("w2q",), ("ws2",)}
    v8 = dict(variables)
    v8["int8"] = m

    v8s = calibrate_int8_act_scales(
        lambda v, xx, ww: layer.apply(v, xx, ww, mutable=["act_stats"]),
        v8, x, wlat,
    )
    flat = tu.flatten_dict(v8s["int8"])
    assert ("as_u",) in flat and ("as_h",) in flat

    y_int8 = layer.apply(v8s, x, wlat)
    rel = float(
        jnp.mean(jnp.abs(y_ref - y_int8)) / (jnp.mean(jnp.abs(y_ref)) + 1e-12)
    )
    assert 0.0 < rel < 0.05, rel


def test_calibration_covers_every_int8_linear(enc_and_vars):
    """calibrate_int8_act_scales must produce one 'as' per 'wq' for the
    whole tower, and the static path must track the dynamic path."""
    from vfm_vae_tpu.models.layers import int8_linear_scope
    from vfm_vae_tpu.ops.quantized import (
        calibrate_int8_act_scales,
        prequantize_linears,
    )

    enc, variables, img = enc_and_vars
    v8 = dict(variables)
    v8["int8"] = prequantize_linears(variables["params"])

    def apply_mut(v, x):
        return enc.apply(
            v, x, method=enc.encode_image, mutable=["act_stats"]
        )

    v8s = calibrate_int8_act_scales(apply_mut, v8, img)
    flat = tu.flatten_dict(v8s["int8"])
    wq = {p[:-1] for p in flat if p[-1] == "wq"}
    has_as = {p[:-1] for p in flat if p[-1] == "as"}
    assert wq, "no int8 mirrors at all"
    assert wq == has_as, f"missing act scales: {sorted(wq - has_as)[:4]}"

    with int8_linear_scope(True):
        y_dyn = _flat_out(enc.apply(v8, img, method=enc.encode_image))
        y_stat = _flat_out(enc.apply(v8s, img, method=enc.encode_image))
    rel = float(
        jnp.mean(jnp.abs(y_dyn - y_stat)) / (jnp.mean(jnp.abs(y_dyn)) + 1e-12)
    )
    assert rel < 0.05, rel
