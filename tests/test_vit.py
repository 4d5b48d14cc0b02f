"""SigLIP vision tower parity vs HF transformers (random tiny config, fp32).

This validates the full numerics chain: patch embed, pos-embed bicubic
interpolation at dynamic resolution, pre-LN blocks, gelu-tanh MLP, post-LN,
MAP pooling head, and the torch->jax weight converter.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_siglip():
    from transformers import SiglipVisionConfig, SiglipVisionModel

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
    model = SiglipVisionModel(cfg).eval()
    return cfg, model


def _ours_from(model, cfg):
    from vfm_vae_tpu.models.convert import convert_siglip_vision, siglip_tower_config
    from vfm_vae_tpu.models.vit import SigLIPVisionTower

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_siglip_vision(sd)
    tower = SigLIPVisionTower(**siglip_tower_config(cfg))
    return tower, {"params": params}


@pytest.mark.parametrize("res", [32, 16, 48])
def test_siglip_tower_matches_hf(tiny_siglip, res):
    cfg, model = tiny_siglip
    tower, variables = _ours_from(model, cfg)

    x = np.random.default_rng(res).standard_normal((2, 3, res, res)).astype(np.float32)
    with torch.no_grad():
        out = model(
            pixel_values=torch.from_numpy(x),
            interpolate_pos_encoding=True,
            output_hidden_states=True,
        )

    hs, last, pooled = tower.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), collect=[0, 1, 2]
    )
    np.testing.assert_allclose(
        np.asarray(hs[0]), out.hidden_states[0].numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(hs[2]), out.hidden_states[2].numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(last), out.last_hidden_state.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), rtol=2e-4, atol=2e-4
    )


def test_collect_subset_saves_outputs(tiny_siglip):
    cfg, model = tiny_siglip
    tower, variables = _ours_from(model, cfg)
    x = jnp.zeros((1, 32, 32, 3))
    hs, last, pooled = tower.apply(variables, x, collect=[1])
    assert set(hs.keys()) == {1}


def test_siglip_text_tower_matches_hf():
    from transformers import SiglipTextConfig, SiglipTextModel
    from vfm_vae_tpu.models.convert import convert_siglip_text
    from vfm_vae_tpu.models.vit import SigLIPTextTower
    import jax.numpy as jnp

    cfg = SiglipTextConfig(
        vocab_size=200, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, max_position_embeddings=16,
        attn_implementation="eager",
    )
    torch.manual_seed(3)
    model = SiglipTextModel(cfg).eval()
    sd = {k: np.array(v.detach().numpy(), copy=True) for k, v in model.state_dict().items()}
    params = convert_siglip_text(sd)
    tower = SigLIPTextTower(
        vocab_size=200, hidden_size=64, num_layers=2, num_heads=4,
        mlp_dim=128, max_length=16,
    )
    ids = np.random.default_rng(0).integers(0, 200, (2, 16))
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids))
    seq, pooled = tower.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(seq), out.last_hidden_state.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(), rtol=2e-4, atol=2e-4)


def test_int8_vfm_scope(tiny_siglip, tmp_path, monkeypatch):
    """VFM_VAE_INT8_VFM=1 routes the frozen tower's Linears through the
    dynamic-W8A8 path; outputs must stay close to the fp path (the per-matmul
    error is ~1%; across a 2-layer tower cosine > 0.99)."""
    import jax

    from vfm_vae_tpu.models.vfm import VFMEncoder

    cfg, model = tiny_siglip
    d = tmp_path / "siglip2-tiny-patch8-32"
    model.save_pretrained(d)

    enc = VFMEncoder(model_name=str(d), scale_factor=1.0, patch_from_layers=[-1])
    img = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)), jnp.float32)
    v = enc.init({"params": jax.random.PRNGKey(0)}, img, method=enc.encode_image)

    feats_fp, _ = enc.apply(v, img, method=enc.encode_image)
    monkeypatch.setenv("VFM_VAE_INT8_VFM", "1")
    feats_q, _ = enc.apply(v, img, method=enc.encode_image)
    monkeypatch.delenv("VFM_VAE_INT8_VFM")

    a = np.asarray(feats_fp[-1], np.float64).reshape(-1)
    b = np.asarray(feats_q[-1], np.float64).reshape(-1)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.99, cos
    assert not np.allclose(a, b)  # the int8 path actually ran


def test_int8_prequant_matches_dynamic(tiny_siglip, tmp_path, monkeypatch):
    """Pre-quantized weights (add_int8_collection) produce the SAME outputs
    as the per-call dynamic path — the quantization formula is shared; only
    where it runs differs (offline vs in-graph)."""
    import jax

    from vfm_vae_tpu.models.vfm import VFMEncoder
    from vfm_vae_tpu.ops.quantized import add_int8_collection

    cfg, model = tiny_siglip
    d = tmp_path / "siglip2-tiny-patch8-32"
    model.save_pretrained(d)

    enc = VFMEncoder(model_name=str(d), scale_factor=1.0, patch_from_layers=[-1])
    img = jnp.asarray(np.random.default_rng(1).random((2, 32, 32, 3)), jnp.float32)
    v = enc.init({"params": jax.random.PRNGKey(0)}, img, method=enc.encode_image)

    v8 = add_int8_collection(v, keys=("tower",))
    assert "int8" in v8, list(v8["params"].keys())
    # wq leaves are int8 and mirror Linear weight paths
    import flax.traverse_util as tu

    flat = tu.flatten_dict(v8["int8"])
    assert any(p[-1] == "wq" for p in flat)
    assert all(np.asarray(x).dtype == np.int8 for p, x in flat.items() if p[-1] == "wq")

    monkeypatch.setenv("VFM_VAE_INT8_VFM", "1")
    feats_dyn, _ = enc.apply(v, img, method=enc.encode_image)
    feats_pre, _ = enc.apply(v8, img, method=enc.encode_image)
    monkeypatch.delenv("VFM_VAE_INT8_VFM")

    np.testing.assert_allclose(
        np.asarray(feats_pre[-1]), np.asarray(feats_dyn[-1]), rtol=1e-6, atol=1e-6
    )
