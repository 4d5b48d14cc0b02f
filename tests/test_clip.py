"""CLIP encoder parity vs HF CLIPModel (tiny random config) + the CLIP loss
spherical-distance wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_clip():
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        vision_config=dict(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, image_size=28, patch_size=7,
            hidden_act="quick_gelu",
        ),
        text_config=dict(
            hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=96, max_position_embeddings=12, vocab_size=100,
            hidden_act="quick_gelu", eos_token_id=99,
        ),
        projection_dim=32,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    return cfg, model


@pytest.fixture(scope="module")
def ours(tiny_clip):
    from vfm_vae_tpu.models.clip import CLIP, convert_clip

    cfg, model = tiny_clip
    sd = {k: np.array(v.detach().numpy(), copy=True) for k, v in model.state_dict().items()}
    params = convert_clip(sd)
    clip = CLIP(
        vision_kwargs=dict(
            hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128,
            patch_size=7, image_size=28, projection_dim=32,
        ),
        text_kwargs=dict(
            vocab_size=100, hidden_size=48, num_layers=2, num_heads=4,
            mlp_dim=96, max_length=12, projection_dim=32,
        ),
    )
    return clip, {"params": params}


def test_clip_image_features_match_hf(tiny_clip, ours):
    cfg, model = tiny_clip
    clip, variables = ours
    x = np.random.default_rng(0).random((2, 28, 28, 3)).astype(np.float32)
    # Compare the raw projection (pre-normalization) against HF.
    import torch as _t

    from vfm_vae_tpu.models.clip import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD

    xn = (x - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD
    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=_t.from_numpy(xn.transpose(0, 3, 1, 2))
        )
    feats = clip.apply(
        variables, jnp.asarray(xn), method=lambda m, p: m.visual(p)
    )
    np.testing.assert_allclose(np.asarray(feats), ref.numpy(), rtol=3e-4, atol=3e-4)


def test_clip_text_features_match_hf(tiny_clip, ours):
    cfg, model = tiny_clip
    clip, variables = ours
    ids = np.random.default_rng(1).integers(1, 90, (2, 12))
    ids[:, -1] = 99  # eot = argmax
    with torch.no_grad():
        ref = model.get_text_features(input_ids=torch.from_numpy(ids))
    feats = clip.apply(
        variables, jnp.asarray(ids), method=lambda m, t: m.text(t)
    )
    np.testing.assert_allclose(np.asarray(feats), ref.numpy(), rtol=3e-4, atol=3e-4)


def test_clip_loss_spherical_distance(ours):
    from vfm_vae_tpu.train.loss import spherical_distance

    clip, variables = ours
    img = jnp.asarray(np.random.default_rng(2).random((2, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(np.random.default_rng(3).integers(1, 99, (2, 12)))
    imf = clip.apply(variables, img, method=clip.encode_image)
    txf = clip.apply(variables, ids, method=clip.encode_text)
    d = spherical_distance(imf, txf)
    assert d.shape == (2,)
    assert np.isfinite(np.asarray(d)).all()
    # identical features -> zero distance
    np.testing.assert_allclose(np.asarray(spherical_distance(imf, imf)), 0.0, atol=1e-4)
