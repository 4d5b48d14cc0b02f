"""DINOv2 tower parity vs HF transformers (tiny random config)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_dinov2():
    from transformers import Dinov2Config, Dinov2Model

    cfg = Dinov2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        mlp_ratio=2, image_size=28, patch_size=7, num_channels=3,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Dinov2Model(cfg).eval()
    return cfg, model


def _ours(model, cfg):
    from vfm_vae_tpu.models.convert import convert_dinov2
    from vfm_vae_tpu.models.vit import Dinov2Tower

    sd = {k: np.array(v.detach().numpy(), copy=True) for k, v in model.state_dict().items()}
    params = convert_dinov2(sd)
    tower = Dinov2Tower(
        hidden_size=cfg.hidden_size,
        num_layers=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads,
        mlp_dim=int(cfg.hidden_size * cfg.mlp_ratio),
        patch_size=cfg.patch_size,
        image_size=cfg.image_size,
        eps=cfg.layer_norm_eps,
    )
    return tower, {"params": params}


@pytest.mark.parametrize("res", [28, 14, 42])
def test_dinov2_tower_matches_hf(tiny_dinov2, res):
    cfg, model = tiny_dinov2
    tower, variables = _ours(model, cfg)
    x = np.random.default_rng(res).standard_normal((2, 3, res, res)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x), output_hidden_states=True)
    hs, last, pooled = tower.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), collect=[0, 1, 2]
    )
    np.testing.assert_allclose(
        np.asarray(hs[0]), out.hidden_states[0].numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(last), out.last_hidden_state.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), rtol=2e-4, atol=2e-4
    )


def test_vfm_facade_dinov2(tiny_dinov2, tmp_path):
    """The facade wires preprocessing + CLS stripping for dinov2 names."""
    import jax

    from vfm_vae_tpu.models.vfm import VFMEncoder

    cfg, model = tiny_dinov2
    d = tmp_path / "dinov2-tiny-patch7-28"
    model.save_pretrained(d)
    enc = VFMEncoder(
        model_name=str(d), scale_factor=1.0, patch_from_layers=[0, 1, -1]
    )
    img = jnp.zeros((1, 28, 28, 3))
    variables = enc.init({"params": jax.random.PRNGKey(0)}, img, method=enc.encode_image)
    feats, pooled = enc.apply(variables, img, method=enc.encode_image)
    grid = (28 // 7) ** 2
    assert all(f.shape == (1, grid, 64) for f in feats)  # CLS stripped
    assert pooled.shape == (1, 64)


# ---------------------------------------------------------------- MAE


@pytest.fixture(scope="module")
def tiny_mae():
    from transformers import ViTMAEConfig, ViTMAEModel

    cfg = ViTMAEConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=8, num_channels=3,
        mask_ratio=0.0, attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = ViTMAEModel(cfg).eval()
    return cfg, model


def test_mae_tower_matches_hf(tiny_mae):
    from vfm_vae_tpu.models.convert import convert_mae
    from vfm_vae_tpu.models.vit import MAETower

    cfg, model = tiny_mae
    sd = {k: np.array(v.detach().numpy(), copy=True) for k, v in model.state_dict().items()}
    params, buffers = convert_mae(sd)
    tower = MAETower(
        hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128,
        patch_size=8, image_size=32, eps=cfg.layer_norm_eps, mask_ratio=0.0,
    )
    x = np.random.default_rng(9).standard_normal((2, 3, 32, 32)).astype(np.float32)
    # HF ViTMAE shuffles tokens by argsort(noise) even at mask_ratio=0;
    # force identity order for a deterministic comparison (the reference
    # wrapper runs with random shuffling — an upstream artifact).
    n_tok = (32 // 8) ** 2
    noise = torch.arange(n_tok, dtype=torch.float32)[None].repeat(2, 1) / n_tok
    with torch.no_grad():
        out = model(torch.from_numpy(x), noise=noise, output_hidden_states=True)
    hs, last, pooled = tower.apply(
        {"params": params, "buffers": buffers},
        jnp.asarray(x.transpose(0, 2, 3, 1)), collect=[0, 1, 2],
    )
    np.testing.assert_allclose(
        np.asarray(hs[0]), out.hidden_states[0].numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(last), out.last_hidden_state.numpy(), rtol=2e-4, atol=2e-4
    )


# ---------------------------------------------------------------- EVA


def test_eva_tower_smoke():
    """No timm offline -> structural smoke only (see models/eva.py note)."""
    import jax
    from vfm_vae_tpu.models.eva import EVATower

    tower = EVATower(
        hidden_size=64, num_layers=2, num_heads=4, mlp_dim=96,
        patch_size=8, image_size=32,
    )
    x = jnp.zeros((2, 32, 32, 3))
    variables = jax.jit(lambda r: tower.init(r, x))(jax.random.PRNGKey(0))
    hs, last, pooled = tower.apply(variables, x, collect=[0, 1, 2])
    assert last.shape == (2, 17, 64) and pooled.shape == (2, 64)
    # dynamic resolution
    hs2, last2, _ = tower.apply(variables, jnp.zeros((1, 16, 16, 3)), collect=[2])
    assert last2.shape == (1, 5, 64)


def test_vfm_facade_eva():
    import jax
    from vfm_vae_tpu.models.vfm import VFMEncoder, VFM_PRESETS

    VFM_PRESETS["eva02-tiny"] = dict(
        hidden_size=64, num_layers=2, num_heads=4, mlp_dim=96,
        patch_size=8, image_size=32, text_hidden_size=64,
    )
    enc = VFMEncoder(model_name="eva02-tiny", scale_factor=1.0, patch_from_layers=[0, 1, -1])
    img = jnp.zeros((1, 32, 32, 3))
    variables = enc.init({"params": jax.random.PRNGKey(0)}, img, method=enc.encode_image)
    feats, pooled = enc.apply(variables, img, method=enc.encode_image)
    assert all(f.shape == (1, 16, 64) for f in feats)  # CLS stripped
