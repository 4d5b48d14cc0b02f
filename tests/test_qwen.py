"""Qwen2.5-VL vision tower parity vs HF (tiny random config)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_qwen():
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )
    from transformers.models.qwen2_5_vl import Qwen2_5_VLConfig

    cfg = Qwen2_5_VLConfig(
        vision_config=dict(
            depth=4,
            hidden_size=64,
            num_heads=4,
            intermediate_size=128,
            out_hidden_size=32,
            patch_size=4,
            temporal_patch_size=2,
            spatial_merge_size=2,
            window_size=16,  # -> merger window = 16//2//4 = 2 llm units
            fullatt_block_indexes=[1, 3],
            in_channels=3,
            hidden_act="silu",
        )
    ).vision_config
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = Qwen2_5_VisionTransformerPretrainedModel(cfg).eval()
    return cfg, model


def convert_qwen(sd):
    from vfm_vae_tpu.models.convert import _t, _arr

    p = {}
    w = np.asarray(sd["patch_embed.proj.weight"])  # (D, C, tp, p, p)
    p["patch_embed"] = np.ascontiguousarray(w.reshape(w.shape[0], -1).T)
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        bp = f"blocks.{i}."
        p[f"blocks_{i}"] = {
            "norm1": {"weight": _arr(sd[bp + "norm1.weight"])},
            "norm2": {"weight": _arr(sd[bp + "norm2.weight"])},
            "qkv": {"weight": _t(sd[bp + "attn.qkv.weight"]), "bias": _arr(sd[bp + "attn.qkv.bias"])},
            "proj": {"weight": _t(sd[bp + "attn.proj.weight"]), "bias": _arr(sd[bp + "attn.proj.bias"])},
            "gate_proj": {"weight": _t(sd[bp + "mlp.gate_proj.weight"]), "bias": _arr(sd[bp + "mlp.gate_proj.bias"])},
            "up_proj": {"weight": _t(sd[bp + "mlp.up_proj.weight"]), "bias": _arr(sd[bp + "mlp.up_proj.bias"])},
            "down_proj": {"weight": _t(sd[bp + "mlp.down_proj.weight"]), "bias": _arr(sd[bp + "mlp.down_proj.bias"])},
        }
        i += 1
    p["merger_ln_q"] = {"weight": _arr(sd["merger.ln_q.weight"])}
    p["merger_fc1"] = {"weight": _t(sd["merger.mlp.0.weight"]), "bias": _arr(sd["merger.mlp.0.bias"])}
    p["merger_fc2"] = {"weight": _t(sd["merger.mlp.2.weight"]), "bias": _arr(sd["merger.mlp.2.bias"])}
    return p


def test_qwen_tower_matches_hf(tiny_qwen):
    from vfm_vae_tpu.models.qwen import QwenVisionTower, qwen_patchify

    cfg, model = tiny_qwen
    sd = {k: np.array(v.detach().numpy(), copy=True) for k, v in model.state_dict().items()}
    params = convert_qwen(sd)

    tower = QwenVisionTower(
        hidden_size=64, depth=4, num_heads=4, mlp_dim=128, out_hidden_size=32,
        patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
        window_size=16, fullatt_block_indexes=(1, 3),
    )

    B, H, W = 2, 16, 16
    img = np.random.default_rng(0).random((B, H, W, 3)).astype(np.float32)
    patches, grid = qwen_patchify(jnp.asarray(img), 4, 2, 2)
    assert grid == (4, 4)

    # HF path: concat both images into one sequence with grid_thw rows.
    pt = np.asarray(patches).reshape(-1, patches.shape[-1])
    grid_thw = torch.tensor([[1, 4, 4]] * B)
    with torch.no_grad():
        out_ref = model(torch.from_numpy(pt), grid_thw=grid_thw)
    out_ref = out_ref.reshape(B, -1, 32).numpy()

    hidden, merged, pooled = tower.apply({"params": params}, patches, grid, collect=[0, 2])
    np.testing.assert_allclose(np.asarray(merged), out_ref, rtol=3e-4, atol=3e-4)
    assert hidden[0].shape == (B, 16, 64)
    assert pooled.shape == (B, 32)


def test_vfm_facade_qwen():
    """Facade dispatch for qwen: patchify + hook convention + merger -1."""
    import jax
    from vfm_vae_tpu.models.vfm import VFMEncoder, VFM_PRESETS

    VFM_PRESETS["qwen-tiny"] = dict(
        hidden_size=64, num_layers=4, num_heads=4, mlp_dim=128,
        patch_size=4, image_size=0, text_hidden_size=32,
        out_hidden_size=32, temporal_patch_size=2, spatial_merge_size=2,
        window_size=16, fullatt_block_indexes=(1, 3),
    )
    enc = VFMEncoder(model_name="qwen-tiny", scale_factor=1.0, patch_from_layers=[0, 2, -1])
    img = jnp.zeros((2, 16, 16, 3))
    variables = enc.init({"params": jax.random.PRNGKey(0)}, img, method=enc.encode_image)
    feats, pooled = enc.apply(variables, img, method=enc.encode_image)
    assert feats[0].shape == (2, 16, 64)   # block features at hidden size
    assert feats[2].shape == (2, 4, 32)    # merger output, N/4 tokens
    assert pooled.shape == (2, 32)
