"""Conditional paths: cls2text text conditioning (SigLIP text tower +
cross-attention + mapping concat) and cls2id one-hot conditioning."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def cond_vfm_dir(tmp_path_factory):
    from transformers import SiglipConfig, SiglipModel

    d = tmp_path_factory.mktemp("vfm") / "siglip2-tiny-patch8-32"
    cfg = SiglipConfig(
        vision_config=dict(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, image_size=32, patch_size=8, num_channels=3,
        ),
        text_config=dict(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, vocab_size=64, max_position_embeddings=64,
        ),
    )
    torch.manual_seed(0)
    SiglipModel(cfg).save_pretrained(d)
    return str(d)


def test_conditional_text_generator(cond_vfm_dir):
    from tests.test_generator_parity import G_KWARGS
    from vfm_vae_tpu.models.generator import Generator

    gk = dict(G_KWARGS)
    gk.update(conditional=True, label_type="cls2text", use_cross_attn=True)
    G = Generator(vfm_name=cond_vfm_dir, **gk)
    assert G.c_dim == 64  # text hidden size
    assert G.w_dim == 64 + 64  # mlp output + text embed concat

    img = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)), jnp.float32)
    text = {
        "input_ids": jnp.asarray(np.random.default_rng(1).integers(0, 64, (2, 64))),
        "attention_mask": jnp.ones((2, 64), bool),
    }
    variables = G.init({"params": jax.random.PRNGKey(0)}, img, text, train=False)
    out = G.apply(variables, img, text, rng=jax.random.PRNGKey(1), train=False)
    assert out.gen_img.shape == (2, 32, 32, 3)
    assert out.global_text_tokens.shape == (2, 64)
    assert np.isfinite(np.asarray(out.gen_img)).all()

    # Text tower params exist and cross-attention modules were built.
    import flax.traverse_util as tu

    keys = tu.flatten_dict(variables["params"], sep="/")
    assert any(k.startswith("vfm_encoder/text_tower/") for k in keys)
    assert any("cross_attns_0" in k for k in keys)


def test_conditional_cls2id_generator(cond_vfm_dir):
    from tests.test_generator_parity import G_KWARGS
    from vfm_vae_tpu.models.generator import Generator

    gk = dict(G_KWARGS)
    gk.update(conditional=True, label_type="cls2id", label_dim=10,
              z_dim_for_mapping_mlp_output=64)
    G = Generator(vfm_name=cond_vfm_dir, **gk)
    assert G.c_dim == 10 and G.w_dim == 64

    img = jnp.asarray(np.random.default_rng(2).random((2, 32, 32, 3)), jnp.float32)
    onehot = jnp.asarray(np.eye(10, dtype=np.float32)[[3, 7]])
    variables = G.init({"params": jax.random.PRNGKey(0)}, img, onehot, train=False)
    out = G.apply(variables, img, onehot, rng=jax.random.PRNGKey(1), train=False)
    assert out.gen_img.shape == (2, 32, 32, 3)
    import flax.traverse_util as tu

    keys = tu.flatten_dict(variables["params"], sep="/")
    assert any(k.startswith("mapping/embed/") for k in keys)
