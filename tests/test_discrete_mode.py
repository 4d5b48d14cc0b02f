"""Discrete (VQ) compression mode: end-to-end generator, token round trip,
usage telemetry, and the reference-oracle VQ parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.oracle import import_reference

torch = pytest.importorskip("torch")


def test_vector_quantizer_matches_reference():
    qu = import_reference("networks.utils.quant_utils")
    from vfm_vae_tpu.models.quantize import VectorQuantizer

    torch.manual_seed(0)
    ref = qu.VectorQuantizer(vocab_size=32, vocab_width=8).eval()
    ref.init_vocab(eini=-1)
    codebook = np.array(ref.codebook.weight.detach().numpy(), copy=True)

    f = np.random.default_rng(0).standard_normal((2, 9, 8)).astype(np.float32)
    with torch.no_grad():
        f_hat_ref, vq_ref, _, usage_ref = ref(torch.from_numpy(f))

    ours = VectorQuantizer(vocab_size=32, vocab_width=8)
    variables = {
        "params": {"codebook": codebook},
        "buffers": {
            "vocab_usage": np.zeros(32, np.float32),
            "usage_record_times": np.zeros((), np.int32),
        },
    }
    (f_hat, vq, ent, usage), mut = ours.apply(
        variables, jnp.asarray(f), train=False, mutable=["buffers"]
    )
    np.testing.assert_allclose(np.asarray(f_hat), f_hat_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(vq), float(vq_ref), rtol=1e-4)
    np.testing.assert_allclose(float(usage), float(usage_ref), rtol=1e-4)


def test_vqm_token_roundtrip():
    from vfm_vae_tpu.models.quantize import VectorQuantizerM

    m = VectorQuantizerM(vocab_size=64, vocab_width=16, num_codebooks=4)
    f = jnp.asarray(np.random.default_rng(1).standard_normal((2, 9, 16)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), f)

    idx = m.apply(variables, f, method=m.f_to_idx)
    assert idx.shape == (2, 4, 9)
    feats = m.apply(variables, idx, method=m.idx_to_f)
    assert feats.shape == (2, 9, 16)
    # idx_to_f of f_to_idx equals the quantized embedding (normalized codes).
    (f_hat, *_), _ = m.apply(variables, f, train=False, mutable=["buffers"])
    np.testing.assert_allclose(np.asarray(feats), np.asarray(f_hat), rtol=1e-4, atol=1e-5)


def test_discrete_generator_end_to_end(tmp_path):
    import torch as _torch
    from transformers import SiglipVisionConfig, SiglipVisionModel

    from tests.test_generator_parity import G_KWARGS
    from vfm_vae_tpu.models.generator import Generator

    d = tmp_path / "siglip2-tiny-patch8-32"
    cfg = SiglipVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=8, num_channels=3,
    )
    _torch.manual_seed(0)
    SiglipVisionModel(cfg).save_pretrained(d)

    gk = dict(G_KWARGS)
    gk.update(
        compression_mode="discrete", vocab_width=16, vocab_size=64,
        num_codebooks=4, use_entropy_loss=True, use_kl_loss=False,
    )
    G = Generator(vfm_name=str(d), **gk)
    img = jnp.asarray(np.random.default_rng(2).random((2, 32, 32, 3)), jnp.float32)
    variables = G.init({"params": jax.random.PRNGKey(0)}, img, train=False)
    out, mut = G.apply(
        variables, img, rng=jax.random.PRNGKey(1), train=True, mutable=["buffers"]
    )
    assert out.gen_img.shape == (2, 32, 32, 3)
    assert np.isfinite(float(out.vq_loss))
    assert np.isfinite(float(out.entropy_loss))
    assert float(out.codebook_usages) > 0
    # usage EMA buffers updated in train mode
    usage = mut["buffers"]["ldm_adapter"]["quantizer"]["codebook_0"]["usage_record_times"]
    assert int(usage) == 1


def test_stage3_config_and_masks():
    """Stage-3 machinery: config loads, second-half-decoder mask freezes the
    low-res blocks and the adapter."""
    from vfm_vae_tpu.core.config import derive_config, load_config
    from vfm_vae_tpu.models.generator import trainable_path_predicates

    c = derive_config(load_config("configs/vfm_vae_f16d32_siglip2_stage_3_patchgan_ft.yaml"))
    assert c["G_kwargs"]["train_mode"] == "train_the_second_half_decoder"
    assert c["D_kwargs"]["use_patchgan_discriminator"]
    assert c["loss_kwargs"]["feature_matching_loss_weight"] == 10.0

    preds = trainable_path_predicates(
        "train_the_second_half_decoder",
        block_resolutions=[8, 16, 32, 64, 128, 256],
        concat_z_block_indices=[0, 1, 2, 3],
    )
    assert "synthesis/b3" in preds and "synthesis/b5" in preds
    assert "synthesis/b0" not in preds and "ldm_adapter" not in preds
    assert "synthesis/z_convs_3" in preds and "synthesis/z_convs_0" not in preds
