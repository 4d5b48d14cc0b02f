"""Discriminator parity tests vs the reference torch modules.

The reference's full ProjectedDiscriminator needs a pretrained timm DINO (no
network here), so the DINO tower is validated against an HF ViT with
identical geometry, and the heads / PatchGAN branch against the reference
classes directly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.oracle import import_reference, to_nhwc, to_nchw_tensor

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(11)


def rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


def state_dict_np(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


# ------------------------------------------------------------- BatchNormLocal


def test_batchnorm_local_matches_reference():
    disc = import_reference("networks.discriminator")
    from vfm_vae_tpu.models.discriminator import BatchNormLocal

    torch.manual_seed(0)
    ref = disc.BatchNormLocal(16)
    with torch.no_grad():
        ref.weight.normal_()
        ref.bias.normal_()
    x = rand(6, 16, 10)  # (B, C, N) torch layout
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x))
    params = {"weight": ref.weight.detach().numpy(), "bias": ref.bias.detach().numpy()}
    # ours: token-major (B, N, C)
    y = BatchNormLocal(16).apply({"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), y_ref.numpy(), rtol=1e-4, atol=1e-5
    )


def test_batchnorm_local2d_matches_reference():
    disc = import_reference("networks.discriminator")
    from vfm_vae_tpu.models.discriminator import BatchNormLocal2d

    torch.manual_seed(1)
    ref = disc.BatchNormLocal2d(8)
    x = rand(5, 8, 6, 6)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x))
    params = {"weight": ref.weight.detach().numpy(), "bias": ref.bias.detach().numpy()}
    y = BatchNormLocal2d(8).apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(to_nhwc(y_ref), np.asarray(y), rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------- DiscHead


@pytest.mark.parametrize("c_dim", [0, 12])
def test_disc_head_matches_reference(c_dim):
    disc = import_reference("networks.discriminator")
    from vfm_vae_tpu.models.discriminator import DiscHead
    from vfm_vae_tpu.models.convert import convert_disc_head

    torch.manual_seed(2)
    ref = disc.DiscHead(32, c_dim).eval()
    x = rand(4, 32, 25)  # (B, C, N)
    c = rand(4, c_dim) if c_dim > 0 else None
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x), torch.from_numpy(c) if c is not None else None)
    params, buffers = convert_disc_head(state_dict_np(ref), "", c_dim)
    y = DiscHead(32, c_dim).apply(
        {"params": params, "buffers": buffers},
        jnp.asarray(x),
        jnp.asarray(c) if c is not None else None,
        train=False,
    )
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), rtol=1e-4, atol=1e-4)


def test_spectral_norm_power_iteration_matches_torch():
    """One training step of power iteration must track torch exactly."""
    disc = import_reference("networks.discriminator")
    from vfm_vae_tpu.models.discriminator import SpectralConv1d
    from vfm_vae_tpu.models.convert import convert_spectral_conv1d

    torch.manual_seed(3)
    ref = disc.SpectralConv1d(8, 8, kernel_size=1).train()
    sd = state_dict_np(ref)
    params, buffers = convert_spectral_conv1d(sd, "")
    x = rand(2, 8, 5)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x))
    y, mut = SpectralConv1d(8, 8, 1).apply(
        {"params": params, "buffers": buffers},
        jnp.asarray(x.transpose(0, 2, 1)),
        train=True,
        mutable=["buffers"],
    )
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 2, 1), y_ref.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mut["buffers"]["u"]),
        ref.weight_u.detach().numpy(),
        rtol=1e-4, atol=1e-4,
    )


# ------------------------------------------------------------- PatchGAN


@pytest.mark.parametrize("get_interm_feat", [False, True])
def test_multiscale_patchgan_matches_reference(get_interm_feat):
    disc = import_reference("networks.discriminator")
    from vfm_vae_tpu.models.discriminator import MultiscaleDiscriminator
    from vfm_vae_tpu.models.convert import convert_multiscale_discriminator

    torch.manual_seed(4)
    ref = disc.MultiscaleDiscriminator(
        input_nc=3, num_D=3, get_interm_feat=get_interm_feat
    )
    ref.apply(disc.weights_init)
    ref = ref.eval()
    x = rand(2, 3, 64, 64)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x))
    params = convert_multiscale_discriminator(
        state_dict_np(ref), "", get_interm_feat=get_interm_feat
    )
    out = MultiscaleDiscriminator(get_interm_feat=get_interm_feat).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    assert len(out) == len(out_ref)
    for ours_scale, ref_scale in zip(out, out_ref):
        assert len(ours_scale) == len(ref_scale)
        for o, r in zip(ours_scale, ref_scale):
            np.testing.assert_allclose(
                np.asarray(o), to_nhwc(r), rtol=1e-3, atol=1e-3
            )


# ------------------------------------------------------------- DINO tower


def test_dino_backbone_matches_hf_vit():
    """DINO ViT-S structure == HF ViTModel (eps 1e-6) at native res; our
    backbone must match HF block outputs with AddReadout applied."""
    from transformers import ViTConfig, ViTModel
    from vfm_vae_tpu.models.discriminator import DINOBackbone
    from vfm_vae_tpu.models.convert import convert_dino_timm

    cfg = ViTConfig(
        hidden_size=48, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=96, image_size=32, patch_size=8,
        layer_norm_eps=1e-6, attn_implementation="eager",
    )
    torch.manual_seed(5)
    hf = ViTModel(cfg, add_pooling_layer=False).eval()

    # Build a timm-style state dict from the HF one (fused qkv).
    sd_hf = hf.state_dict()
    sd = {}
    sd["patch_embed.proj.weight"] = sd_hf["embeddings.patch_embeddings.projection.weight"].numpy()
    sd["patch_embed.proj.bias"] = sd_hf["embeddings.patch_embeddings.projection.bias"].numpy()
    sd["cls_token"] = sd_hf["embeddings.cls_token"].numpy()
    sd["pos_embed"] = sd_hf["embeddings.position_embeddings"].numpy()
    for i in range(4):
        b = f"encoder.layer.{i}."
        sd[f"blocks.{i}.norm1.weight"] = sd_hf[b + "layernorm_before.weight"].numpy()
        sd[f"blocks.{i}.norm1.bias"] = sd_hf[b + "layernorm_before.bias"].numpy()
        sd[f"blocks.{i}.norm2.weight"] = sd_hf[b + "layernorm_after.weight"].numpy()
        sd[f"blocks.{i}.norm2.bias"] = sd_hf[b + "layernorm_after.bias"].numpy()
        qw = np.concatenate(
            [
                sd_hf[b + "attention.attention.query.weight"].numpy(),
                sd_hf[b + "attention.attention.key.weight"].numpy(),
                sd_hf[b + "attention.attention.value.weight"].numpy(),
            ]
        )
        qb = np.concatenate(
            [
                sd_hf[b + "attention.attention.query.bias"].numpy(),
                sd_hf[b + "attention.attention.key.bias"].numpy(),
                sd_hf[b + "attention.attention.value.bias"].numpy(),
            ]
        )
        sd[f"blocks.{i}.attn.qkv.weight"] = qw
        sd[f"blocks.{i}.attn.qkv.bias"] = qb
        sd[f"blocks.{i}.attn.proj.weight"] = sd_hf[b + "attention.output.dense.weight"].numpy()
        sd[f"blocks.{i}.attn.proj.bias"] = sd_hf[b + "attention.output.dense.bias"].numpy()
        sd[f"blocks.{i}.mlp.fc1.weight"] = sd_hf[b + "intermediate.dense.weight"].numpy()
        sd[f"blocks.{i}.mlp.fc1.bias"] = sd_hf[b + "intermediate.dense.bias"].numpy()
        sd[f"blocks.{i}.mlp.fc2.weight"] = sd_hf[b + "output.dense.weight"].numpy()
        sd[f"blocks.{i}.mlp.fc2.bias"] = sd_hf[b + "output.dense.bias"].numpy()

    params = convert_dino_timm(sd, prefix="")
    tower = DINOBackbone(
        hidden_size=48, num_layers=4, num_heads=4, mlp_dim=96,
        patch_size=8, image_size=32, hooks=(1, 3), hook_patch=True,
    )
    x = rand(2, 3, 32, 32)
    with torch.no_grad():
        out_hf = hf(torch.from_numpy(x), output_hidden_states=True)
    feats = tower.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(feats) == 3  # patch + hooks 1, 3
    for f, hs_idx in zip(feats, [0, 2, 4]):
        hs = out_hf.hidden_states[hs_idx].numpy()
        expected = (hs[:, 1:] + hs[:, :1]).transpose(0, 2, 1)  # AddReadout + T
        np.testing.assert_allclose(np.asarray(f), expected, rtol=1e-4, atol=1e-4)


def test_projected_discriminator_runs():
    from vfm_vae_tpu.models.discriminator import ProjectedDiscriminator

    D = ProjectedDiscriminator(
        c_dim=0,
        vfm_name="siglip2",
        use_patchgan_discriminator=True,
        get_interm_feat=True,
        dino_kwargs=dict(
            hidden_size=48, num_layers=2, num_heads=4, mlp_dim=96,
            patch_size=8, image_size=32, hooks=(0, 1), hook_patch=True,
        ),
    )
    x = jnp.asarray(rand(2, 64, 64, 3))
    variables = D.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out, mut = D.apply(
        variables, x, rng=jax.random.PRNGKey(1), train=True, mutable=["buffers"]
    )
    assert out.stylegan_t_logits.shape[0] == 2
    assert len(out.patchgan_logits) == 3
    assert len(out.patchgan_features) == 3
