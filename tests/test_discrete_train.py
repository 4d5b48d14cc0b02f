"""Discrete-mode (multi-codebook VQ) train step on the 8-device CPU mesh.

Round-1 covered the quantizer at module level (test_discrete_mode); this
exercises the TRAINING path the reference runs for discrete configs
(quant_utils.py:89-199 + loss.py:905-924): STE gradients through the
quantizer inside the jitted G step, vq/entropy loss terms in place of KL,
and the codebook-usage stat (the reference's cross-rank usage all-reduce
collapses to the in-graph global mean under jit, SURVEY §5.8).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # full discrete train step on the 8-device mesh

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    from transformers import SiglipVisionConfig, SiglipVisionModel
    import torch

    d = tmp_path_factory.mktemp("vfm") / "siglip2-tiny-patch8-32"
    cfg = SiglipVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=8, num_channels=3,
    )
    torch.manual_seed(0)
    SiglipVisionModel(cfg).save_pretrained(d)

    from tests.test_generator_parity import G_KWARGS
    from vfm_vae_tpu.models.discriminator import ProjectedDiscriminator
    from vfm_vae_tpu.models.generator import (
        Generator, trainable_mask, trainable_path_predicates,
    )
    from vfm_vae_tpu.train.loss import TotalLoss, init_loss_state
    from vfm_vae_tpu.train.optim import Adam
    from vfm_vae_tpu.train.train_step import Trainer, TrainState

    gk = dict(G_KWARGS)
    gk.update(
        compression_mode="discrete",
        use_kl_loss=False,
        vocab_width=16,
        vocab_size=64,
        num_codebooks=4,
        use_entropy_loss=True,
    )
    G = Generator(vfm_name=str(d), **gk)
    D = ProjectedDiscriminator(
        c_dim=0, vfm_name="siglip2", use_patchgan_discriminator=False,
        dino_kwargs=dict(
            hidden_size=48, num_layers=2, num_heads=4, mlp_dim=96,
            patch_size=8, image_size=32, hooks=(0, 1), hook_patch=True,
        ),
    )

    img = jnp.zeros((2, 32, 32, 3))
    gv = G.init({"params": jax.random.PRNGKey(0)}, img, train=False)
    dv = D.init({"params": jax.random.PRNGKey(1)}, img, train=False)

    loss = TotalLoss(
        G, D, vfm_name=str(d),
        l1_pixel_loss_weight=1.0,
        perceptual_loss_weight=0.0,
        vf_loss_weight=1.0,
        stylegan_t_discriminator_loss_weight=1.0,
        compression_mode="discrete",
        vq_loss_weight=1.0,
        entropy_loss_weight=0.05,
    )
    mask = trainable_mask(gv["params"], trainable_path_predicates("train_all"))
    import flax.traverse_util as tu

    d_flat = tu.flatten_dict(dv["params"], sep="/")
    d_mask = tu.unflatten_dict({k: not k.startswith("dino/") for k in d_flat}, sep="/")
    trainer = Trainer(
        loss, Adam(1e-4, mask=mask), Adam(1e-4, mask=d_mask),
        g_trainable_mask=mask, batch_size=8,
    )
    state = TrainState(
        g_params=gv["params"], d_params=dv["params"],
        g_bufs=gv.get("buffers", {}), d_bufs=dv.get("buffers", {}),
        ema_params=gv["params"],
        g_opt=trainer.g_tx.init(gv["params"]),
        d_opt=trainer.d_tx.init(dv["params"]),
        loss_state=init_loss_state(),
        cur_nimg=jnp.zeros((), jnp.float32),
    )
    return trainer, state


def test_discrete_dual_phase_step(rig, mesh8):
    import flax.traverse_util as tu

    from vfm_vae_tpu.parallel import shard_batch

    trainer, state = rig
    rng = jax.random.PRNGKey(0)
    real = jnp.asarray(
        np.random.default_rng(0).random((8, 32, 32, 3)), jnp.float32
    )
    with jax.sharding.set_mesh(mesh8):
        real_sh = shard_batch(mesh8, real)
        d_step = jax.jit(trainer.d_step, static_argnames=("eq", "blur_sigma"))
        g_step = jax.jit(trainer.g_step, static_argnames=("eq", "blur_sigma"))
        state1, _, d_total = d_step(state, real_sh, None, rng, (1.0, 0, False))
        state2, g_stats, g_total = g_step(state1, real_sh, None, rng, (1.0, 0, False))
    assert np.isfinite(float(d_total)) and np.isfinite(float(g_total))

    # VQ terms tracked (not the KL term), usage stat present and sane.
    assert "Loss/G/vq_loss" in g_stats and "Loss/G/entropy_loss" in g_stats
    usage = g_stats["Loss/G/codebook_usages"]
    # usage is a percentage (reference quant_utils.py usage*100 convention)
    assert 0.0 <= float(usage[1] / max(float(usage[0]), 1)) <= 100.0
    vq_mean = float(g_stats["Loss/G/vq_loss"][1] / g_stats["Loss/G/vq_loss"][0])
    assert np.isfinite(vq_mean) and vq_mean >= 0

    # STE: gradients reached the codebooks and the adapter below the
    # quantizer (the whole point of the straight-through estimator).
    p0 = tu.flatten_dict(state.g_params, sep="/")
    p2 = tu.flatten_dict(state2.g_params, sep="/")
    changed = [k for k in p0 if np.any(np.asarray(p0[k]) != np.asarray(p2[k]))]
    assert any("quantize" in k or "codebook" in k or "embedding" in k
               for k in changed), sorted(changed)[:10]
    assert any(k.startswith("ldm_adapter/") for k in changed)
