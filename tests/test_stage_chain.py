"""The four-stage training recipe as a CHAIN (reference: README.md:298-300 —
stage N+1 resumes stage N's snapshot with a changed YAML: loss set, train
mode, and for stage 3 a changed discriminator).

Covers the stage-to-stage handoff no single-stage test sees:
  stage 0  train_all, strong alignment (vf 5.0)
  stage 1  train_all, weak alignment (vf 0.5), resume_path = stage-0 snap
  stage 2  train_decoder + SSIM finetune, resume_path = stage-1 snap
  stage 3  train_the_second_half_decoder + PatchGAN D (+feature matching),
           resume_path = stage-2 snap — D grows patchgan params, so resume
           exercises the loose-merge path (reference strict=False load)

Asserts (a) every stage resumes from its predecessor (frozen-tower params
bit-stable through the whole chain), (b) params OUTSIDE a stage's trainable
set are bit-identical before/after that stage while trainable params move,
(c) the final snapshot still encode/decodes.

Geometry is 64px (vs the usual 32px rigs) so `train_the_second_half_decoder`
has a non-empty trainable set: the predicate freezes blocks at <=32px
(generator.py trainable_path_predicates; reference generator.py:1100-1128).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # four training_loop compiles, minutes each

from tests.test_data import make_shards, write_c2t


RES = 64


@pytest.fixture(scope="module")
def chain_env(tmp_path_factory):
    import torch
    from transformers import SiglipVisionConfig, SiglipVisionModel

    root = tmp_path_factory.mktemp("chain")
    vfm = root / "siglip2-tiny-patch8-32"
    torch.manual_seed(0)
    SiglipVisionModel(SiglipVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=8, num_channels=3,
    )).save_pretrained(vfm)
    data = root / "shards"
    data.mkdir()
    make_shards(data, n_shards=1, per_shard=16, size=72)
    return root, str(vfm), str(data), write_c2t(root)


def stage_cfg(root, vfm, data, c2t, stage: int, resume: str = None):
    from tests.test_generator_parity import G_KWARGS

    gk = dict(G_KWARGS)
    gk.update(vfm_name=vfm, img_resolution=RES,
              class_name="networks.generator.Generator")
    lk = dict(
        l1_pixel_loss_weight=1.0,
        perceptual_loss_weight=0.0,
        multiscale_pixel_loss_weights=[0.1, 0.1, 0.1],
        multiscale_block_indices=[0, 1, 2],
        vf_loss_weight=5.0,
        use_adaptive_vf_loss=False,
        kl_loss_weight=1e-6,
        stylegan_t_discriminator_loss_weight=1.0,
        use_equivariance_regularization=False,
    )
    dk = dict(
        class_name="networks.discriminator.ProjectedDiscriminator",
        use_stylegan_t_discriminator=True,
        use_patchgan_discriminator=False,
        dino_kwargs=dict(
            hidden_size=48, num_layers=2, num_heads=4, mlp_dim=96,
            patch_size=8, image_size=32, hooks=(0, 1), hook_patch=True,
        ),
    )
    if stage == 0:
        gk["train_mode"] = "train_all"
    elif stage == 1:  # weak alignment
        gk["train_mode"] = "train_all"
        lk["vf_loss_weight"] = 0.5
    elif stage == 2:  # decoder-only SSIM finetune
        gk["train_mode"] = "train_decoder"
        lk.update(vf_loss_weight=0.0, kl_loss_weight=0.0, ssim_loss_weight=1.0)
    else:  # stage 3: second-half decoder + PatchGAN
        gk["train_mode"] = "train_the_second_half_decoder"
        lk.update(vf_loss_weight=0.0, kl_loss_weight=0.0,
                  l1_pixel_loss_weight=0.0,
                  multiscale_pixel_loss_weights=[0.0, 0.0, 0.0],
                  patchgan_discriminator_loss_weight=1.0,
                  feature_matching_loss_weight=10.0)
        dk.update(use_patchgan_discriminator=True, get_interm_feat=True)
    return dict(
        run_dir=str(root / f"run_stage{stage}"),
        training_set_kwargs=dict(
            class_name="training.data_wds.WdsWrapper",
            path=data, resolution=RES, conditional=False, label_type="cls2text",
            cls_to_text_path=c2t, data_augmentation=False, one_epoch=False,
        ),
        G_kwargs=gk, D_kwargs=dk, loss_kwargs=lk,
        G_opt_kwargs=dict(lr=1e-3, betas=[0.0, 0.99]),
        D_opt_kwargs=dict(lr=1e-3, betas=[0.0, 0.99]),
        batch_size=8, kimg_per_tick=0, image_snapshot_ticks=0,
        network_snapshot_ticks=2, total_kimg=10**9, ema_kimg=1.0,
        compute_dtype="float32", data_workers=1, metrics=[],
        resume_path=resume, resume_kimg=0,
    )


def _snap(run_dir):
    from vfm_vae_tpu.train.checkpoint import find_latest_snapshot

    latest = find_latest_snapshot(run_dir)
    assert latest is not None, f"no snapshot in {run_dir}"
    return latest[0]


def _flat_g(path):
    import flax.traverse_util as tu

    from vfm_vae_tpu.train.checkpoint import load_snapshot

    return tu.flatten_dict(load_snapshot(path)["g_params"], sep="/")


def _split(flat, preds):
    frozen, trainable = {}, {}
    for k, v in flat.items():
        (trainable if any(k.startswith(p) for p in preds) else frozen)[k] = v
    return frozen, trainable


def _assert_identical(a, b, keys, label):
    for k in keys:
        np.testing.assert_array_equal(
            np.asarray(a[k]), np.asarray(b[k]),
            err_msg=f"{label}: frozen param {k} changed across the stage")


def _assert_some_moved(a, b, keys, label):
    moved = [k for k in keys
             if not np.array_equal(np.asarray(a[k]), np.asarray(b[k]))]
    assert moved, f"{label}: no trainable param moved — stage did not train"


def test_four_stage_recipe_chain(chain_env, mesh8):
    from vfm_vae_tpu.models.generator import trainable_path_predicates
    from vfm_vae_tpu.train.loop import training_loop

    root, vfm, data, c2t = chain_env
    snaps, flats = [], []
    for stage in range(4):
        cfg = stage_cfg(root, vfm, data, c2t, stage,
                        resume=snaps[-1] if snaps else None)
        state = training_loop(mesh=mesh8, max_steps=2, **cfg)
        assert np.isfinite(float(state.cur_nimg))
        snaps.append(_snap(cfg["run_dir"]))
        flats.append(_flat_g(snaps[-1]))

    # Shapes/keys stable through the whole chain (same G architecture).
    assert all(set(f) == set(flats[0]) for f in flats[1:])

    # (a) Resume provenance: the frozen VFM tower is initialized from the
    # SNAPSHOT at every hop and never trained, so its bytes must survive
    # all three handoffs bit-exactly.
    vfm_keys = [k for k in flats[0] if k.startswith("vfm")]
    assert vfm_keys, "expected frozen vfm params in g_params"
    for i in (1, 2, 3):
        _assert_identical(flats[i - 1], flats[i], vfm_keys, f"stage{i} vfm")

    # (b) Per-stage freezing. Build each stage's predicate set exactly the
    # way the loop does.
    from tests.test_generator_parity import G_KWARGS
    from vfm_vae_tpu.models.generator import Generator

    G = Generator(**{**G_KWARGS, "img_resolution": RES, "vfm_name": vfm})
    kw = dict(conditional=False, label_type="cls2text",
              block_resolutions=G.block_resolutions,
              concat_z_block_indices=G.concat_z_block_indices)

    # stage 1 (train_all): adapter/synthesis/mapping may all move.
    p1 = trainable_path_predicates("train_all", **kw)
    _assert_some_moved(flats[0], flats[1],
                       [k for k in flats[0]
                        if any(k.startswith(p) for p in p1)], "stage1")

    # stage 2 (train_decoder): everything outside
    # {synthesis, mapping/mlp, ldm_adapter/post_quant} is frozen — in
    # particular the encoder half of the adapter (final_quant etc).
    p2 = trainable_path_predicates("train_decoder", **kw)
    frozen2, train2 = _split(flats[1], p2)
    enc_side = [k for k in frozen2 if k.startswith("ldm_adapter")]
    assert enc_side, "expected frozen encoder-side adapter params"
    _assert_identical(flats[1], flats[2], list(frozen2), "stage2")
    _assert_some_moved(flats[1], flats[2], list(train2), "stage2")

    # stage 3 (train_the_second_half_decoder): only blocks >32px move;
    # b0..b2, mapping, and the whole adapter are bit-frozen.
    p3 = trainable_path_predicates("train_the_second_half_decoder", **kw)
    assert p3 == ["synthesis/b3"], p3
    frozen3, train3 = _split(flats[2], p3)
    first_half = [k for k in frozen3 if k.startswith(("synthesis/b0",
                                                      "synthesis/b1",
                                                      "synthesis/b2"))]
    assert first_half, "expected first-half decoder blocks in frozen set"
    _assert_identical(flats[2], flats[3], list(frozen3), "stage3")
    _assert_some_moved(flats[2], flats[3], list(train3), "stage3")

    # (c) The final snapshot still tokenizes: encode -> decode, finite.
    import jax
    import jax.numpy as jnp

    from vfm_vae_tpu.train.checkpoint import load_snapshot

    snap = load_snapshot(snaps[-1])
    img = jnp.zeros((2, RES, RES, 3))
    params = jax.tree_util.tree_map(jnp.asarray, snap["ema_params"])
    v = {"params": params, "buffers": snap.get("g_bufs", {})}
    z = G.apply(v, img, rng=None, method=G.encode)
    out = G.apply(v, z, method=G.decode)
    assert np.isfinite(np.asarray(out)).all() and out.shape == (2, RES, RES, 3)
