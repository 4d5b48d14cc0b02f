"""End-to-end training-loop smoke test on the CPU mesh: tiny config,
synthetic shards, a few steps, snapshot written, auto-resume works."""

import json
import os

import numpy as np
import pytest

from tests.test_data import make_shards, write_c2t


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    import torch
    from transformers import SiglipVisionConfig, SiglipVisionModel

    root = tmp_path_factory.mktemp("loop")
    vfm = root / "siglip2-tiny-patch8-32"
    cfg = SiglipVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=8, num_channels=3,
    )
    torch.manual_seed(0)
    SiglipVisionModel(cfg).save_pretrained(vfm)

    data = root / "shards"
    data.mkdir()
    make_shards(data, n_shards=2, per_shard=24, size=40)
    c2t = write_c2t(root)
    return root, str(vfm), str(data), c2t


def make_cfg(root, vfm, data, c2t):
    from tests.test_generator_parity import G_KWARGS

    gk = dict(G_KWARGS)
    gk["vfm_name"] = vfm
    gk["class_name"] = "networks.generator.Generator"
    return dict(
        run_dir=str(root / "run"),
        training_set_kwargs=dict(
            class_name="training.data_wds.WdsWrapper",
            path=data, resolution=32, conditional=False, label_type="cls2text",
            cls_to_text_path=c2t, data_augmentation=True, one_epoch=False,
        ),
        G_kwargs=gk,
        D_kwargs=dict(
            class_name="networks.discriminator.ProjectedDiscriminator",
            use_stylegan_t_discriminator=True,
            use_patchgan_discriminator=False,
            dino_kwargs=dict(
                hidden_size=48, num_layers=2, num_heads=4, mlp_dim=96,
                patch_size=8, image_size=32, hooks=(0, 1), hook_patch=True,
            ),
        ),
        loss_kwargs=dict(
            l1_pixel_loss_weight=1.0,
            perceptual_loss_weight=0.0,
            multiscale_pixel_loss_weights=[0.1, 0.1, 0.1],
            multiscale_block_indices=[0, 1, 2],
            vf_loss_weight=5.0,
            use_adaptive_vf_loss=False,
            kl_loss_weight=1e-6,
            stylegan_t_discriminator_loss_weight=1.0,
            use_equivariance_regularization=False,
        ),
        G_opt_kwargs=dict(lr=1e-4, betas=[0.0, 0.99]),
        D_opt_kwargs=dict(lr=1e-4, betas=[0.0, 0.99]),
        batch_size=8,
        kimg_per_tick=0,  # tick every step
        image_snapshot_ticks=2,
        network_snapshot_ticks=2,
        total_kimg=10**9,
        ema_kimg=1.0,
        compute_dtype="float32",
        data_workers=1,
        metrics=["recon_suite"],
    )


@pytest.mark.heavy
def test_training_loop_runs_and_snapshots(tiny_env, mesh8):
    from vfm_vae_tpu.train.loop import training_loop

    root, vfm, data, c2t = tiny_env
    cfg = make_cfg(root, vfm, data, c2t)
    state = training_loop(mesh=mesh8, max_steps=3, **cfg)
    assert float(state.cur_nimg) == 24  # 3 steps x batch 8

    run = cfg["run_dir"]
    assert os.path.isfile(os.path.join(run, "stats.jsonl"))
    lines = [json.loads(l) for l in open(os.path.join(run, "stats.jsonl"))]
    assert any("Loss/G/l1_pixel_loss" in l for l in lines)
    snaps = [d for d in os.listdir(run) if d.startswith("network-snapshot-")]
    assert snaps, "no network snapshot written"
    samples = os.listdir(os.path.join(run, "train_samples"))
    assert any(s.startswith("val_gens_") for s in samples)
    assert "reals.png" in samples
    # In-loop metric rode the snapshot cadence.
    mfile = os.path.join(run, "metric-recon_suite.jsonl")
    assert os.path.isfile(mfile), "metric jsonl not written"
    m = json.loads(open(mfile).readline())
    assert np.isfinite(m["results"]["psnr"]) and 0 <= m["results"]["ssim"] <= 1


@pytest.mark.heavy
def test_training_loop_resumes(tiny_env, mesh8):
    from vfm_vae_tpu.train.checkpoint import find_latest_snapshot
    from vfm_vae_tpu.train.loop import training_loop

    root, vfm, data, c2t = tiny_env
    cfg = make_cfg(root, vfm, data, c2t)
    latest = find_latest_snapshot(cfg["run_dir"])
    assert latest is not None
    path, kimg = latest
    state = training_loop(
        mesh=mesh8, max_steps=1, resume_path=path, resume_kimg=kimg, **cfg
    )
    assert np.isfinite(float(state.cur_nimg))


@pytest.mark.heavy
def test_training_loop_conditional_text_snapshot(tiny_env, mesh8, tmp_path_factory,
                                                 monkeypatch):
    """conditional=True + label_type=cls2text across an image-snapshot tick:
    real_c is a DICT of token arrays — the snapshot path must slice its
    leaves, not the container (round-1 regression: loop.py real_c[:8])."""
    import torch
    from transformers import SiglipConfig, SiglipModel

    from vfm_vae_tpu.train.loop import training_loop

    root, _, data, c2t = tiny_env
    vfm = tmp_path_factory.mktemp("condvfm") / "siglip2-tiny-patch8-32"
    cfg_hf = SiglipConfig(
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
    SiglipModel(cfg_hf).save_pretrained(vfm)

    # The tiny checkpoint dir has no tokenizer files; stub the host-side
    # tokenizer (the dict-shaped output contract is what's under test).
    class StubTok:
        def __init__(self, *a, **k):
            pass

        def __call__(self, texts):
            ids = np.zeros((len(texts), 64), np.int32)
            for i, t in enumerate(texts):
                for j, ch in enumerate(t.encode()[:64]):
                    ids[i, j] = ch % 64
            return {"input_ids": ids, "attention_mask": ids >= 0}

    import vfm_vae_tpu.data.tokenize as tokenize_mod

    monkeypatch.setattr(tokenize_mod, "TextTokenizer", StubTok)

    cfg = make_cfg(root, str(vfm), data, c2t)
    cfg["run_dir"] = str(root / "run_cond")
    cfg["training_set_kwargs"]["conditional"] = True
    cfg["G_kwargs"] = dict(cfg["G_kwargs"], conditional=True,
                           label_type="cls2text", use_cross_attn=True)
    cfg["image_snapshot_ticks"] = 1
    cfg["network_snapshot_ticks"] = 0  # skip orbax save; image snap only
    cfg["metrics"] = []
    state = training_loop(mesh=mesh8, max_steps=1, **cfg)
    assert float(state.cur_nimg) == 8
    samples = os.listdir(os.path.join(cfg["run_dir"], "train_samples"))
    assert any(s.startswith("val_gens_") for s in samples), (
        "image snapshot with dict-shaped real_c did not materialize"
    )


def test_wandb_sink_inert_without_wandb(tmp_path):
    """WandbSink must be a no-op when wandb is absent or names unset
    (reference: training_loop.py:656-670 inits only when both are set)."""
    from vfm_vae_tpu.core.wandb_sink import WandbSink

    s = WandbSink(None, None, str(tmp_path))
    assert not s.active
    s.log({"a": 1.0}, step=0)
    s.log_metrics({"fid": 2.0}, step=0)
    s.finish()
    # project+name set but package missing -> warns once, stays inert
    s2 = WandbSink("proj", "run", str(tmp_path))
    assert not s2.active
    s2.log({"a": 1.0}, step=1)
    s2.finish()


def test_stage_configs_carry_wandb_keys():
    import glob
    import yaml

    for f in glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                    "configs", "*stage*.yaml")):
        cfg = yaml.safe_load(open(f))
        assert "wandb_project_name" in cfg and "wandb_run_name" in cfg, f


def test_cli_forwards_every_stage_yaml_key():
    """Every top-level stage-YAML key must be forwarded by train.py to
    training_loop (or be a train.py-level key like resume_path). Round-1
    shipped with fused_phases/wandb_*/data_workers silently dropped; this
    closes that whole bug class (reference wiring:
    training_loop.py:656-670 takes its kwargs 1:1 from the YAML)."""
    import glob
    import re

    import yaml

    root = os.path.join(os.path.dirname(__file__), "..")
    keys = set()
    for f in glob.glob(os.path.join(root, "configs", "*stage*.yaml")):
        keys |= set(yaml.safe_load(open(f)).keys())
    src = open(os.path.join(root, "train.py")).read()
    forwarded = set(re.findall(r'c\.get\("([A-Za-z_0-9]+)"', src))
    # Keys train.py consumes itself rather than forwarding.
    cli_level = {"run_dir"}
    dropped = keys - forwarded - cli_level
    assert not dropped, f"train.py drops YAML keys: {sorted(dropped)}"

    # And everything forwarded must be a real training_loop parameter, so
    # a typo'd key fails here instead of at launch.
    import inspect

    from vfm_vae_tpu.train.loop import training_loop

    params = set(inspect.signature(training_loop).parameters)
    unknown = (forwarded - cli_level - {"resume_path", "resume_kimg"}) - params
    assert not unknown, f"train.py forwards unknown kwargs: {sorted(unknown)}"
