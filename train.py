#!/usr/bin/env python
"""Training CLI (reference: train.py — YAML config, derivation pass,
run-dir setup, auto-resume, launch training_loop).

Usage:  python train.py --config configs/<name>.yaml [--max-steps N]
Single-host multi-chip runs use all local TPU devices through one process
(no torchrun equivalent needed — jit + mesh replaces process-per-device).
Multi-host TPU pod slices: run the same command on every host with
--multihost (or set VFM_VAE_MULTIHOST=1); jax.distributed.initialize()
auto-discovers the coordinator from the TPU pod metadata (the reference's
torchrun/NCCL bootstrap, train.py:119-122, maps to this one call).
"""

from __future__ import annotations

import argparse
import os
import shutil

import yaml


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="YAML config path")
    parser.add_argument("--max-steps", type=int, default=None, help="debug: stop after N steps")
    parser.add_argument("--no-resume", action="store_true", help="disable auto-resume")
    parser.add_argument(
        "--multihost", action="store_true",
        help="initialize jax.distributed for a multi-host TPU pod slice",
    )
    args = parser.parse_args()

    if os.environ.get("VFM_VAE_PLATFORM"):
        # Debug/CI hook: force a JAX backend (e.g. cpu) before any client
        # is created. Env vars alone don't stick here — the hosting image's
        # sitecustomize registers the TPU plugin at interpreter start — so
        # this must go through jax.config (same pattern as __graft_entry__).
        import jax

        jax.config.update("jax_platforms", os.environ["VFM_VAE_PLATFORM"])

    if args.multihost or os.environ.get("VFM_VAE_MULTIHOST") == "1":
        import jax

        # On TPU pods all arguments are auto-detected from the environment.
        # VFM_VAE_COORD/_NPROC/_PROC_ID override for explicit bootstraps
        # (e.g. the localhost 2-process CPU smoke,
        # tests/test_multihost_real.py; CPU cross-process collectives ride
        # gloo, jax's default).
        coord = os.environ.get("VFM_VAE_COORD")
        if coord:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["VFM_VAE_NPROC"]),
                process_id=int(os.environ["VFM_VAE_PROC_ID"]),
            )
        else:
            jax.distributed.initialize()

    from vfm_vae_tpu.core.config import derive_config, load_config
    from vfm_vae_tpu.core.logging import Logger, print0
    from vfm_vae_tpu.train.checkpoint import find_latest_snapshot
    from vfm_vae_tpu.train.loop import training_loop

    c = derive_config(load_config(args.config))
    run_dir = c.get("run_dir", "runs/default")
    os.makedirs(run_dir, exist_ok=True)

    # Attach the log tee before any launch-path prints so auto-resume
    # decisions are recorded in run_dir/log.txt (debuggability: a restarted
    # job's log must say what it resumed from).
    logger = Logger(os.path.join(run_dir, "log.txt"), mode="a")

    # Auto-resume: newest snapshot in run_dir (reference: train.py:148-162).
    if not args.no_resume and not c.get("resume_path"):
        latest = find_latest_snapshot(run_dir)
        if latest is not None:
            c["resume_path"], kimg = latest
            c["resume_kimg"] = kimg
            print0(f"[auto-resume] found {c['resume_path']} at {kimg} kimg")

    # Provenance: dump the resolved config (reference: train.py:172-173).
    from vfm_vae_tpu.core.config import to_plain

    with open(os.path.join(run_dir, "training_config.yaml"), "w") as f:
        yaml.safe_dump(to_plain(c), f, default_flow_style=False)

    try:
        training_loop(
            run_dir=run_dir,
            training_set_kwargs=c.get("training_set_kwargs", {}),
            G_kwargs=c.get("G_kwargs", {}),
            D_kwargs=c.get("D_kwargs", {}),
            loss_kwargs=c.get("loss_kwargs", {}),
            G_opt_kwargs=c.get("G_opt_kwargs", {}),
            D_opt_kwargs=c.get("D_opt_kwargs", {}),
            batch_size=c.get("batch_size", 512),
            accumulate_gradients=c.get("accumulate_gradients", 1),
            kimg_per_tick=c.get("kimg_per_tick", 10),
            image_snapshot_ticks=c.get("image_snapshot_ticks", 100),
            network_snapshot_ticks=c.get("network_snapshot_ticks", 100),
            total_kimg=c.get("total_kimg", 20000),
            ema_kimg=c.get("ema_kimg", 160.0),
            ema_rampup=c.get("ema_rampup", 0.05),
            random_seed=c.get("random_seed", 42),
            resume_path=c.get("resume_path"),
            resume_kimg=c.get("resume_kimg", 0),
            resume_discriminator=c.get("resume_discriminator", True),
            lpips_ckpt=c.get("lpips_ckpt"),
            allow_random_lpips=c.get("allow_random_lpips", False),
            metrics=c.get("metrics", []),
            in_loop_metric_batches=c.get("in_loop_metric_batches", 2),
            max_steps=args.max_steps,
            compute_dtype=c.get("compute_dtype", "bfloat16"),
            data_workers=c.get("data_workers", 3),
            fused_phases=c.get("fused_phases", False),
            wandb_project_name=c.get("wandb_project_name"),
            wandb_run_name=c.get("wandb_run_name"),
        )
    finally:
        logger.close()


if __name__ == "__main__":
    main()
