#!/usr/bin/env python
"""Training-step throughput benchmark: full dual-phase (D + G) update of the
flagship f16d32 SigLIP2-L tokenizer on the local device(s).

Mirrors the stage-0 recipe shape (reference
configs/vfm_vae_f16d32_siglip2_stage_0_strong_alignment.yaml): L1 + LPIPS +
multiscale pixel + VF + KL + StyleGAN-T adversarial, train_all mask, frozen
VFM/DINO towers. Weights are random — this measures compute, not quality.

  python tools/bench_train.py [--batch 8] [--iters 3]

Measured (v5e, fused D+G step, remat on): B4 331 ms (12.08 img/s/chip),
B8 519 ms (15.41 — the per-chip sweet spot), B10 733 ms (13.63, HBM
pressure spills), B12/B16 OOM. --no-remat at B4 is SLOWER (344 ms) and
uses more HBM — per-layer remat wins on both axes, so it stays default.
Also tried and rejected: jax.checkpoint around the LPIPS towers — B12
still OOMs, B10 745 ms and B8 532 ms (both slightly worse than without),
so the VGG activations are not the high-water tensor and the flag was
dropped.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_rig(batch: int, remat: bool = True):
    """Flagship stage-0 training rig (shared with
    tools/profile_attribution.py --train): returns (trainer, state, real, rng)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import flax.traverse_util as tu

    import __graft_entry__ as ge
    from vfm_vae_tpu.models.discriminator import ProjectedDiscriminator
    from vfm_vae_tpu.models.generator import trainable_mask, trainable_path_predicates
    from vfm_vae_tpu.train.loss import TotalLoss, init_loss_state
    from vfm_vae_tpu.train.train_step import Trainer, TrainState
    from vfm_vae_tpu.train.optim import Adam
    from vfm_vae_tpu.train.lpips import LPIPS

    from vfm_vae_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    fn, (gv, _) = ge.entry()
    G = [c.cell_contents for c in fn.__closure__
         if type(c.cell_contents).__name__ == "Generator"][0]
    # Training needs rematerialization: the 256px backward at the flagship
    # size exhausts HBM without it (params are remat-invariant, reuse gv).
    G = G.clone(remat=remat)

    B = batch
    D = ProjectedDiscriminator(
        c_dim=0, vfm_name="siglip2", use_stylegan_t_discriminator=True,
        use_patchgan_discriminator=False, compute_dtype=jnp.bfloat16,
    )
    img2 = jnp.zeros((2, 256, 256, 3))
    dv = jax.jit(lambda r: D.init({"params": r}, img2, train=False))(jax.random.PRNGKey(1))
    lp = LPIPS()
    lpp = jax.jit(lambda r: lp.init(r, img2, img2))(jax.random.PRNGKey(2))["params"]
    loss = TotalLoss(
        G, D, vfm_name=G.vfm_name, lpips_module=lp,
        l1_pixel_loss_weight=1.0, perceptual_loss_weight=10.0,
        multiscale_pixel_loss_weights=[0.1] * 5,
        multiscale_block_indices=[0, 1, 2, 3, 4],
        vf_loss_weight=5.0, use_adaptive_vf_loss=False, kl_loss_weight=1e-6,
        stylegan_t_discriminator_loss_weight=1.0,
    )
    mask = trainable_mask(gv["params"], trainable_path_predicates("train_all"))
    d_flat = tu.flatten_dict(dv["params"], sep="/")
    d_mask = tu.unflatten_dict({k: not k.startswith("dino/") for k in d_flat}, sep="/")
    g_tx, d_tx = Adam(1e-4, mask=mask), Adam(1e-4, mask=d_mask)
    trainer = Trainer(loss, g_tx, d_tx, lpips_params=lpp, g_trainable_mask=mask,
                      batch_size=B)
    state = TrainState(
        g_params=gv["params"], d_params=dv["params"],
        g_bufs=gv.get("buffers", {}), d_bufs=dv.get("buffers", {}),
        ema_params=gv["params"],
        g_opt=g_tx.init(gv["params"]), d_opt=d_tx.init(dv["params"]),
        loss_state=init_loss_state(),
        cur_nimg=jnp.zeros((), jnp.float32),
    )
    real = jnp.asarray(np.random.default_rng(0).random((B, 256, 256, 3)), jnp.float32)
    rng = jax.random.PRNGKey(0)
    return trainer, state, real, rng


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--fused", action="store_true",
                    help="simultaneous D+G step sharing one G forward")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable per-layer rematerialization (A/B: HBM fit vs recompute cost)")
    args = ap.parse_args()

    import numpy as np
    import jax

    trainer, state, real, rng = build_rig(args.batch, remat=not args.no_remat)
    B = args.batch

    if args.fused:
        fused = jax.jit(trainer.fused_step, static_argnames=("eq", "blur_sigma"))
        t0 = time.perf_counter()
        state, _, total = fused(state, real, None, rng, (1.0, 0, False))
        print(f"fused_step compile+run {time.perf_counter() - t0:.1f}s "
              f"loss={float(total):.4f}", flush=True)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, _, total = fused(state, real, None, rng, (1.0, 0, False))
        _ = float(total)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"train step (fused D+G) B{B}: {dt * 1000:.1f} ms -> "
              f"{B / dt:.2f} img/s/chip (finite: {np.isfinite(float(total))})")
        return

    d_step = jax.jit(trainer.d_step, static_argnames=("eq", "blur_sigma"))
    g_step = jax.jit(trainer.g_step, static_argnames=("eq", "blur_sigma"))

    t0 = time.perf_counter()
    state, _, d_total = d_step(state, real, None, rng, (1.0, 0, False))
    print(f"d_step compile+run {time.perf_counter() - t0:.1f}s "
          f"d_loss={float(d_total):.4f}", flush=True)
    t0 = time.perf_counter()
    state, _, g_total = g_step(state, real, None, rng, (1.0, 0, False))
    print(f"g_step compile+run {time.perf_counter() - t0:.1f}s "
          f"g_loss={float(g_total):.4f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, _, d_total = d_step(state, real, None, rng, (1.0, 0, False))
        state, _, g_total = g_step(state, real, None, rng, (1.0, 0, False))
    _ = float(d_total)
    _ = float(g_total)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"train step (D+G) B{B}: {dt * 1000:.1f} ms -> {B / dt:.2f} img/s/chip "
          f"(finite: d={np.isfinite(float(d_total))} g={np.isfinite(float(g_total))})")


if __name__ == "__main__":
    main()
