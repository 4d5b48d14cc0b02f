#!/usr/bin/env python
"""Training-step throughput benchmark: full dual-phase (D + G) update of the
flagship f16d32 SigLIP2-L tokenizer on the local device(s).

Mirrors the stage-0 recipe shape (reference
configs/vfm_vae_f16d32_siglip2_stage_0_strong_alignment.yaml): L1 + LPIPS +
multiscale pixel + VF + KL + StyleGAN-T adversarial, train_all mask, frozen
VFM/DINO towers. Weights are random — this measures compute, not quality.

  python tools/bench_train.py [--batch 8] [--iters 3]

Measured (v5e, fused D+G step): the complete batch x remat-policy matrix
lives in README "Training-step perf pass" — headline: B8-dots 447 ms
(17.89 img/s/chip, the latency/memory sweet spot), B16-full 883 ms
(18.12, peak throughput), B16-dots/names and B24+ OOM; see
tools/bench_train_memory.py for the HBM accounting. Round-2 history
(donation off): B4 331 ms, B8 519 ms, B10 733 ms, B12/B16 OOM.
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


def build_rig(batch: int, remat="full"):
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
        # Distinct buffers: donating one buffer from two TrainState slots
        # is an XLA INVALID_ARGUMENT (see parallel/mesh.py place_state).
        ema_params=jax.tree_util.tree_map(jnp.copy, gv["params"]),
        g_opt=g_tx.init(gv["params"]), d_opt=d_tx.init(dv["params"]),
        loss_state=init_loss_state(),
        cur_nimg=jnp.zeros((), jnp.float32),
    )
    real = jnp.asarray(np.random.default_rng(0).random((B, 256, 256, 3)), jnp.float32)
    rng = jax.random.PRNGKey(0)
    return trainer, state, real, rng


V5E_PEAK_TFLOPS = 197.0  # bf16 MXU peak, TPU v5e (serving dossier baseline)
V5E_HBM_GBPS = 819.0  # HBM bandwidth peak, TPU v5e


def _step_flops(jitted, state, real, *rest):
    """(FLOPs, bytes-accessed) of one step via XLA cost analysis, probed at
    batch 2 and scaled linearly to the bench batch (0.0 if unavailable).
    Bytes-accessed is an HLO-level traffic proxy: each buffer is counted
    per producer/consumer INCLUDING reuse that fusion keeps in VMEM, so it
    over-counts true DRAM bytes (measured 123% of the HBM peak at the
    known-bandwidth-bound flagship B8 step) — read it as "the program sits
    at N% of the bandwidth roofline", saturating near/above 100.

    Why the dance: on this backend Lowered.cost_analysis() returns None —
    only Compiled.cost_analysis() has numbers — but compiling the probe
    AOT LOADS a second copy of the program onto the chip, and at B8 the
    duplicate executable alone OOMs HBM (measured). A B2 probe is small
    enough to coexist; conv/matmul FLOPs are exactly batch-linear and the
    non-batch terms (optimizer elementwise, EMA) are FLOPs-noise."""
    import jax

    B = real.shape[0]
    probe_b = min(2, B)
    try:
        ca = jitted.lower(state, real[:probe_b], *rest).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        scale = B / probe_b
        return (float(ca.get("flops", 0.0)) * scale,
                float(ca.get("bytes accessed", 0.0)) * scale)
    except Exception:
        return 0.0, 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--fused", action="store_true",
                    help="simultaneous D+G step sharing one G forward")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable per-layer rematerialization (A/B: HBM fit vs recompute cost)")
    ap.add_argument("--remat-policy", default="full",
                    choices=["full", "dots", "names"],
                    help="decoder checkpoint policy (models/synthesis.remat_layer): "
                         "full = recompute everything; dots = save matmul outputs; "
                         "names = save only the dwconv_out residuals")
    ap.add_argument("--no-donate", action="store_true",
                    help="disable TrainState buffer donation (A/B vs the loop default)")
    ap.add_argument("--no-mfu", action="store_true",
                    help="skip the FLOPs probe (a second B2 compile, "
                         "several minutes through the tunnel)")
    ap.add_argument("--pipeline", type=int, default=4,
                    help="steady-state dispatch depth (0 = force every step, "
                         "matches the pre-r3 loop; default mirrors train/loop.py)")
    args = ap.parse_args()

    import numpy as np
    import jax

    trainer, state, real, rng = build_rig(
        args.batch, remat=False if args.no_remat else args.remat_policy)
    B = args.batch
    donate = () if args.no_donate else ("state",)

    def run(step_fns, label):
        nonlocal state
        # Warm-up / compile (also reports per-step FLOPs -> MFU).
        flops = nbytes = 0.0
        for name, fn in step_fns:
            t0 = time.perf_counter()
            if not args.no_mfu:
                f, by = _step_flops(fn, state, real, None, rng, (1.0, 0, False))
                flops += f
                nbytes += by
            state_new, _, total = fn(state, real, None, rng, (1.0, 0, False))
            print(f"{name} compile+run {time.perf_counter() - t0:.1f}s "
                  f"loss={float(total):.4f}", flush=True)
            state = state_new
        # Steady state: depth-K pipeline of step totals (train/loop.py
        # pattern) — dispatch runs ahead of the device; every total is
        # still forced to host inside the timed window.
        inflight = []
        t0 = time.perf_counter()
        for _ in range(args.iters):
            for _, fn in step_fns:
                state, _, total = fn(state, real, None, rng, (1.0, 0, False))
                inflight.append(total)
                if args.pipeline == 0 or len(inflight) > args.pipeline:
                    _ = float(inflight.pop(0))
        while inflight:
            _ = float(inflight.pop(0))
        dt = (time.perf_counter() - t0) / args.iters
        mfu = flops / dt / (V5E_PEAK_TFLOPS * 1e12)
        hbm = nbytes / dt / (V5E_HBM_GBPS * 1e9)
        print(f"train step ({label}) B{B}: {dt * 1000:.1f} ms -> "
              f"{B / dt:.2f} img/s/chip | step {flops / 1e12:.2f} TFLOP "
              f"({flops / 1e12 / B:.2f}/img) -> MFU {mfu * 100:.1f}% "
              f"| {nbytes / 1e9:.1f} GB accessed -> ~{hbm * 100:.1f}% of "
              f"HBM roofline (HLO bytes proxy) "
              f"(donate={'off' if args.no_donate else 'on'}, "
              f"remat={'off' if args.no_remat else args.remat_policy}, "
              f"pipeline={args.pipeline}, finite={np.isfinite(float(total))})")

    jit_kw = dict(static_argnames=("eq", "blur_sigma"), donate_argnames=donate)
    if args.fused:
        run([("fused_step", jax.jit(trainer.fused_step, **jit_kw))], "fused D+G")
    else:
        run([("d_step", jax.jit(trainer.d_step, **jit_kw)),
             ("g_step", jax.jit(trainer.g_step, **jit_kw))], "D+G")


if __name__ == "__main__":
    main()
