#!/usr/bin/env python
"""EQ-bucket compile-cost measurement (round-2 VERDICT item 8).

EQ regularization makes each (scale, rot, is_prior) bucket its own jit
variant of the G step (models/adapter.py EquivarianceTransform: up to 20
buckets), so a stage-0 start pays up to 20 step compiles before the
sampler has visited every bucket. This tool AOT-compiles the full bucket
set and reports per-bucket + total compile seconds, with the persistent
XLA cache enabled — run it twice to measure the warm-restart cost the
cache buys (second run should be ~free).

  python tools/bench_eq_compile.py [--geometry tiny|flagship] [--batch 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def eq_buckets():
    from vfm_vae_tpu.models.adapter import EquivarianceTransform as EQ

    buckets = [(s, r, False) for s in EQ.SCALES for r in range(4)]
    buckets += [(s, 0, True) for s in EQ.PRIOR_SCALES] + [(1.0, 0, True)]
    return buckets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geometry", choices=("tiny", "flagship"), default="tiny")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--fused", action="store_true", help="compile the fused D+G step")
    args = ap.parse_args()

    from vfm_vae_tpu.core.compile_cache import enable_persistent_cache

    cache = enable_persistent_cache()
    print(f"persistent cache: {cache}")

    import numpy as np
    import jax
    import jax.numpy as jnp
    import flax.traverse_util as tu

    if args.geometry == "tiny":
        import __graft_entry__ as ge

        vfm_dir = ge._write_tiny_vfm()
        from vfm_vae_tpu.models.generator import Generator

        G = Generator(**ge._tiny_g_kwargs(vfm_dir))
        res = 32
    else:
        from __graft_entry__ import flagship_generator

        G = flagship_generator()
        res = 256

    from vfm_vae_tpu.models.discriminator import ProjectedDiscriminator
    from vfm_vae_tpu.models.generator import trainable_mask, trainable_path_predicates
    from vfm_vae_tpu.train.loss import TotalLoss, init_loss_state
    from vfm_vae_tpu.train.optim import Adam
    from vfm_vae_tpu.train.train_step import Trainer, TrainState

    if args.geometry == "tiny":
        D = ProjectedDiscriminator(
            c_dim=0, vfm_name="siglip2",
            use_patchgan_discriminator=False,
            dino_kwargs=dict(hidden_size=48, num_layers=2, num_heads=4, mlp_dim=96,
                             patch_size=8, image_size=32, hooks=(0, 1), hook_patch=True),
        )
    else:
        D = ProjectedDiscriminator(c_dim=0, vfm_name=G.vfm_name)

    B = args.batch
    img0 = jnp.zeros((2, res, res, 3))
    gv = jax.jit(lambda r: G.init({"params": r}, img0, train=False))(jax.random.PRNGKey(0))
    dv = jax.jit(lambda r: D.init({"params": r}, img0, train=False))(jax.random.PRNGKey(1))

    loss = TotalLoss(
        G, D, vfm_name=G.vfm_name,
        l1_pixel_loss_weight=1.0, perceptual_loss_weight=0.0,
        vf_loss_weight=5.0, kl_loss_weight=1e-6,
        stylegan_t_discriminator_loss_weight=1.0,
        use_equivariance_regularization=True,
    )
    mask = trainable_mask(gv["params"], trainable_path_predicates("train_all"))
    d_flat = tu.flatten_dict(dv["params"], sep="/")
    import flax.traverse_util as _tu

    d_mask = _tu.unflatten_dict({k: not k.startswith("dino/") for k in d_flat}, sep="/")
    trainer = Trainer(loss, Adam(1e-4, mask=mask), Adam(1e-4, mask=d_mask),
                      g_trainable_mask=mask, batch_size=B)
    state = TrainState(
        g_params=gv["params"], d_params=dv["params"],
        g_bufs=gv.get("buffers", {}), d_bufs=dv.get("buffers", {}),
        ema_params=gv["params"],
        g_opt=trainer.g_tx.init(gv["params"]), d_opt=trainer.d_tx.init(dv["params"]),
        loss_state=init_loss_state(), cur_nimg=jnp.zeros((), jnp.float32),
    )
    real = jnp.asarray(np.random.default_rng(0).random((B, res, res, 3)), jnp.float32)
    rng = jax.random.PRNGKey(0)

    from vfm_vae_tpu.train.train_step import jit_train_step

    step = trainer.fused_step if args.fused else trainer.g_step
    # The loop's production jit (train/loop.py _jit_step without the mesh
    # shardings): rot90 angle traced via lax.switch, prior@1.0 canonicalized
    # — the 20 sampler buckets map onto <=7 compiled programs.
    jfn = jit_train_step(step, donate=False)
    angle = jnp.zeros((), jnp.int32)

    # Unique compiled variants after folding (call-side canonicalization
    # mirrored here: prior@scale 1.0 folds onto the plain bucket).
    variants = []
    for s, r, p in eq_buckets():
        key = (float(s), False) if (p and float(s) == 1.0) else (float(s), bool(p))
        if key not in variants:
            variants.append(key)
    print(f"{len(eq_buckets())} sampler buckets -> {len(variants)} compiled variants")

    total = 0.0
    n_ok = 0
    for scale, prior in variants:
        t0 = time.perf_counter()
        try:
            jfn.jitted.lower(state, real, None, rng, angle, (scale, prior),
                             0.0).compile()
        except Exception as e:
            # Tiny geometries can't take the extreme downscales (z falls
            # below the concat-z unshuffle factor) — flagship can.
            print(f"variant scale={scale:<4} prior={int(prior)}: "
                  f"skipped ({type(e).__name__})", flush=True)
            continue
        dt = time.perf_counter() - t0
        total += dt
        n_ok += 1
        print(f"variant scale={scale:<4} prior={int(prior)}: {dt:7.1f} s",
              flush=True)
    print(f"TOTAL compile for {n_ok} EQ step variants: {total / 60:.1f} min")


if __name__ == "__main__":
    main()
