#!/usr/bin/env python
"""Byte-level HBM-traffic attribution for the training step (companion to
tools/profile_attribution.py's device-TIME attribution).

AOT-compiles the fused dual-phase train step (bench_train rig — the
stage-0 recipe the reference's training_loop.py:690-732 hot loop runs) and
parses the optimized HLO into per-buffer traffic: which tensors (saved
activations, optimizer/EMA state, D-branch features, gradients) carry the
bytes behind the "~450 GB accessed per B8 step" roofline figure. Never
executes — safe to run while nothing else holds the chip, and the single
executable fits where a run+probe pair would OOM.

  python tools/profile_traffic.py --batch 8 --remat-policy dots
  python tools/profile_traffic.py --batch 8 --remat-policy dots --json out.json
  python tools/profile_traffic.py --serve            # serving fwd instead
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--remat-policy", default="dots",
                    choices=["none", "full", "dots", "names"])
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--wall-ms", type=float, default=None,
                    help="measured step wall time, for the roofline line")
    ap.add_argument("--json", default=None, help="also dump the report dict")
    ap.add_argument("--serve", action="store_true",
                    help="attribute the serving forward instead")
    ap.add_argument("--dump-hlo", default=None,
                    help="also write the optimized HLO text here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vfm_vae_tpu.core.compile_cache import enable_persistent_cache
    from vfm_vae_tpu.core.hlo_traffic import format_report, traffic_report

    enable_persistent_cache()

    if args.serve:
        from __graft_entry__ import entry
        import numpy as np

        fn, (variables, _) = entry()
        img = jnp.asarray(
            np.random.default_rng(0).random((args.batch, 256, 256, 3)),
            jnp.float32)
        compiled = jax.jit(fn).lower(variables, img).compile()
    else:
        from bench_train import build_rig

        remat = False if args.remat_policy == "none" else args.remat_policy
        trainer, state, real, rng = build_rig(args.batch, remat=remat)
        fused = jax.jit(trainer.fused_step, static_argnames=("eq", "blur_sigma"))
        compiled = fused.lower(state, real, None, rng,
                               (1.0, 0, False)).compile()

    hlo = compiled._executable.xla_executable.hlo_modules()[0].to_string()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)
    rep = traffic_report(hlo, top=args.top)
    ca = compiled.cost_analysis() or {}
    rep["cost_analysis_bytes_gb"] = round(
        float(ca.get("bytes accessed", 0.0)) / 1e9, 1)
    rep["flops_g"] = round(float(ca.get("flops", 0.0)) / 1e9, 1)
    print(f"batch {args.batch}  remat {args.remat_policy}  "
          f"(XLA cost_analysis: {rep['cost_analysis_bytes_gb']} GB accessed, "
          f"{rep['flops_g']} GFLOP)")
    print(format_report(rep, wall_ms=args.wall_ms))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rep, f, indent=1)
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
