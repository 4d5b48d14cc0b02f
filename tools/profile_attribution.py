#!/usr/bin/env python
"""Device-time attribution for any jitted entry point on the real chip.

Captures a jax.profiler trace (works through remote TPU tunnels) and
aggregates per-fusion device time by module path and source line — the
workflow that drove this framework's optimization passes. Unlike
standalone op microbenchmarks, these numbers reflect in-context layouts
and fusion decisions, which routinely differ by 2-3x.

Reference analog: the upstream repo only has coarse per-phase CUDA-event
timing (training/training_loop.py:630-635); this gives HLO-level
attribution with file:line provenance.

  python tools/profile_attribution.py                 # flagship encode+decode
  python tools/profile_attribution.py --train         # dual-phase train step
  python tools/profile_attribution.py --batch 32 --iters 3
  python tools/profile_attribution.py --keep-trace    # leave the raw trace dir

Counts the device pid's 'XLA Ops' lane only — the 'Steps' lane carries
whole-program spans that double-count every op (caught when the training
trace reported more device time than wall time). Train-step finding (B4,
remat generator): 370.8 ms device vs ~518 ms wall — the gap is remote-
tunnel dispatch (4 × ~35 ms RPC syncs per d+g step), not device work.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def capture(fn_call, trace_dir: str, iters: int) -> None:
    import jax
    import jax.numpy as jnp
    import jax.profiler

    fn_call()  # compile + warm
    jax.profiler.start_trace(trace_dir)
    for _ in range(iters):
        fn_call()
    jax.profiler.stop_trace()


def analyze(trace_dir: str, iters: int, batch: int, top: int = 25):
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as f:
        tr = json.load(f)

    # Device pid discovery (named '/device:TPU:N' in metadata events).
    dev_pids = {
        e["pid"] for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    # Within the device pid, count ONLY the 'XLA Ops' lane: the 'Steps'
    # lane carries whole-program spans (named after the jitted fn, e.g.
    # d_step) that would double-count every op underneath them.
    op_tids = {
        (e["pid"], e["tid"]) for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e.get("pid") in dev_pids
        and "XLA Ops" in str(e.get("args", {}).get("name", ""))
    }
    ev = [e for e in tr["traceEvents"]
          if e.get("ph") == "X" and "dur" in e
          and (e.get("pid"), e.get("tid")) in op_tids
          and not str(e.get("name", "")).startswith("jit_")]
    tot = sum(e["dur"] for e in ev)
    scale = 1e3 * iters  # us -> ms, per call
    print(f"device op time: {tot / scale:.2f} ms/call"
          f"  ({tot / scale / batch * 1e3:.0f} us/img at B{batch})")

    def direction(t: str) -> str:
        """Classify an op path: fwd, bwd (cotangent math), or remat
        (forward recompute re-run inside the backward)."""
        if "rematted_computation" in t or "checkpoint" in t:
            return "remat"
        if "transpose(" in t or t.startswith("transpose"):
            return "bwd"
        return "fwd"

    mod = collections.Counter()
    src = collections.Counter()
    direc = collections.Counter()
    bwd_mod = collections.Counter()
    for e in ev:
        a = e.get("args", {})
        t = a.get("tf_op", "")
        m = re.search(r"jit\(\w+\)/([^/]+/[^/]+)", t)
        if m:
            key = re.sub(r"_\d+", "_N", m.group(1))
        elif t:
            # No jit(...) prefix (e.g. remat/checkpoint scopes): last two
            # path components of the op path beat a bare fusion name.
            key = re.sub(r"_\d+", "_N", "/".join(t.split("/")[-2:]))[:60]
        else:
            key = e["name"][:40]
        mod[key] += e["dur"]
        src[a.get("source", "?")] += e["dur"]
        d = direction(t)
        direc[d] += e["dur"]
        if d != "fwd":
            bwd_mod[f"[{d}] {key}"] += e["dur"]

    print("\n-- by direction (fwd / bwd cotangent / remat recompute) --")
    for k, d in direc.most_common():
        print(f"{d / scale:9.2f} ms/call {100 * d / max(tot, 1):5.1f}%  {k}")
    if direc["bwd"] or direc["remat"]:
        print("\n-- within the backward (bwd + remat), by module --")
        for k, d in bwd_mod.most_common(top):
            print(f"{d / scale:9.2f} ms/call {100 * d / max(tot, 1):5.1f}%  {k}")
    print("\n-- by module (top 2 path levels) --")
    for k, d in mod.most_common(top):
        print(f"{d / scale:9.2f} ms/call {100 * d / max(tot, 1):5.1f}%  {k}")
    print("\n-- by source line --")
    for k, d in src.most_common(top):
        print(f"{d / scale:9.2f} ms/call {100 * d / max(tot, 1):5.1f}%  {k}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--keep-trace", action="store_true")
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--train", action="store_true",
                    help="attribute the dual-phase TRAINING step (bench_train "
                         "rig, remat generator) instead of serving; use "
                         "--batch 4 scale")
    ap.add_argument("--remat-policy", default="full",
                    choices=["full", "dots", "names"],
                    help="decoder checkpoint policy for --train "
                         "(models/synthesis.remat_layer)")
    ap.add_argument("--fused", action="store_true",
                    help="with --train: attribute the fused simultaneous "
                         "D+G step (the sweep configuration) instead of "
                         "sequential d_step+g_step")
    ap.add_argument("--int8-encode", action="store_true",
                    help="attribute the static-scale W8A8 ENCODE path "
                         "(VFM_VAE_INT8_VFM tower) instead of the full "
                         "serving roundtrip")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from vfm_vae_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    if args.train:
        from bench_train import build_rig

        if args.batch > 16:
            args.batch = 4  # serving default doesn't fit the backward
        trainer, state, real, rng = build_rig(args.batch, remat=args.remat_policy)
        if args.fused:
            fused = jax.jit(trainer.fused_step, static_argnames=("eq", "blur_sigma"))

            def call():
                _, _, tl = fused(state, real, None, rng, (1.0, 0, False))
                return float(tl)
        else:
            d_step = jax.jit(trainer.d_step, static_argnames=("eq", "blur_sigma"))
            g_step = jax.jit(trainer.g_step, static_argnames=("eq", "blur_sigma"))

            def call():
                s1, _, dl = d_step(state, real, None, rng, (1.0, 0, False))
                _, _, gl = g_step(s1, real, None, rng, (1.0, 0, False))
                return float(dl) + float(gl)
    elif args.int8_encode:
        os.environ["VFM_VAE_INT8_VFM"] = "1"
        from __graft_entry__ import flagship_generator
        from vfm_vae_tpu.ops.quantized import (
            add_int8_collection,
            calibrate_int8_act_scales,
        )

        G = flagship_generator()
        img = jnp.asarray(
            np.random.default_rng(0).random((args.batch, 256, 256, 3)),
            jnp.float32)
        variables = jax.jit(
            lambda r: G.init({"params": r}, img[:2], train=False)
        )(jax.random.PRNGKey(0))
        v8 = calibrate_int8_act_scales(
            jax.jit(lambda v, x: G.apply(
                v, x, rng=None, method=G.encode, mutable=["act_stats"])),
            add_int8_collection(variables), img[:32])
        jfn = jax.jit(
            lambda v, x: G.apply(v, x, rng=None, method=G.encode))

        def call():
            return float(jnp.sum(jfn(v8, img)))
    else:
        from __graft_entry__ import entry

        fn, (variables, _) = entry()
        jfn = jax.jit(fn)
        img = jnp.asarray(
            np.random.default_rng(0).random((args.batch, 256, 256, 3)), jnp.float32)

        def call():
            return float(jnp.sum(jfn(variables, img)))

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="vfm-vae-trace-")
    try:
        # Force a host read per call: async dispatch through remote tunnels
        # otherwise reports fantasy numbers.
        capture(call, trace_dir, args.iters)
        analyze(trace_dir, args.iters, args.batch, args.top)
        if args.keep_trace:
            print(f"\nraw trace kept at {trace_dir}")
    finally:
        if not args.keep_trace and args.trace_dir is None:
            shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
