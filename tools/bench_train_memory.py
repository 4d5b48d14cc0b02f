#!/usr/bin/env python
"""HBM memory-analysis probe for the flagship training step (VERDICT r3
item 9: the B10 OOM oddity).

Compiles the fused D+G train step at each requested per-chip batch WITHOUT
executing it and prints XLA's memory analysis (argument / output / temp /
generated-code bytes). Donation is applied as in the real loop, so the
numbers reflect what the loop would allocate. This separates "the program
needs more HBM than the chip has" (temp+args over budget) from runtime
fragmentation.

  python tools/bench_train_memory.py [--batches 8,10,12,16] [--remat-policy dots]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,10,12,16")
    ap.add_argument("--remat-policy", default="dots",
                    choices=["full", "dots", "names"])
    ap.add_argument("--no-donate", action="store_true")
    args = ap.parse_args()

    import jax

    from bench_train import build_rig

    rows = []
    for b in [int(x) for x in args.batches.split(",")]:
        trainer, state, real, rng = build_rig(b, remat=args.remat_policy)
        donate = () if args.no_donate else ("state",)
        fused = jax.jit(trainer.fused_step,
                        static_argnames=("eq", "blur_sigma"),
                        donate_argnames=donate)
        t0 = time.perf_counter()
        try:
            compiled = fused.lower(state, real, None, rng,
                                   (1.0, 0, False)).compile()
            ma = compiled.memory_analysis()
            gib = 1 << 30
            row = dict(
                batch=b,
                arg_gib=round(ma.argument_size_in_bytes / gib, 3),
                out_gib=round(ma.output_size_in_bytes / gib, 3),
                alias_gib=round(ma.alias_size_in_bytes / gib, 3),
                temp_gib=round(ma.temp_size_in_bytes / gib, 3),
                # live peak = args + temps - donated(aliased) buffers
                peak_gib=round((ma.argument_size_in_bytes
                                + ma.temp_size_in_bytes
                                - ma.alias_size_in_bytes) / gib, 3),
                compile_s=round(time.perf_counter() - t0, 1),
            )
        except Exception as e:  # RESOURCE_EXHAUSTED at compile time etc.
            row = dict(batch=b, error=f"{type(e).__name__}: {str(e)[:200]}")
        rows.append(row)
        print(row, flush=True)
        del trainer, state, real

    print("\nbatch  arg(GiB)  temp(GiB)  donated(GiB)  peak(GiB)  per-img-temp(MiB)")
    for r in rows:
        if "error" in r:
            print(f"{r['batch']:>5}  {r['error']}")
        else:
            print(f"{r['batch']:>5}  {r['arg_gib']:>8}  {r['temp_gib']:>9}  "
                  f"{r['alias_gib']:>12}  {r['peak_gib']:>9}  "
                  f"{r['temp_gib'] * 1024 / r['batch']:>17.1f}")


if __name__ == "__main__":
    main()
