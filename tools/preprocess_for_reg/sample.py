#!/usr/bin/env python
"""REG sampling: SDE sampler with CFG + VAE decode (reference:
tools/preprocess_for_reg/sample.py — SDE with dual cfg scales).

  python tools/preprocess_for_reg/sample.py --config <yaml> \
      --dit-snapshot <dir> --vae-config <yaml> --vae-snapshot <dir> \
      --out samples/ --num 50000 --cfg 4.0
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "preprocess_for_lightningdit"))


def main():
    import sample as ldit_sample

    sys.argv.extend(["--mode", "sde"]) if "--mode" not in sys.argv else None
    ldit_sample.main()


if __name__ == "__main__":
    main()
