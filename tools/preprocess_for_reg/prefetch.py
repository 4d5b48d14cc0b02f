#!/usr/bin/env python
"""Latent-moment prefetch for REG training (reference:
tools/preprocess_for_reg/prefetch.py): stores (mean || std) moments via
encode(return_z_before_quantize=True) -> mean_logvar_to_mean_std
(prefetch.py:40-44,257) so the diffusion trainer can sample the posterior.

Same CLI as the LightningDiT variant; shares its implementation with
return_moments=True.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "preprocess_for_lightningdit"))
    from prefetch import main

    main(return_moments=True)
