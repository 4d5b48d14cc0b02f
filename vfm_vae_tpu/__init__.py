"""VFM-VAE-TPU: a TPU-native (JAX/Flax/Pallas/pjit) visual-tokenizer framework.

Re-implements the full capability surface of the VFM-VAE reference
(vision-foundation-model tokenizer for latent diffusion: frozen ViT encoder ->
LDM adapter -> style-modulated ConvNeXt decoder, GAN+reconstruction training)
as an idiomatic TPU framework:

  * NHWC tensor layout, bf16 compute with fp32 normalization islands
  * functional jitted train steps over a ``jax.sharding.Mesh`` (data x model)
  * modulated convolutions expressed as scale -> shared conv -> demod-scale
    (MXU-friendly; no per-sample grouped weights)
  * Pallas kernels for the hot ops (flash attention, fused upfirdn)

Package map (cf. reference layer map, SURVEY.md section 1):
  core/      config + registry + stats + logging       (dnnlib/, torch_utils/)
  ops/       numerical ops + Pallas kernels            (torch_utils/ops/)
  models/    encoder / adapter / decoder / critic      (networks/)
  parallel/  mesh + sharding + collectives             (torch_utils/distributed.py)
  train/     losses, EMA, train loop, checkpointing    (training/)
  data/      shard streaming + augmentation            (training/data_wds.py)
  metrics/   FID / PR / reconstruction metrics         (metrics/)
  tools/     reconstruct / decode / prefetch CLIs      (tools/)
"""

__version__ = "0.1.0"

# The hosting environment may pin JAX to a TPU PJRT plugin via sitecustomize,
# in which case JAX_PLATFORMS alone cannot redirect a subprocess. Honor an
# explicit override here, before any backend client exists, so tool CLIs can
# be forced onto a specific backend (tests use VFM_VAE_PLATFORM=cpu).
import os as _os

_platform = _os.environ.get("VFM_VAE_PLATFORM")
if _platform:
    import jax as _jax

    _jax.config.update("jax_platforms", _platform)
del _os, _platform
