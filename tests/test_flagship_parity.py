"""Flagship-geometry parity rehearsal (f16d32 SigLIP2-L @ 256px).

Round-1 parity tests run tiny geometries; this module rehearses the REAL
checkpoint-import path at the published model's geometry (reference
networks/generator.py:915-1206, configs/vfm_vae_f16d32_*.yaml): reference
torch Generator with random weights -> convert_generator (the exact
arguments tools/import_checkpoint.py computes from the stage-0 YAML) ->
our Generator; asserts the converted tree matches init exactly and that
encode()/decode() agree value-level in fp32. Any flagship-only
shape/layout bug in models/convert.py fails here.

Heavy (~0.6B params, jit of ViT-L + the 256px decoder on one CPU core):
gated behind VFM_VAE_FLAGSHIP_PARITY=1; run at least once per round and
record the outcome in PARITY.md.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.oracle import import_reference, to_nhwc, to_nchw_tensor

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.skipif(
    os.environ.get("VFM_VAE_FLAGSHIP_PARITY") != "1",
    reason="flagship rehearsal is heavy; set VFM_VAE_FLAGSHIP_PARITY=1",
)

STAGE0 = os.path.join(
    os.path.dirname(__file__), "..", "configs",
    "vfm_vae_f16d32_siglip2_stage_0_strong_alignment.yaml",
)


@pytest.fixture(scope="module")
def flagship_vfm_dir(tmp_path_factory):
    """SigLIP2-L/16-512 geometry with random weights, saved so both
    frameworks load the same tower."""
    from transformers import SiglipVisionConfig, SiglipVisionModel

    d = tmp_path_factory.mktemp("vfm") / "siglip2-large-patch16-512"
    cfg = SiglipVisionConfig(
        hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
        intermediate_size=4096, image_size=512, patch_size=16, num_channels=3,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    SiglipVisionModel(cfg).save_pretrained(d, safe_serialization=True)
    return str(d)


def _flagship_g_kwargs(vfm_dir):
    from vfm_vae_tpu.core.config import derive_config, load_config

    c = derive_config(load_config(STAGE0))
    gk = {k: v for k, v in c["G_kwargs"].items() if k != "class_name"}
    gk["vfm_name"] = vfm_dir
    # Deterministic compare: no EQ sampling inside forward.
    gk["use_equivariance_regularization"] = False
    return gk


@pytest.fixture(scope="module")
def both_flagships(flagship_vfm_dir):
    gk = _flagship_g_kwargs(flagship_vfm_dir)

    ref_gen_mod = import_reference("networks.generator")
    torch.manual_seed(123)
    gk.setdefault("train_mode", "train_all")
    ref = ref_gen_mod.Generator(**gk).eval()

    from vfm_vae_tpu.models.convert import convert_generator
    from vfm_vae_tpu.models.generator import Generator
    from vfm_vae_tpu.models.synthesis import synthesis_channels

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    sk = gk.get("synthesis_kwargs", {})
    block_res = synthesis_channels(
        gk["img_resolution"], gk["num_blocks"],
        sk.get("channel_base", 32768), sk.get("channel_max", 512),
    )[0]
    params, buffers = convert_generator(
        sd,
        how_to_compress=gk["how_to_compress"],
        how_to_decompress=gk["how_to_decompress"],
        compression_mode=gk["compression_mode"],
        use_vf_loss=bool(gk.get("use_vf_loss", True)),
        legacy=bool(gk.get("legacy", False)),
        z_resolution=gk["img_resolution"] // gk["resolution_compression_factor"],
        concat_z_block_indices=gk.get("concat_z_block_indices", []),
        block_resolutions=block_res,
    )
    ours = Generator(**gk)  # fp32 default compute dtype
    return ref, ours, {"params": params, "buffers": buffers}


def test_flagship_convert_tree_matches_init(both_flagships):
    import flax.traverse_util as tu

    ref, ours, variables = both_flagships
    shapes = jax.eval_shape(
        lambda r: ours.init({"params": r}, jnp.zeros((1, 256, 256, 3)), train=False),
        jax.random.PRNGKey(0),
    )
    got = tu.flatten_dict(variables["params"], sep="/")
    want = tu.flatten_dict(shapes["params"], sep="/")
    missing = sorted(set(want) - set(got))
    unexpected = sorted(set(got) - set(want))
    assert not missing, f"missing converted params: {missing[:10]}"
    assert not unexpected, f"unexpected converted params: {unexpected[:10]}"
    for k in want:
        assert tuple(got[k].shape) == tuple(want[k].shape), (
            k, got[k].shape, want[k].shape
        )


def test_flagship_encode_moments_match(both_flagships):
    ref, ours, variables = both_flagships
    img = np.random.default_rng(1).random((1, 256, 256, 3)).astype(np.float32)
    with torch.no_grad():
        m_ref = ref.encode(to_nchw_tensor(img), return_z_before_quantize=True)
    m = ours.apply(
        variables, jnp.asarray(img), return_z_before_quantize=True, method=ours.encode
    )
    assert np.asarray(m).shape == to_nhwc(m_ref).shape == (1, 16, 16, 64)
    np.testing.assert_allclose(np.asarray(m), to_nhwc(m_ref), rtol=2e-3, atol=2e-3)


def test_flagship_decode_matches(both_flagships):
    ref, ours, variables = both_flagships
    z = np.random.default_rng(2).standard_normal((1, 16, 16, 32)).astype(np.float32)
    with torch.no_grad():
        img_ref = ref.decode(to_nchw_tensor(z), c=None)
    img = ours.apply(variables, jnp.asarray(z), method=ours.decode)
    assert np.asarray(img).shape == to_nhwc(img_ref).shape == (1, 256, 256, 3)
    np.testing.assert_allclose(np.asarray(img), to_nhwc(img_ref), rtol=5e-3, atol=5e-3)
