"""Full-generator golden test vs the reference torch implementation.

Builds a tiny SigLIP checkpoint on disk (so the reference can
`from_pretrained` it), constructs both generators with matching config,
converts the torch weights, and compares the deterministic paths:
encode -> latent moments, and decode(z) -> image. This exercises the entire
M1 slice (SURVEY.md section 7): preprocessing, ViT, adapter, mapping,
synthesis with concat-z + self-attention + multiscale output.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.oracle import import_reference, to_nhwc, to_nchw_tensor

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

G_KWARGS = dict(
    conditional=False,
    label_type="cls2text",
    label_dim=None,
    scale_factor=1.0,
    patch_from_layers=[0, 1, -1],
    patch_in_dimensions=[64, 64, 64],
    patch_out_dimensions=[16, 16, 16],
    compression_mode="continuous",
    how_to_compress="attnproj",
    how_to_decompress="attnproj",
    decompress_factor=4,
    attnproj_quant_layers=1,
    attnproj_post_quant_layers=1,
    resolution_compression_factor=8,
    z_dimension=8,
    z_pooled_resolution=1,
    z_dim_for_mapping_mlp_output=64,
    use_kl_loss=True,
    use_vf_loss=True,
    use_adaptive_vf_loss=False,
    concat_z_block_indices=[0, 1],
    concat_z_mapped_dims=[32, 16],
    how_to_process_concat_z="unshuffle",
    activation_for_concat_z="lrelu",
    use_multiscale_output=True,
    attn_block_indices=[0],
    attn_depths=[1],
    use_self_attn=True,
    use_cross_attn=False,
    use_convnext=True,
    use_gaussian_blur=True,
    add_additional_convnext=True,
    img_resolution=32,
    img_channels=3,
    num_blocks=4,
    num_fp16_res=0,
    conv_clamp=256,
    legacy=True,
    synthesis_kwargs=dict(channel_base=4096, channel_max=64, num_res_blocks=1, architecture="skip"),
)


@pytest.fixture(scope="module")
def tiny_vfm_dir(tmp_path_factory):
    from transformers import SiglipVisionConfig, SiglipVisionModel

    d = tmp_path_factory.mktemp("vfm") / "siglip2-tiny-patch8-32"
    cfg = SiglipVisionConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=8,
        num_channels=3,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = SiglipVisionModel(cfg)
    model.save_pretrained(d)
    return str(d)


@pytest.fixture(scope="module")
def both_generators(tiny_vfm_dir):
    ref_gen_mod = import_reference("networks.generator")
    torch.manual_seed(123)
    ref = ref_gen_mod.Generator(vfm_name=tiny_vfm_dir, train_mode="train_all", **G_KWARGS).eval()

    from vfm_vae_tpu.models.generator import Generator
    from vfm_vae_tpu.models.convert import convert_generator
    from vfm_vae_tpu.models.synthesis import synthesis_channels

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    block_res = synthesis_channels(32, 4, 4096, 64)[0]
    params, buffers = convert_generator(
        sd,
        how_to_compress="attnproj",
        how_to_decompress="attnproj",
        compression_mode="continuous",
        use_vf_loss=True,
        legacy=True,
        z_resolution=4,
        concat_z_block_indices=[0, 1],
        block_resolutions=block_res,
    )
    ours = Generator(vfm_name=tiny_vfm_dir, **G_KWARGS)
    variables = {"params": params, "buffers": buffers}
    return ref, ours, variables


def test_param_tree_matches_init(both_generators, tiny_vfm_dir):
    """Converted tree must exactly match the shapes the module would init."""
    import flax.traverse_util as tu
    from vfm_vae_tpu.models.generator import Generator

    ref, ours, variables = both_generators
    img = jnp.zeros((1, 32, 32, 3))
    init_vars = ours.init({"params": jax.random.PRNGKey(0)}, img, train=False)
    got = tu.flatten_dict(variables["params"], sep="/")
    want = tu.flatten_dict(init_vars["params"], sep="/")
    missing = sorted(set(want) - set(got))
    unexpected = sorted(set(got) - set(want))
    assert not missing, f"missing converted params: {missing[:10]}"
    assert not unexpected, f"unexpected converted params: {unexpected[:10]}"
    for k in want:
        assert got[k].shape == want[k].shape, (k, got[k].shape, want[k].shape)


def test_encode_moments_match(both_generators):
    ref, ours, variables = both_generators
    img = np.random.default_rng(1).random((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        moments_ref = ref.encode(to_nchw_tensor(img), return_z_before_quantize=True)
    moments = ours.apply(
        variables, jnp.asarray(img), return_z_before_quantize=True, method=ours.encode
    )
    np.testing.assert_allclose(
        np.asarray(moments), to_nhwc(moments_ref), rtol=5e-4, atol=5e-4
    )


def test_decode_matches(both_generators):
    ref, ours, variables = both_generators
    z = np.random.default_rng(2).standard_normal((2, 4, 4, 8)).astype(np.float32)
    with torch.no_grad():
        img_ref = ref.decode(to_nchw_tensor(z), c=None)
    img = ours.apply(variables, jnp.asarray(z), method=ours.decode)
    np.testing.assert_allclose(np.asarray(img), to_nhwc(img_ref), rtol=1e-3, atol=2e-3)


def test_forward_shapes_and_losses(both_generators):
    ref, ours, variables = both_generators
    img = np.random.default_rng(3).random((2, 32, 32, 3)).astype(np.float32)
    out = ours.apply(
        variables,
        jnp.asarray(img),
        rng=jax.random.PRNGKey(0),
        train=False,
    )
    assert out.gen_img.shape == (2, 32, 32, 3)
    assert len(out.gen_multiscale_imgs) == 3
    assert out.gen_multiscale_imgs[0].shape == (2, 16, 16, 3)
    assert np.isfinite(float(out.kl_loss))
    assert np.isfinite(float(out.vf_loss))
