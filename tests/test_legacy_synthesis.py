"""Legacy StyleGAN-T synthesis path parity (use_convnext=False:
SynthesisLayer with up=2 + resample filter, ToRGBLayer, skip-architecture
image accumulation with upfirdn upsample2d, SynthesisInput Fourier grid)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.oracle import import_reference, to_nhwc, to_nchw_tensor

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(21)


def rand(*s):
    return RNG.standard_normal(s).astype(np.float32)


def state_dict_np(mod):
    return {k: np.array(v.detach().numpy(), copy=True) for k, v in mod.state_dict().items()}


def convert_synthesis_layer(sd, prefix, use_noise=True, residual=False):
    from vfm_vae_tpu.models.convert import convert_groupnorm, convert_style_split, _conv, _arr

    p = {
        "affine": convert_style_split(sd, prefix + "affine."),
        "weight": _conv(sd[prefix + "weight"]),
        "bias": _arr(sd[prefix + "bias"]),
    }
    b = {}
    if use_noise:
        p["noise_strength"] = _arr(sd[prefix + "noise_strength"])
        b["noise_const"] = _arr(sd[prefix + "noise_const"])
    if residual:
        p["norm"] = convert_groupnorm(sd, prefix + "norm.")
        p["gamma"] = np.asarray(sd[prefix + "gamma"]).reshape(-1)
    return p, b


@pytest.mark.parametrize("up,residual", [(1, False), (2, False), (1, True)])
def test_synthesis_layer_matches_reference(up, residual):
    gen = import_reference("networks.generator")
    from vfm_vae_tpu.models.synthesis import SynthesisLayer

    torch.manual_seed(31)
    C, w_dim, res = 16, 24, 16
    ref = gen.SynthesisLayer(
        C, C, w_dim=w_dim, resolution=res, up=up, residual=residual, gn_groups=4,
        conv_clamp=256,
    ).eval()
    sd = state_dict_np(ref)
    params, buffers = convert_synthesis_layer(sd, "", residual=residual)

    x = rand(2, res // up, res // up, C)
    w = rand(2, w_dim)
    with torch.no_grad():
        y_ref = ref(to_nchw_tensor(x), torch.from_numpy(w), noise_mode="const")
    ours = SynthesisLayer(
        C, C, w_dim, res, up=up, residual=residual, gn_groups=4, conv_clamp=256
    )
    y = ours.apply(
        {"params": params, "buffers": buffers}, jnp.asarray(x), jnp.asarray(w)
    )
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), rtol=1e-3, atol=1e-3)


def test_torgb_layer_matches_reference():
    gen = import_reference("networks.generator")
    from vfm_vae_tpu.models.synthesis import ToRGBLayer
    from vfm_vae_tpu.models.convert import convert_style_split, _conv, _arr

    torch.manual_seed(32)
    ref = gen.ToRGBLayer(16, 3, w_dim=24, conv_clamp=256).eval()
    sd = state_dict_np(ref)
    params = {
        "affine": convert_style_split(sd, "affine."),
        "weight": _conv(sd["weight"]),
        "bias": _arr(sd["bias"]),
    }
    x = rand(2, 8, 8, 16)
    w = rand(2, 24)
    with torch.no_grad():
        y_ref = ref(to_nchw_tensor(x), torch.from_numpy(w))
    y = ToRGBLayer(16, 3, 24, conv_clamp=256).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(w)
    )
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), rtol=1e-4, atol=1e-4)


def test_synthesis_input_runs():
    """No oracle possible: the reference's own SynthesisInput is dead code
    AND broken upstream — its FullyConnectedLayer crashes on the list
    bias_init=[1,0,0,0] it passes (shared.py:67 torch.full with a list;
    only reachable when in_channels==0, which no stock config uses). We
    implement the documented Fourier-feature behavior and smoke-test it."""
    from vfm_vae_tpu.models.synthesis import SynthesisInput

    m = SynthesisInput(24, 16, 8, 8, 2)
    w = jnp.asarray(rand(2, 24))
    variables = m.init({"params": jax.random.PRNGKey(0)}, w)
    y = m.apply(variables, w)
    assert y.shape == (2, 8, 8, 16)
    assert np.isfinite(np.asarray(y)).all()
    assert float(jnp.std(y)) > 0
