"""Op-level parity tests against the PyTorch reference (impl='ref' paths) and
plain torch functional ops — the dual-implementation oracle pattern the
reference itself relies on (SURVEY.md section 4.1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vfm_vae_tpu import ops
from tests.oracle import import_reference, to_nhwc, to_nchw_tensor

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(0)


def rand_nhwc(b, h, w, c):
    return RNG.standard_normal((b, h, w, c)).astype(np.float32)


# ---------------------------------------------------------------- upfirdn2d


@pytest.mark.parametrize(
    "up,down,padding",
    [
        (1, 1, 0),
        (1, 1, 2),
        (2, 1, (2, 1, 2, 1)),
        (1, 2, 1),
        (2, 2, (1, 2, 0, 3)),
        (1, 1, (-1, -1, -1, -1)),
        (4, 1, 3),
    ],
)
@pytest.mark.parametrize("taps", [[1, 3, 3, 1], [1, 2, 1], None])
def test_upfirdn2d_matches_reference(up, down, padding, taps):
    ref = import_reference("torch_utils.ops.upfirdn2d")
    x = rand_nhwc(2, 12, 10, 3)
    f_ref = ref.setup_filter(taps) if taps is not None else None
    f_ours = ops.setup_filter(taps) if taps is not None else None

    with torch.no_grad():
        y_ref = ref.upfirdn2d(
            to_nchw_tensor(x), f_ref, up=up, down=down, padding=padding, impl="ref"
        )
    y = ops.upfirdn2d(jnp.asarray(x), f_ours, up=up, down=down, padding=padding)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("fn", ["filter2d", "upsample2d", "downsample2d"])
def test_upfirdn_wrappers_match_reference(fn):
    ref = import_reference("torch_utils.ops.upfirdn2d")
    x = rand_nhwc(2, 16, 16, 4)
    f_ref = ref.setup_filter([1, 3, 3, 1])
    f_ours = ops.setup_filter([1, 3, 3, 1])
    with torch.no_grad():
        y_ref = getattr(ref, fn)(to_nchw_tensor(x), f_ref, impl="ref")
    y = getattr(ops, fn)(jnp.asarray(x), f_ours)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), rtol=1e-5, atol=1e-5)


def test_separable_filter_matches_2d():
    x = rand_nhwc(1, 9, 9, 2)
    taps = np.array([1, 4, 6, 4, 1, 4, 6, 4, 1], dtype=np.float32)
    f_sep = ops.setup_filter(taps, separable=True)
    f_2d = ops.setup_filter(taps, separable=False)
    y_sep = ops.upfirdn2d(jnp.asarray(x), f_sep, up=2, padding=2)
    y_2d = ops.upfirdn2d(jnp.asarray(x), f_2d, up=2, padding=2)
    np.testing.assert_allclose(np.asarray(y_sep), np.asarray(y_2d), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- bias_act


@pytest.mark.parametrize("act", ["linear", "relu", "lrelu", "tanh", "sigmoid", "swish"])
@pytest.mark.parametrize("gain,clamp", [(None, None), (2.0, 0.5), (None, 256.0)])
def test_bias_act_matches_reference(act, gain, clamp):
    ref = import_reference("torch_utils.ops.bias_act")
    x = rand_nhwc(2, 4, 4, 8)
    b = RNG.standard_normal(8).astype(np.float32)
    with torch.no_grad():
        y_ref = ref.bias_act(
            to_nchw_tensor(x), torch.from_numpy(b), act=act, gain=gain, clamp=clamp, impl="ref"
        )
    y = ops.bias_act(jnp.asarray(x), jnp.asarray(b), act=act, gain=gain, clamp=clamp)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- resize


@pytest.mark.parametrize("out", [7, 16, 33, 128])
@pytest.mark.parametrize("antialias", [False, True])
def test_resize_bilinear_matches_torch(out, antialias):
    import torch.nn.functional as F

    x = rand_nhwc(2, 32, 32, 3)
    with torch.no_grad():
        y_ref = F.interpolate(
            to_nchw_tensor(x), size=(out, out), mode="bilinear",
            align_corners=False, antialias=antialias,
        )
    y = ops.resize_bilinear(jnp.asarray(x), size=(out, out), antialias=antialias)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("out", [9, 24, 64])
@pytest.mark.parametrize("antialias", [False, True])
def test_resize_bicubic_matches_torch(out, antialias):
    import torch.nn.functional as F

    x = rand_nhwc(2, 32, 32, 3)
    with torch.no_grad():
        y_ref = F.interpolate(
            to_nchw_tensor(x), size=(out, out), mode="bicubic",
            align_corners=False, antialias=antialias,
        )
    y = ops.resize_bicubic(jnp.asarray(x), size=(out, out), antialias=antialias)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("scale", [0.25, 0.5, 0.75, 2.0])
def test_resize_scale_factor_matches_torch(scale):
    import torch.nn.functional as F

    x = rand_nhwc(1, 16, 16, 32)
    with torch.no_grad():
        y_ref = F.interpolate(
            to_nchw_tensor(x), scale_factor=scale, mode="bilinear", align_corners=False
        )
    y = ops.resize_bilinear(jnp.asarray(x), scale_factor=scale)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("out", [(1, 1), (4, 4), (3, 5)])
def test_adaptive_avg_pool_matches_torch(out):
    import torch.nn.functional as F

    x = rand_nhwc(2, 16, 20, 6)
    with torch.no_grad():
        y_ref = F.adaptive_avg_pool2d(to_nchw_tensor(x), out)
    y = ops.adaptive_avg_pool2d(jnp.asarray(x), out)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- shuffle


@pytest.mark.parametrize("r", [2, 4])
def test_pixel_unshuffle_matches_torch(r):
    x = rand_nhwc(2, 8, 8, 3)
    with torch.no_grad():
        y_ref = torch.nn.functional.pixel_unshuffle(to_nchw_tensor(x), r)
    y = ops.pixel_unshuffle(jnp.asarray(x), r)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), rtol=0, atol=0)


@pytest.mark.parametrize("r", [2, 4])
def test_pixel_shuffle_matches_torch(r):
    x = rand_nhwc(2, 4, 4, 3 * 16)
    with torch.no_grad():
        y_ref = torch.nn.functional.pixel_shuffle(to_nchw_tensor(x), r)
    y = ops.pixel_shuffle(jnp.asarray(x), r)
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), rtol=0, atol=0)


def test_pixel_shuffle_roundtrip():
    x = jnp.asarray(rand_nhwc(1, 8, 8, 4))
    y = ops.pixel_shuffle(ops.pixel_unshuffle(x, 2), 2)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


# ---------------------------------------------------------------- norms


def test_group_norm_matches_torch():
    import torch.nn.functional as F

    x = rand_nhwc(2, 6, 6, 32)
    w = RNG.standard_normal(32).astype(np.float32)
    b = RNG.standard_normal(32).astype(np.float32)
    with torch.no_grad():
        y_ref = F.group_norm(
            to_nchw_tensor(x), 8, torch.from_numpy(w), torch.from_numpy(b)
        )
    y = ops.group_norm(jnp.asarray(x), 8, jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_torch():
    from vfm_vae_tpu.ops.groupnorm import layer_norm

    x = RNG.standard_normal((2, 7, 16)).astype(np.float32)
    w = RNG.standard_normal(16).astype(np.float32)
    b = RNG.standard_normal(16).astype(np.float32)
    with torch.no_grad():
        y_ref = torch.nn.functional.layer_norm(
            torch.from_numpy(x), (16,), torch.from_numpy(w), torch.from_numpy(b), eps=1e-6
        )
    y = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-6)
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- attention


def test_sdpa_matches_torch():
    import torch.nn.functional as F

    q = RNG.standard_normal((2, 5, 4, 16)).astype(np.float32)  # B T N H
    k = RNG.standard_normal((2, 7, 4, 16)).astype(np.float32)
    v = RNG.standard_normal((2, 7, 4, 16)).astype(np.float32)
    with torch.no_grad():
        y_ref = F.scaled_dot_product_attention(
            torch.from_numpy(q).permute(0, 2, 1, 3),
            torch.from_numpy(k).permute(0, 2, 1, 3),
            torch.from_numpy(v).permute(0, 2, 1, 3),
        ).permute(0, 2, 1, 3)
    y = ops.dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- filtered_lrelu


@pytest.mark.parametrize("up,down,padding", [(1, 1, 0), (2, 1, 1), (2, 2, (1, 1, 2, 2))])
def test_filtered_lrelu_matches_reference(up, down, padding):
    ref = import_reference("torch_utils.ops.filtered_lrelu")
    ref_up = import_reference("torch_utils.ops.upfirdn2d")
    from vfm_vae_tpu.ops.filtered_lrelu import filtered_lrelu

    x = rand_nhwc(2, 10, 10, 4)
    b = RNG.standard_normal(4).astype(np.float32)
    fu = ref_up.setup_filter([1, 3, 3, 1])
    fd = ref_up.setup_filter([1, 2, 1])
    with torch.no_grad():
        y_ref = ref.filtered_lrelu(
            to_nchw_tensor(x), fu=fu, fd=fd, b=torch.from_numpy(b),
            up=up, down=down, padding=padding, clamp=2.0, impl="ref",
        )
    from vfm_vae_tpu.ops.upfirdn import setup_filter

    y = filtered_lrelu(
        jnp.asarray(x), fu=setup_filter([1, 3, 3, 1]), fd=setup_filter([1, 2, 1]),
        b=jnp.asarray(b), up=up, down=down, padding=padding, clamp=2.0,
    )
    np.testing.assert_allclose(np.asarray(y), to_nhwc(y_ref), rtol=1e-4, atol=1e-4)


def test_fma():
    from vfm_vae_tpu.ops.fma import fma

    a, b, c = (jnp.asarray(rand_nhwc(1, 2, 2, 3)) for _ in range(3))
    np.testing.assert_allclose(np.asarray(fma(a, b, c)), np.asarray(a * b + c))


def test_pallas_dwconv_interpret_matches_lax():
    """Pallas depthwise kernel numerics (interpret mode; TPU perf opt-in)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from vfm_vae_tpu.ops.pallas.dwconv import depthwise_conv2d_same

    x = jnp.asarray(rand_nhwc(2, 16, 16, 128))
    w = jnp.asarray(RNG.standard_normal((5, 5, 1, 128)).astype(np.float32))
    b = jnp.asarray(RNG.standard_normal(128).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=128,
    ) + b
    with pltpu.force_tpu_interpret_mode():
        y = depthwise_conv2d_same(x, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_pallas_dwconv_stats_interpret_matches_chain():
    """dwconv+noise+GN-stats kernel numerics, incl. a ragged row tile
    (interpret mode; the kernel itself is a documented negative result,
    kept opt-in — ops/pallas/dwconv_stats.py)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from vfm_vae_tpu.ops.pallas.dwconv_stats import _forward_jnp, _fused

    for (H, W, k) in ((17, 16, 7), (8, 8, 5)):
        x = jnp.asarray(rand_nhwc(2, H, W, 128))
        w = jnp.asarray(0.05 * RNG.standard_normal((k, k, 128)).astype(np.float32))
        b = jnp.asarray(RNG.standard_normal(128).astype(np.float32))
        nz = jnp.asarray(0.05 * RNG.standard_normal((1, H, W)).astype(np.float32))
        rt, r1, r2 = _forward_jnp(x, w, b, nz, k, True)
        with pltpu.force_tpu_interpret_mode():
            gt, g1, g2 = _fused(x, w, b, nz, k, True)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(rt), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(r1), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(r2), rtol=1e-4, atol=1e-3)


def test_pallas_int8_matmul_interpret_matches_reference():
    """Fused quantize+int8 matmul kernel == the plain-XLA W8A8 reference
    (ops/quantized.int8_linear_prequant's in-graph form), including the
    scratch-persistence pattern (grid 2x2 re-uses the quantized m-tile)."""
    from jax.experimental.pallas import tpu as pltpu

    from vfm_vae_tpu.ops.pallas.int8_matmul import _int8_matmul_2d
    from vfm_vae_tpu.ops.quantized import int8_linear_prequant

    rng = np.random.default_rng(0)
    M, K, N = 256, 256, 256
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    wq = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))
    ws = jnp.asarray(np.abs(rng.standard_normal(N)).astype(np.float32) * 0.01 + 1e-4)
    b = jnp.asarray(rng.standard_normal(N).astype(np.float32))

    want = int8_linear_prequant(x, wq, ws, b)  # CPU -> jnp path
    with pltpu.force_tpu_interpret_mode():
        got = _int8_matmul_2d(x, wq, ws.reshape(1, N), b.reshape(1, N), 128, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_int8_static_scale_calibration_roundtrip():
    """Static-activation-scale W8A8: calibrate_int8_act_scales records each
    int8 Linear's input absmax through flax's act_stats collection, and the
    static path using that scale agrees with the dynamic per-row path
    whenever every row's absmax equals the tensor absmax (constructed
    here), since both then quantize with the identical scale."""
    import flax.linen as nn

    from vfm_vae_tpu.models.layers import Linear, int8_linear_scope
    from vfm_vae_tpu.ops.quantized import (
        add_int8_collection,
        calibrate_int8_act_scales,
        int8_linear_prequant,
        int8_linear_prequant_static,
    )

    class Tower(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = Linear(16, 32, name="fc1")(x)
            return Linear(32, 16, name="fc2")(x)

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Tower(name="vfm_encoder")(x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    m = Wrap()
    variables = m.init(jax.random.PRNGKey(0), x)
    v8 = add_int8_collection(variables)
    assert "int8" in v8

    def apply_mut(v, xin):
        with int8_linear_scope(True):
            return m.apply(v, xin, mutable=["act_stats"])

    v8s = calibrate_int8_act_scales(apply_mut, v8, x)
    i8 = v8s["int8"]["vfm_encoder"]
    assert set(i8["fc1"]) == {"wq", "ws", "as"}
    # fc1's scale is the calibration input's absmax / 127.
    np.testing.assert_allclose(
        float(i8["fc1"]["as"]), float(jnp.max(jnp.abs(x))) / 127.0, rtol=1e-6
    )

    # Formula agreement: rows scaled to share one absmax.
    xr = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    xr = xr / jnp.max(jnp.abs(xr), axis=-1, keepdims=True)  # every row absmax 1
    wq = i8["fc1"]["wq"]
    ws = i8["fc1"]["ws"]
    b = variables["params"]["vfm_encoder"]["fc1"]["bias"]
    dyn = int8_linear_prequant(xr, wq, ws, b)
    stat = int8_linear_prequant_static(
        xr, wq, ws, jnp.float32(1.0 / 127.0), b
    )
    np.testing.assert_allclose(np.asarray(dyn), np.asarray(stat), rtol=1e-5, atol=1e-6)

    # End-to-end static serving forward runs and stays near the fp32 path.
    with int8_linear_scope(True):
        y8 = m.apply(v8s, x)
    y = m.apply(variables, x)
    rel = float(jnp.mean(jnp.abs(y - y8)) / (jnp.mean(jnp.abs(y)) + 1e-12))
    assert rel < 0.05, rel


def test_int8_matmul_eligibility_gates():
    from vfm_vae_tpu.ops.pallas.int8_matmul import int8_matmul_eligible

    wq = jnp.zeros((256, 256), jnp.int8)
    # CPU backend -> never eligible (kernel is a TPU serving path).
    assert not int8_matmul_eligible(jnp.zeros((4, 256, 256)), wq)


def test_fused_upsample_bf16_grad_compiles():
    """Regression: the vertical-blur leg must keep conv operands same-dtype
    — an fp32-accumulating conv there breaks jax's transpose rule under
    bf16 training (mixed f32-cotangent/bf16-kernel), which only the bf16
    flagship compile caught."""
    import jax

    from vfm_vae_tpu.ops.pallas.fused_upsample import fused_upsample_blur

    B, H, W, Ci, Co = 2, 4, 4, 8, 4
    rng = np.random.default_rng(0)
    arr = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    x, a, c = arr(B, H, W, Ci), arr(B, Ci), arr(B, Ci)
    dw, pw = arr(3, 3, Ci), arr(Ci, 4 * Co)

    def loss(x, pw):
        y = fused_upsample_blur(x, a, c, dw, pw, [0.25, 0.5, 0.25], interpret=True)
        return jnp.sum(y.astype(jnp.float32))

    gx, gpw = jax.grad(loss, argnums=(0, 1))(x, pw)
    assert gx.dtype == jnp.bfloat16 and np.isfinite(np.asarray(gx, np.float32)).all()
    assert np.isfinite(np.asarray(gpw, np.float32)).all()


# ------------------------------------------------------------ fused convnext mlp


class TestFusedConvNeXtMLP:
    def _args(self, key, B=2, H=4, W=4, C=8, dtype=jnp.float32):
        ks = jax.random.split(jax.random.PRNGKey(key), 9)
        Hd = 4 * C
        x = jax.random.normal(ks[0], (B, H, W, C), dtype)
        xi = jax.random.normal(ks[1], (B, H, W, C), dtype)
        s = 1.0 + 0.1 * jax.random.normal(ks[2], (B, C))
        w1 = 0.1 * jax.random.normal(ks[3], (C, Hd))
        b1 = 0.1 * jax.random.normal(ks[4], (Hd,))
        w2 = 0.1 * jax.random.normal(ks[5], (Hd, C))
        b2 = 0.1 * jax.random.normal(ks[6], (C,))
        g = 0.5 + 0.1 * jax.random.normal(ks[7], (C,))
        from vfm_vae_tpu.models.modulated import demod_coefs

        d = demod_coefs(w1[None, None], s)
        return x, xi, s, d, w1, b1, w2, b2, g

    @staticmethod
    def _unfused(x, xi, s, d, w1, b1, w2, b2, g):
        """The module chain the kernel replaces (modulated pw -> exact gelu
        -> pw contract -> layer scale -> residual)."""
        from vfm_vae_tpu.models.modulated import modulated_pointwise_conv2d

        B = x.shape[0]
        h = modulated_pointwise_conv2d(x, w1, s, b1, demodulate=True)
        h = jax.nn.gelu(h, approximate=False)
        y = jnp.einsum("bhwi,io->bhwo", h, w2.astype(h.dtype)) + b2.astype(h.dtype)
        return y * g.astype(y.dtype) + xi

    def test_pipelined_forward_parity(self, monkeypatch):
        """Software-pipelined form == per-tile form (same math, the hidden
        just crosses a grid step in scratch). Tiny tile budget forces
        several row tiles per image so the one-step output lag, the batch
        crossing, and the dead fill/drain steps are all exercised."""
        from vfm_vae_tpu.ops.pallas.fused_mlp import _forward_jnp, _fused_pipelined

        monkeypatch.setenv("VFM_VAE_MLP_TILE_KB", "1")
        x, xi, s, d, w1, b1, w2, b2, g = self._args(3, B=3, H=4, W=4, C=8)
        b1b = jnp.broadcast_to(b1[None, :], (x.shape[0], b1.shape[0]))
        got = _fused_pipelined(x, xi, s, d, w1, b1b, w2, b2, g, interpret=True)
        B, H, W, C = x.shape
        want = _forward_jnp(
            x.reshape(B, H * W, C), xi.reshape(B, H * W, C),
            s, d, w1, b1b, w2, b2, g, x.dtype,
        ).reshape(x.shape)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
        )

    def test_forward_parity(self):
        from vfm_vae_tpu.ops.pallas.fused_mlp import fused_convnext_mlp

        x, xi, s, d, w1, b1, w2, b2, g = self._args(0)
        got = fused_convnext_mlp(x, xi, s, d, w1, b1, w2, b2, g, interpret=True)
        want = self._unfused(x, xi, s, d, w1, b1, w2, b2, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)

    def test_gradient_parity(self):
        """The hand-written custom_vjp backward must match autodiff of the
        unfused chain for every differentiable input."""
        from vfm_vae_tpu.ops.pallas.fused_mlp import fused_convnext_mlp

        x, xi, s, d, w1, b1, w2, b2, g = self._args(1)
        probe = jax.random.normal(jax.random.PRNGKey(42), x.shape)

        def loss_fused(args):
            x, xi, s, w1, b1, w2, b2, g = args
            from vfm_vae_tpu.models.modulated import demod_coefs

            d = demod_coefs(w1[None, None], s)
            out = fused_convnext_mlp(x, xi, s, d, w1, b1, w2, b2, g, interpret=True)
            return jnp.sum(out * probe)

        def loss_unfused(args):
            x, xi, s, w1, b1, w2, b2, g = args
            out = self._unfused(x, xi, s, None, w1, b1, w2, b2, g)
            return jnp.sum(out * probe)

        args = (x, xi, s, w1, b1, w2, b2, g)
        gf = jax.grad(loss_fused)(args)
        gu = jax.grad(loss_unfused)(args)
        for a, b, name in zip(gf, gu, "x xi s w1 b1 w2 b2 g".split()):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
                err_msg=f"grad mismatch for {name}",
            )

    def test_convnext_layer_param_escape(self):
        """return_params gives the same tree and values as the compute path."""
        from vfm_vae_tpu.models.convnext import ConvNeXtSynthesisLayer

        layer = ConvNeXtSynthesisLayer(channels=8, w_dim=16, kernel_size=5)
        x = jnp.ones((2, 4, 4, 8))
        w = jnp.ones((2, 16))
        v = layer.init(jax.random.PRNGKey(0), x, w)
        out = layer.apply(v, x, w)
        assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_group_stats_matches_group_norm():
    """stats_only escape must reproduce the module's own normalization:
    (x - mean) * rstd * w + b == GroupNorm32(x) (bf16 one-pass path)."""
    from vfm_vae_tpu.models.layers import GroupNorm32

    gn = GroupNorm32(4, 16)
    x32 = jnp.asarray(RNG.standard_normal((2, 6, 6, 16)), jnp.float32)
    x = (x32 * 3 + 0.7).astype(jnp.bfloat16)
    v = gn.init(jax.random.PRNGKey(0), x)
    want = gn.apply(v, x)
    mean, rstd, w, b = gn.apply(v, x, stats_only=True)
    reps = 16 // mean.shape[1]
    mc = np.repeat(np.asarray(mean), reps, axis=1)[:, None, None, :]
    rc = np.repeat(np.asarray(rstd), reps, axis=1)[:, None, None, :]
    got = (np.asarray(x, np.float32) - mc) * rc * np.asarray(w) + np.asarray(b)
    np.testing.assert_allclose(got, np.asarray(want, np.float32), atol=0.03, rtol=0.03)


def test_pallas_channel_moments_interpret():
    """Row-tiled pallas moment accumulation == plain-XLA reference (the
    GroupNorm stats feed: sum and sum-of-squares per (sample, channel))."""
    from vfm_vae_tpu.ops.pallas.group_stats import (
        channel_moments_interpret,
        channel_moments_reference,
    )

    x = (jnp.asarray(RNG.standard_normal((2, 12, 8, 128)), jnp.float32) * 2
         + 0.3).astype(jnp.bfloat16)
    s1, s2 = channel_moments_interpret(x)
    r1, r2 = channel_moments_reference(x)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(r1), atol=2e-3, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(r2), atol=4e-3, rtol=2e-5)


def test_pallas_channel_moments_grad():
    """custom_vjp backward (ds1 = 1, ds2 = 2x) matches autodiff of the
    reference reduction."""
    from vfm_vae_tpu.ops.pallas import group_stats as gs

    x = jnp.asarray(RNG.standard_normal((2, 6, 4, 8)), jnp.float32)
    g1 = jnp.asarray(RNG.standard_normal((2, 8)), jnp.float32)
    g2 = jnp.asarray(RNG.standard_normal((2, 8)), jnp.float32)

    def loss_ref(xx):
        s1, s2 = gs.channel_moments_reference(xx)
        return jnp.sum(s1 * g1) + jnp.sum(s2 * g2)

    (dx,) = gs._bwd(x, (g1, g2))
    dref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dref), atol=1e-5, rtol=1e-5)
