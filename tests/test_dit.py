"""DiT backbone + flow-matching transport tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_dit():
    from vfm_vae_tpu.models.dit import LightningDiT

    model = LightningDiT(
        input_size=8, patch_size=1, in_channels=4, hidden_size=64,
        depth=2, num_heads=4, num_classes=10,
    )
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,))
    y = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, y)["params"]
    return model, params


def test_dit_forward_shape(tiny_dit):
    model, params = tiny_dit
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 4)), jnp.float32)
    out = model.apply({"params": params}, x, jnp.asarray([0.1, 0.9]), jnp.asarray([1, 2]))
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_dit_zero_init_output_is_zero(tiny_dit):
    """adaLN-zero: untrained model outputs exactly zero (final zero init)."""
    model, params = tiny_dit
    x = jnp.ones((1, 8, 8, 4))
    out = model.apply({"params": params}, x, jnp.asarray([0.5]), jnp.asarray([3]))
    assert float(jnp.abs(out).max()) == 0.0


def test_cfg_null_class(tiny_dit):
    model, params = tiny_dit
    x = jnp.ones((2, 8, 8, 4))
    t = jnp.asarray([0.5, 0.5])
    out_null = model.apply({"params": params}, x, t, None)
    out_forced = model.apply(
        {"params": params}, x, t, jnp.asarray([1, 2]), force_drop_ids=jnp.asarray([True, True])
    )
    np.testing.assert_allclose(np.asarray(out_null), np.asarray(out_forced))


def test_flow_matching_loss_and_grads(tiny_dit):
    from vfm_vae_tpu.train.transport import flow_matching_loss

    model, params = tiny_dit

    def model_fn(p, x, t, y, rng):
        return model.apply({"params": p}, x, t, y, train=rng is not None, rng=rng)

    latents = jnp.asarray(np.random.default_rng(1).standard_normal((4, 8, 8, 4)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])

    def loss_fn(p):
        loss, aux = flow_matching_loss(model_fn, p, latents, labels, jax.random.PRNGKey(0))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_ode_sampler_runs(tiny_dit):
    from vfm_vae_tpu.train.transport import ode_euler_sample

    model, params = tiny_dit

    def model_fn(p, x, t, y, rng):
        return model.apply({"params": p}, x, t, y)

    out = ode_euler_sample(
        model_fn, params, jax.random.PRNGKey(0), (2, 8, 8, 4),
        labels=jnp.asarray([1, 2]), num_steps=4, cfg_scale=2.0,
    )
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_sde_sampler_runs(tiny_dit):
    from vfm_vae_tpu.train.transport import sde_sample

    model, params = tiny_dit

    def model_fn(p, x, t, y, rng):
        return model.apply({"params": p}, x, t, y)

    out = sde_sample(
        model_fn, params, jax.random.PRNGKey(0), (2, 8, 8, 4),
        labels=jnp.asarray([1, 2]), num_steps=4, cfg_scale=1.5,
    )
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_dit_repa_tap_and_loss():
    """REPA branch: feature tap after block k + projector + token-cosine
    alignment loss produce finite loss and grads for all parts."""
    from vfm_vae_tpu.models.dit import LightningDiT
    from vfm_vae_tpu.models.layers import Linear
    from vfm_vae_tpu.train.transport import flow_matching_loss
    from flax import linen as nn

    model = LightningDiT(
        input_size=8, patch_size=1, in_channels=4, hidden_size=64,
        depth=2, num_heads=4, num_classes=10, return_features_at=0,
    )
    x = jnp.zeros((2, 8, 8, 4))
    out, tap = model.apply(
        {"params": model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)),
                              jnp.zeros((2,), jnp.int32))["params"]},
        x, jnp.asarray([0.3, 0.7]), jnp.asarray([1, 2]),
    )
    assert out.shape == (2, 8, 8, 4) and tap.shape == (2, 64, 64)

    class Proj(nn.Module):
        @nn.compact
        def __call__(self, h):
            return Linear(64, 16, name="fc")(h)

    proj = Proj()
    dit_params = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((2,)), jnp.zeros((2,), jnp.int32)
    )["params"]
    proj_params = proj.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64)))["params"]
    params = {"dit": dit_params, "proj": proj_params}

    def model_fn(p, xt, t, y, rng):
        pred, tap = model.apply({"params": p["dit"]}, xt, t, y,
                                train=rng is not None, rng=rng)
        return pred, proj.apply({"params": p["proj"]}, tap)

    rng = jax.random.PRNGKey(2)
    latents = jax.random.normal(rng, (2, 8, 8, 4))
    targets = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 16))
    labels = jnp.asarray([4, 5])

    def lf(p):
        loss, aux = flow_matching_loss(
            model_fn, p, latents, labels, jax.random.PRNGKey(4),
            repa_targets=targets, repa_weight=0.5,
        )
        return loss

    loss, grads = jax.jit(jax.value_and_grad(lf))(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # Projector gradient must be nonzero (alignment term reaches it).
    pg = jax.tree_util.tree_leaves(grads["proj"])
    assert any(float(jnp.abs(g).max()) > 0 for g in pg)


def test_collect_block_features(tiny_dit):
    """Per-depth token-mean taps for SE-CKNNA (reference: diffusions/
    get_block_features_from_lightningdit.py:199-214): embedder, every
    block, and the final layer, and the velocity output is unchanged."""
    model, params = tiny_dit
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([0.5, 0.5])
    y = jnp.asarray([1, 2])
    out_plain = model.apply({"params": params}, x, t, y)
    out, feats = model.apply({"params": params}, x, t, y, collect_block_features=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_plain))
    assert set(feats) == {"embedder", "block_0", "block_1", "final_layer"}
    assert feats["embedder"].shape == (2, 64)
    assert feats["block_0"].shape == (2, 64)
    assert feats["final_layer"].shape == (2, 4)  # token-mean of the velocity head
    for v in feats.values():
        assert np.isfinite(np.asarray(v)).all()
