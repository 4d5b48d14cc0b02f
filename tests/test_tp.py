"""Tensor parallelism over the mesh `model` axis (parallel/tp.py).

The reference has no TP (SURVEY.md §2.8); the claim here is that the
frozen-ViT matmuls really shard over `model`: (a) model=2 output equals
model=1 output, (b) the compiled program contains a cross-model all-reduce
(the Megatron row-parallel psum), (c) intermediate activations carry the
column-parallel sharding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


@pytest.fixture(scope="module")
def tower_and_inputs():
    from vfm_vae_tpu.models.vit import SigLIPVisionTower

    tower = SigLIPVisionTower(
        hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128,
        patch_size=8, image_size=32, use_head=True,
    )
    img = jnp.asarray(np.random.default_rng(0).random((8, 32, 32, 3)), jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), img)
    return tower, params, img


def _run(tower, params, img, mesh):
    from vfm_vae_tpu.parallel import replicated, shard_batch

    with jax.sharding.set_mesh(mesh):
        fn = jax.jit(
            lambda p, x: tower.apply(p, x, collect=(0, 2), need_pooled=True)
        )
        hs, last, pooled = fn(
            jax.device_put(params, replicated(mesh)), shard_batch(mesh, img)
        )
        return jax.device_get(last), jax.device_get(pooled), fn.lower(
            jax.device_put(params, replicated(mesh)), shard_batch(mesh, img)
        ).compile()


def test_model2_matches_model1(tower_and_inputs):
    from vfm_vae_tpu.parallel import make_mesh

    tower, params, img = tower_and_inputs
    last1, pooled1, _ = _run(tower, params, img, make_mesh(model=1))
    last2, pooled2, compiled = _run(tower, params, img, make_mesh(model=2))
    np.testing.assert_allclose(last1, last2, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(pooled1, pooled2, rtol=2e-5, atol=2e-5)
    # The Megatron row-parallel contraction must appear as a cross-model
    # all-reduce in the compiled program.
    hlo = compiled.as_text()
    assert "all-reduce" in hlo, "no all-reduce: model axis is decorative"


def test_activation_sharding_is_column_parallel():
    """shard_hidden/shard_heads produce the Megatron layout under an active
    model axis and are no-ops without one."""
    from vfm_vae_tpu.parallel import make_mesh, shard_heads, shard_hidden

    mesh = make_mesh(model=2)  # data=4, model=2
    x = jnp.zeros((8, 16, 128))
    q = jnp.zeros((8, 16, 4, 32))
    with jax.sharding.set_mesh(mesh):
        xs = jax.jit(shard_hidden)(x)
        qs = jax.jit(shard_heads)(q)
    assert xs.sharding.spec == P("data", None, "model")
    # (jax normalizes away the trailing None of P('data', None, 'model', None))
    assert qs.sharding.spec == P("data", None, "model")
    # Non-divisible feature dim: constraint skipped, not crashed.
    odd = jnp.zeros((8, 16, 129))
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(shard_hidden)(odd)
    assert out.shape == odd.shape
    # No active mesh: identity.
    assert shard_hidden(x) is x


def test_eva_tower_model2_matches_model1():
    """The EVA tower's own blocks (separate q/k/v, sub-LN, SwiGLU) carry the
    same TP constraints."""
    from vfm_vae_tpu.models.eva import EVATower
    from vfm_vae_tpu.parallel import make_mesh, replicated, shard_batch

    tower = EVATower(hidden_size=64, num_layers=2, num_heads=4, mlp_dim=128,
                     patch_size=8, image_size=32)
    img = jnp.asarray(np.random.default_rng(3).random((8, 32, 32, 3)), jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), img)

    outs = {}
    for model in (1, 2):
        mesh = make_mesh(model=model)
        with jax.sharding.set_mesh(mesh):
            _, last, pooled = jax.jit(lambda p, x: tower.apply(p, x))(
                jax.device_put(params, replicated(mesh)), shard_batch(mesh, img)
            )
            outs[model] = (jax.device_get(last), jax.device_get(pooled))
    np.testing.assert_allclose(outs[1][0], outs[2][0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(outs[1][1], outs[2][1], rtol=2e-5, atol=2e-5)


def test_qwen_tower_model2_matches_model1():
    """Qwen vision blocks (packed qkv, SwiGLU) under the model axis."""
    from vfm_vae_tpu.models.qwen import QwenVisionTower, qwen_patchify
    from vfm_vae_tpu.parallel import make_mesh, replicated, shard_batch

    tower = QwenVisionTower(
        hidden_size=64, depth=2, num_heads=4, mlp_dim=128, out_hidden_size=32,
        patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
        window_size=16, fullatt_block_indexes=(1,),
    )
    img = jnp.asarray(np.random.default_rng(4).random((8, 16, 16, 3)), jnp.float32)
    patches, grid = qwen_patchify(img, 4, 2, 2)
    params = tower.init(jax.random.PRNGKey(0), patches, grid)

    outs = {}
    for model in (1, 2):
        mesh = make_mesh(model=model)
        with jax.sharding.set_mesh(mesh):
            _, merged, pooled = jax.jit(
                lambda p, x: tower.apply(p, x, grid)
            )(jax.device_put(params, replicated(mesh)), shard_batch(mesh, patches))
            outs[model] = (jax.device_get(merged), jax.device_get(pooled))
    np.testing.assert_allclose(outs[1][0], outs[2][0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(outs[1][1], outs[2][1], rtol=2e-5, atol=2e-5)


def test_dryrun_mesh_uses_model_axis(tower_and_inputs):
    """The graft dryrun builds a (4, 2) mesh on 8 devices; the tiny train
    Generator's frozen tower divides by model=2, so the same constraint
    machinery engages there (full step exercised by __graft_entry__)."""
    from vfm_vae_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices(), model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
