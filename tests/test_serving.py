"""Sharded serving layer (parallel/serving.py): the tool-side analog of the
reference's torchrun multi-GPU tools (tools/reconstruct/reconstruct.py:116-122,
tools/decode/decode_latents_to_images.py:49) — one process drives all local
devices through a data-axis mesh; results must match the single-device path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _runner(n_dev, batch, fn=None, batch_argnums=(0,)):
    from vfm_vae_tpu.parallel import ShardedFn, serving_mesh

    mesh = serving_mesh(jax.devices()[:n_dev])
    return ShardedFn(fn, batch, mesh=mesh, batch_argnums=batch_argnums), mesh


def test_sharded_fn_matches_single_device():
    """Same inputs through a 1-device and an 8-device ShardedFn give the
    same results — the per-tool parity contract, at the layer every tool
    shares."""
    w = np.asarray(np.random.default_rng(0).standard_normal((5, 7)), np.float32)

    def fn(v, x):
        return jnp.tanh(x @ v)

    x = np.asarray(np.random.default_rng(1).standard_normal((16, 5)), np.float32)
    one, _ = _runner(1, 16, fn, batch_argnums=(1,))
    eight, _ = _runner(8, 16, fn, batch_argnums=(1,))
    np.testing.assert_allclose(one(w, x), eight(w, x), rtol=1e-6, atol=1e-6)


def test_sharded_fn_pads_ragged_tail():
    """A tail batch smaller than the block is padded, computed, and trimmed
    back — same values as the full-batch rows, one compiled program."""

    def fn(x):
        return x * 2.0

    run, _ = _runner(8, 8, fn)
    full = run(np.arange(8, dtype=np.float32)[:, None])
    tail = run(np.arange(3, dtype=np.float32)[:, None])
    assert tail.shape == (3, 1)
    np.testing.assert_array_equal(tail, full[:3])
    assert run.fn._cache_size() == 1  # tail reused the full-batch program


def test_sharded_fn_block_rounds_up_to_mesh():
    """batch=3 on an 8-device mesh must still divide the data axis."""

    def fn(x):
        return x + 1.0

    run, mesh = _runner(8, 3, fn)
    assert run.block == 8
    out = run(np.zeros((3, 4), np.float32))
    assert out.shape == (3, 4)


def test_sharded_fn_tree_batch_and_dict_output():
    """Batch args may be pytrees and outputs may be dicts (the dit/reg
    feature extractor returns a tap->features dict)."""

    def fn(batch, rng):
        return {"sum": batch["a"] + batch["b"],
                "noise": batch["a"] + 0.0 * jax.random.normal(rng, batch["a"].shape)}

    run, _ = _runner(8, 8, fn, batch_argnums=(0,))
    tree = {"a": np.ones((6, 2), np.float32), "b": np.full((6, 2), 2.0, np.float32)}
    out = run(tree, jax.random.PRNGKey(0))
    assert set(out) == {"sum", "noise"}
    assert out["sum"].shape == (6, 2)
    np.testing.assert_array_equal(out["sum"], np.full((6, 2), 3.0))


def test_sharded_fn_rng_rows_stable_under_padding():
    """Threefry is per-element over the flat index: padding the leading dim
    must not perturb the real rows' noise (the reconstruct tool samples the
    posterior per batch; tail batches must not re-roll)."""

    def fn(x, rng):
        return x + jax.random.normal(rng, x.shape, x.dtype)

    run, _ = _runner(8, 8, fn, batch_argnums=(0,))
    key = jax.random.PRNGKey(3)
    full = run(np.zeros((8, 4), np.float32), key)
    tail = run(np.zeros((5, 4), np.float32), key)
    np.testing.assert_array_equal(tail, full[:5])


def test_process_shard_identity_single_process():
    from vfm_vae_tpu.parallel import process_shard

    items = list(range(10))
    assert process_shard(items) == items


def test_serving_mesh_device_cap(monkeypatch):
    from vfm_vae_tpu.parallel import serving_mesh

    monkeypatch.setenv("VFM_VAE_SERVING_DEVICES", "2")
    assert serving_mesh().devices.size == 2
    monkeypatch.delenv("VFM_VAE_SERVING_DEVICES")
    assert serving_mesh().devices.size == len(jax.local_devices())
