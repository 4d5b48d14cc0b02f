"""HLO traffic parser (core/hlo_traffic.py): the byte-level attribution
behind the training roofline dossier must agree with XLA's own aggregate
cost analysis on a program we can reason about by hand."""

import numpy as np

import jax
import jax.numpy as jnp

from vfm_vae_tpu.core.hlo_traffic import (
    parse_entry_traffic,
    shape_bytes,
    traffic_report,
)


def _hlo_of(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    return (
        c._executable.xla_executable.hlo_modules()[0].to_string(),
        c.cost_analysis() or {},
    )


def test_shape_bytes():
    assert shape_bytes("f32[8,256,256,3]{3,2,1,0}") == 8 * 256 * 256 * 3 * 4
    assert shape_bytes("bf16[64,64]") == 64 * 64 * 2
    assert shape_bytes("(f32[2,2]{1,0}, u8[10])") == 16 + 10
    assert shape_bytes("pred[]") == 1
    assert shape_bytes("token[]") == 0


def test_entry_traffic_matmul_chain():
    """x@w -> tanh -> sum: the dominant buffers are the two 64x64 fp32
    matrices (parameters, read) and the matmul output (written+read)."""

    def fn(x, w):
        return jnp.sum(jnp.tanh(x @ w))

    hlo, _ = _hlo_of(fn, jnp.zeros((64, 64)), jnp.zeros((64, 64)))
    vals = {v.name: v for v in parse_entry_traffic(hlo)}
    mat = 64 * 64 * 4
    params = [v for v in vals.values() if v.opcode == "parameter"]
    assert len(params) == 2
    for p in params:
        assert p.bytes == mat and p.reads >= 1
    produced = [v for v in vals.values()
                if v.opcode not in ("parameter", "constant") and v.bytes == mat]
    assert produced, "matmul/tanh intermediates missing"


def test_traffic_report_tracks_cost_analysis():
    """The entry read+write total must land in the same regime as XLA's
    'bytes accessed' (both are HLO proxies; exact equality is not defined
    — cost_analysis counts inside fusions, the entry model counts only
    materialized buffers, which is the HBM-relevant subset)."""

    def step(w, x):
        def loss(w):
            h = jnp.tanh(x @ w["a"])
            return jnp.sum((h @ w["b"]) ** 2)

        g = jax.grad(loss)(w)
        return jax.tree_util.tree_map(lambda p, gg: p - 0.1 * gg, w, g)

    w = {"a": jnp.zeros((256, 512)), "b": jnp.zeros((512, 128))}
    x = jnp.zeros((32, 256))
    hlo, ca = _hlo_of(step, w, x)
    rep = traffic_report(hlo)
    total = rep["total_gb"] * 1e9
    accessed = float(ca.get("bytes accessed", 0.0))
    assert accessed > 0
    # Same order of magnitude, and never zero: the model must see the
    # parameter streams (a: 512KB, b: 256KB read+write each at minimum).
    assert total > 1.5e6
    assert 0.2 < total / accessed < 5.0
    # Lanes: a grad step has fwd AND bwd traffic.
    assert rep["by_lane"].get("fwd", 0) > 0
    assert rep["by_lane"].get("bwd", 0) > 0
    # Class split: parameters are state-in; grads are cotangent buffers.
    assert rep["by_class"].get("state-in (params/opt/ema/batch)", 0) > 0
    # Every ranked buffer row is well-formed.
    for t in rep["top_buffers"]:
        assert t["traffic_mb"] >= 0 and t["reads"] >= 0
        assert t["writes"] in (0, 1)


def test_remat_lane_detected():
    """jax.checkpoint bodies re-run in the backward must land in the
    'remat' lane (the dossier's recompute share)."""

    @jax.checkpoint
    def block(x, w):
        return jnp.tanh(x @ w)

    def step(w, x):
        return jax.grad(lambda w: jnp.sum(block(x, w) ** 2))(w)

    hlo, _ = _hlo_of(step, jnp.zeros((128, 128)), jnp.zeros((64, 128)))
    rep = traffic_report(hlo)
    assert rep["by_lane"].get("remat", 0) > 0, rep["by_lane"]
