"""Integration test: full dual-phase train step on the 8-device CPU mesh.

Covers: G forward w/ aux losses, D dual-branch forward, LPIPS, the vjp-based
G step with adaptive VF weight, safe-loss state, EMA, optimizer masking
(frozen VFM + DINO), and batch sharding over the mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    from transformers import SiglipVisionConfig, SiglipVisionModel
    import torch

    d = tmp_path_factory.mktemp("vfm") / "siglip2-tiny-patch8-32"
    cfg = SiglipVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=8, num_channels=3,
    )
    torch.manual_seed(0)
    SiglipVisionModel(cfg).save_pretrained(d)

    from tests.test_generator_parity import G_KWARGS
    from vfm_vae_tpu.models.generator import Generator, trainable_path_predicates, trainable_mask
    from vfm_vae_tpu.models.discriminator import ProjectedDiscriminator
    from vfm_vae_tpu.train.lpips import LPIPS
    from vfm_vae_tpu.train.loss import TotalLoss, init_loss_state
    from vfm_vae_tpu.train.train_step import Trainer, TrainState
    from vfm_vae_tpu.train.optim import Adam

    gk = dict(G_KWARGS)
    gk["use_adaptive_vf_loss"] = True
    G = Generator(vfm_name=str(d), **gk)
    D = ProjectedDiscriminator(
        c_dim=0, vfm_name="siglip2", use_patchgan_discriminator=True,
        get_interm_feat=True,
        dino_kwargs=dict(
            hidden_size=48, num_layers=2, num_heads=4, mlp_dim=96,
            patch_size=8, image_size=32, hooks=(0, 1), hook_patch=True,
        ),
    )
    lpips = LPIPS()

    img = jnp.zeros((2, 32, 32, 3))
    gv = G.init({"params": jax.random.PRNGKey(0)}, img, train=False)
    dv = D.init({"params": jax.random.PRNGKey(1)}, img, train=False)
    lpips_params = lpips.init(jax.random.PRNGKey(2), img, img)["params"]

    loss = TotalLoss(
        G, D, vfm_name=str(d),
        use_equivariance_regularization=True,
        lpips_module=lpips,
        l1_pixel_loss_weight=1.0,
        perceptual_loss_weight=10.0,
        multiscale_pixel_loss_weights=[0.1, 0.1, 0.1],
        multiscale_block_indices=[0, 1, 2],
        vf_loss_weight=5.0,
        use_adaptive_vf_loss=True,
        kl_loss_weight=1e-6,
        stylegan_t_discriminator_loss_weight=1.0,
        patchgan_discriminator_loss_weight=1.0,
        feature_matching_loss_weight=10.0,
    )

    preds = trainable_path_predicates("train_all")
    mask = trainable_mask(gv["params"], preds)

    # D trainable mask: everything but the frozen DINO backbone.
    import flax.traverse_util as tu

    d_flat = tu.flatten_dict(dv["params"], sep="/")
    d_mask = tu.unflatten_dict(
        {k: not k.startswith("dino/") for k in d_flat}, sep="/"
    )

    g_tx = Adam(1e-4, mask=mask)
    d_tx = Adam(1e-4, mask=d_mask)
    trainer = Trainer(
        loss, g_tx, d_tx, lpips_params=lpips_params,
        g_trainable_mask=mask,
        vf_anchor_path=("ldm_adapter",) + tuple(
            # attnproj: final_quant.blocks[-1].mlp.w2.weight
            ["final_quant", "blocks_0", "mlp", "w2", "weight"]
        ),
        batch_size=8, ema_kimg=1.0, ema_rampup=0.05,
    )

    state = TrainState(
        g_params=gv["params"],
        d_params=dv["params"],
        g_bufs=gv.get("buffers", {}),
        d_bufs=dv.get("buffers", {}),
        ema_params=gv["params"],
        g_opt=g_tx.init(gv["params"]),
        d_opt=d_tx.init(dv["params"]),
        loss_state=init_loss_state(),
        cur_nimg=jnp.zeros((), jnp.float32),
    )
    return trainer, state, mask


def test_dual_phase_step(rig, mesh8):
    from vfm_vae_tpu.parallel import shard_batch
    import flax.traverse_util as tu

    trainer, state, mask = rig
    rng = jax.random.PRNGKey(42)
    real = np.random.default_rng(0).random((8, 32, 32, 3)).astype(np.float32)

    with jax.sharding.set_mesh(mesh8):
        real_sh = shard_batch(mesh8, jnp.asarray(real))
        d_step = jax.jit(trainer.d_step, static_argnames=("eq", "blur_sigma"))
        g_step = jax.jit(trainer.g_step, static_argnames=("eq", "blur_sigma"))

        state1, d_stats, d_total = d_step(state, real_sh, None, rng, (1.0, 0, False))
        assert np.isfinite(float(d_total))

        state2, g_stats, g_total = g_step(state1, real_sh, None, rng, (1.0, 0, False))
        assert np.isfinite(float(g_total))
        assert float(state2.cur_nimg) == 8

    # Frozen VFM params unchanged; trainable params changed.
    p0 = tu.flatten_dict(state.g_params, sep="/")
    p2 = tu.flatten_dict(state2.g_params, sep="/")
    m = tu.flatten_dict(mask, sep="/")
    changed = [k for k in p0 if np.any(np.asarray(p0[k]) != np.asarray(p2[k]))]
    assert any(k.startswith("synthesis/") for k in changed)
    assert any(k.startswith("ldm_adapter/") for k in changed)
    for k in changed:
        assert m[k], f"frozen param {k} changed"
    assert not any(k.startswith("vfm_encoder/") for k in changed)

    # EMA moved toward the new params on trainable leaves.
    e2 = tu.flatten_dict(state2.ema_params, sep="/")
    some_key = next(k for k in changed if m[k])
    assert np.any(np.asarray(e2[some_key]) != np.asarray(p0[some_key]))

    # Key stats present.
    assert "Loss/G/l1_pixel_loss" in g_stats
    assert "Loss/G/vf_loss" in g_stats
    assert "Loss/D/stylegan_t/loss" in d_stats


@pytest.mark.heavy
def test_eq_bucket_step(rig, mesh8):
    """A non-trivial EQ bucket compiles and runs (different output shapes)."""
    from vfm_vae_tpu.parallel import shard_batch

    trainer, state, _ = rig
    rng = jax.random.PRNGKey(7)
    real = np.random.default_rng(1).random((8, 32, 32, 3)).astype(np.float32)
    with jax.sharding.set_mesh(mesh8):
        real_sh = shard_batch(mesh8, jnp.asarray(real))
        g_step = jax.jit(trainer.g_step, static_argnames=("eq", "blur_sigma"))
        state1, stats, total = g_step(state, real_sh, None, rng, (0.5, 1, False))
        assert np.isfinite(float(total))


@pytest.mark.heavy
def test_grad_accumulation(rig, mesh8):
    """accumulate_gradients=2 runs and matches batch semantics (sum of
    microbatch grads, single Adam step)."""
    import copy
    from vfm_vae_tpu.train.train_step import Trainer

    trainer, state, mask = rig
    t2 = Trainer(
        trainer.loss, trainer.g_tx, trainer.d_tx,
        lpips_params=trainer.lpips_params, g_trainable_mask=mask,
        vf_anchor_path=trainer.vf_anchor_path, batch_size=8,
        ema_kimg=1.0, num_accumulation=2,
    )
    rng = jax.random.PRNGKey(5)
    real = np.random.default_rng(3).random((8, 32, 32, 3)).astype(np.float32)
    with jax.sharding.set_mesh(mesh8):
        from vfm_vae_tpu.parallel import shard_batch

        real_sh = shard_batch(mesh8, jnp.asarray(real))
        g_step = jax.jit(t2.g_step, static_argnames=("eq", "blur_sigma"))
        s1, stats, total = g_step(state, real_sh, None, rng, (1.0, 0, False))
        assert np.isfinite(float(total))
        assert float(s1.cur_nimg) == 8
        d_step = jax.jit(t2.d_step, static_argnames=("eq", "blur_sigma"))
        s2, dstats, dtotal = d_step(s1, real_sh, None, rng, (1.0, 0, False))
        assert np.isfinite(float(dtotal))


def test_zero1_optimizer_sharding(mesh8):
    """ZeRO-1: Adam moments shard over the data axis, update numerics are
    identical to the replicated layout, and the step keeps them sharded."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vfm_vae_tpu.parallel import shard_opt_state, zero1_sharding
    from vfm_vae_tpu.train.optim import Adam

    params = {
        "w": jnp.ones((16, 8)),      # 16 % data-axis == 0 -> sharded on 0
        "b": jnp.ones((3,)),         # 3 not divisible -> replicated
    }
    tx = Adam(lr=1e-2, betas=(0.9, 0.99))
    opt = tx.init(params)
    opt_sh = shard_opt_state(mesh8, opt)

    n = mesh8.shape["data"]
    sh_w = zero1_sharding(mesh8, params["w"])
    assert sh_w.spec == P("data", None)
    assert zero1_sharding(mesh8, params["b"]).spec == P()

    grads = {"w": jnp.full((16, 8), 0.5), "b": jnp.full((3,), 0.25)}

    @jax.jit
    def step(opt, params):
        upd, opt = tx.update(grads, opt, params)
        import optax

        return optax.apply_updates(params, upd), opt

    with jax.sharding.set_mesh(mesh8):
        p_ref, opt_ref = step(opt, params)
        p_sh, opt_sh2 = step(opt_sh, params)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # moments stay sharded through the step
    leaves = [x for x in jax.tree_util.tree_leaves(opt_sh2)
              if hasattr(x, "sharding") and np.ndim(x) == 2]
    # XLA normalizes trailing Nones: P("data", None) == P("data",) as a layout.
    assert any(tuple(x.sharding.spec)[:1] == ("data",) for x in leaves), \
        [getattr(x, "sharding", None) for x in leaves]


@pytest.mark.heavy
def test_fused_step(rig, mesh8):
    """Fused simultaneous D+G step: one generator forward feeds both
    branches; both param sets update, frozen towers stay frozen, and the
    stats dict carries both Loss/G/* and Loss/D/* names."""
    from vfm_vae_tpu.parallel import shard_batch
    import flax.traverse_util as tu

    trainer, state, mask = rig
    rng = jax.random.PRNGKey(11)
    real = np.random.default_rng(2).random((8, 32, 32, 3)).astype(np.float32)

    with jax.sharding.set_mesh(mesh8):
        real_sh = shard_batch(mesh8, jnp.asarray(real))
        fused = jax.jit(trainer.fused_step, static_argnames=("eq", "blur_sigma"))
        state1, stats, total = fused(state, real_sh, None, rng, (1.0, 0, False))
        assert np.isfinite(float(total))
        assert float(state1.cur_nimg) == 8

    # both G and D trained, frozen towers untouched
    g0 = tu.flatten_dict(state.g_params, sep="/")
    g1 = tu.flatten_dict(state1.g_params, sep="/")
    m = tu.flatten_dict(mask, sep="/")
    g_changed = [k for k in g0 if np.any(np.asarray(g0[k]) != np.asarray(g1[k]))]
    assert any(k.startswith("synthesis/") for k in g_changed)
    assert not any(k.startswith("vfm_encoder/") for k in g_changed)
    for k in g_changed:
        assert m[k], f"frozen G param {k} changed"

    d0 = tu.flatten_dict(state.d_params, sep="/")
    d1 = tu.flatten_dict(state1.d_params, sep="/")
    d_changed = [k for k in d0 if np.any(np.asarray(d0[k]) != np.asarray(d1[k]))]
    assert d_changed, "D did not train in fused step"
    assert not any(k.startswith("dino/") for k in d_changed)

    assert "Loss/G/l1_pixel_loss" in stats
    assert "Loss/D/stylegan_t/loss" in stats
    assert "Loss/G/vf_loss" in stats


@pytest.mark.heavy
def test_d_loss_from_gen_matches_d_loss(rig, mesh8):
    """d_loss == d_loss_from_gen when handed the same generated image
    (refactor guard for the shared-forward path)."""
    trainer, state, _ = rig
    loss = trainer.loss
    real = jnp.asarray(
        np.random.default_rng(3).random((4, 32, 32, 3)), jnp.float32
    )
    keys = ["sample", "d_gen", "d_real", "shuffle", "d_gen_s", "d_real_s"]
    rngs = dict(zip(keys, jax.random.split(jax.random.PRNGKey(5), 6)))
    eq = (1.0, 0, False)

    t1, aux1 = loss.d_loss(
        state.d_params, state.g_params, state.g_bufs, state.d_bufs,
        real, None, rngs, eq, state.cur_nimg,
    )
    gen_out, _ = loss.G.apply(
        {"params": state.g_params, "buffers": state.g_bufs},
        real, None, rng=rngs["sample"], eq=eq, train=True, mutable=["buffers"],
    )
    t2, aux2 = loss.d_loss_from_gen(
        state.d_params, state.d_bufs, gen_out.gen_img, real, None, rngs, eq,
        state.cur_nimg,
    )
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)


def test_eq_angle_folding(rig, mesh8):
    """jit_train_step folds all four rot90 angles (and the shape-identical
    scale-1.0 prior bucket) into ONE compiled program, and the folded step
    matches the fully-static jit numerically."""
    from vfm_vae_tpu.parallel import shard_batch
    from vfm_vae_tpu.train.train_step import jit_train_step

    trainer, state, _ = rig
    rng = jax.random.PRNGKey(13)
    real = np.random.default_rng(9).random((8, 32, 32, 3)).astype(np.float32)

    with jax.sharding.set_mesh(mesh8):
        real_sh = shard_batch(mesh8, jnp.asarray(real))
        g_fold = jit_train_step(trainer.g_step, donate=False)
        totals = {}
        for eq in [(1.0, 0, False), (1.0, 1, False), (1.0, 2, False),
                   (1.0, 3, False), (1.0, 0, True)]:
            _, _, total = g_fold(state, real_sh, None, rng, eq)
            totals[eq] = float(total)
            assert np.isfinite(totals[eq])
        assert g_fold.jitted._cache_size() == 1, (
            "angle folding must compile ONE variant for all scale-1.0 buckets"
        )
        # Angle actually matters (the switch is live, not DCE'd to identity).
        assert totals[(1.0, 1, False)] != totals[(1.0, 0, False)]
        # (1.0, 0, True) canonicalizes onto (1.0, 0, False) — same program,
        # same value.
        assert totals[(1.0, 0, True)] == totals[(1.0, 0, False)]

        # A different scale is a genuine new bucket.
        _, _, t2 = g_fold(state, real_sh, None, rng, (0.5, 2, False))
        assert np.isfinite(float(t2))
        assert g_fold.jitted._cache_size() == 2

        # Numerics match the fully-static compile for a rotated bucket.
        g_static = jax.jit(trainer.g_step, static_argnames=("eq", "blur_sigma"))
        _, _, t_static = g_static(state, real_sh, None, rng, (1.0, 3, False))
        np.testing.assert_allclose(
            totals[(1.0, 3, False)], float(t_static), rtol=1e-5
        )


def test_place_state_breaks_donation_aliases(rig):
    """A TrainState fresh from init aliases g_params and ema_params (one
    jax.Array in two slots). Donating that state is an XLA runtime error
    ("attempt to donate the same buffer twice" — surfaced through the axon
    tunnel as a bare InvalidArgument). place_state is the canonical commit
    point and must break the alias."""
    from vfm_vae_tpu.parallel import make_mesh, place_state

    _, module_state, _ = rig
    leaf = lambda s: jax.tree_util.tree_leaves(s.g_params)[0]
    assert leaf(module_state) is jax.tree_util.tree_leaves(module_state.ema_params)[0]

    # Donate a PRIVATE copy: place_state is a no-op device_put when the
    # sharding already matches (parallel/mesh.py), so on the CPU backend the
    # "placed" leaves ARE the input's buffers. Donating the module-scoped rig
    # fixture would delete its arrays for every later test in this module.
    state = jax.tree_util.tree_map(jnp.array, module_state)
    # jnp.array copies but collapses the g/ema alias per-leaf only — rebuild
    # the intra-state alias the real init produces, so the test still
    # exercises alias-breaking.
    state = state.replace(ema_params=state.g_params)
    assert leaf(state) is jax.tree_util.tree_leaves(state.ema_params)[0]

    mesh = make_mesh(jax.devices()[:1])  # 1 device: no collectives, so
    placed = place_state(mesh, state)    # donation is safe on CPU here
    g_ids = {id(x) for x in jax.tree_util.tree_leaves(placed.g_params)}
    e_ids = {id(x) for x in jax.tree_util.tree_leaves(placed.ema_params)}
    assert not (g_ids & e_ids)

    # The donated pass-through actually executes (this is what failed).
    step = jax.jit(
        lambda s: jax.tree_util.tree_map(lambda x: x + 0, s),
        donate_argnums=(0,),
    )
    out = step(placed)
    assert np.isfinite(float(jax.tree_util.tree_leaves(out.g_params)[0].sum()))


def test_adam_mask_freezes_exactly():
    """Masked-out leaves must receive a ZERO update. optax.masked alone
    passes the raw gradient through as the update (gradient ascent at
    lr=1 on the 'frozen' DINO tower) — regression guard for that bug."""
    import optax
    from vfm_vae_tpu.train.optim import Adam

    params = {"train": jnp.ones(3), "frozen": jnp.ones(3)}
    grads = {"train": jnp.full(3, 0.5), "frozen": jnp.full(3, 0.5)}
    tx = Adam(1e-2, mask={"train": True, "frozen": False})
    st = tx.init(params)
    up, _ = tx.update(grads, st, params)
    new = optax.apply_updates(params, up)
    np.testing.assert_array_equal(np.asarray(new["frozen"]), np.ones(3))
    assert np.all(np.asarray(new["train"]) != 1.0)


def test_uint8_batch_matches_fp32(rig, mesh8):
    """The loop transfers RAW uint8 batches (4x fewer host->device bytes)
    and the step normalizes on device (train_step._as_unit_float): a uint8
    batch must produce the same updates as the same batch pre-divided to
    fp32 [0,1] on host, up to cross-program fusion noise (the in-graph
    convert changes XLA's fusion choices; measured total delta ~4e-7
    relative — bit-identity across two different programs is not a
    guarantee XLA makes)."""
    from vfm_vae_tpu.parallel import shard_batch
    import flax.traverse_util as tu

    trainer, state, mask = rig
    rng = jax.random.PRNGKey(21)
    raw = np.random.default_rng(5).integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)

    with jax.sharding.set_mesh(mesh8):
        fused = jax.jit(trainer.fused_step, static_argnames=("eq", "blur_sigma"))
        s_u8, _, t_u8 = fused(state, shard_batch(mesh8, jnp.asarray(raw)),
                              None, rng, (1.0, 0, False))
        s_f32, _, t_f32 = fused(
            state, shard_batch(mesh8, jnp.asarray(raw, jnp.float32) / 255.0),
            None, rng, (1.0, 0, False))

    np.testing.assert_allclose(float(t_u8), float(t_f32), rtol=1e-5)
    a = tu.flatten_dict(s_u8.g_params, sep="/")
    b = tu.flatten_dict(s_f32.g_params, sep="/")
    for k in a:
        # Adam normalizes by rms(grad): for near-zero grads a ~1e-7 loss
        # fusion delta becomes a ~1e-6 parameter delta (measured max
        # 1.4e-6 on 1/12288 elements). A real normalization bug (e.g. a
        # double /255) would miss by orders of magnitude.
        np.testing.assert_allclose(
            np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
            rtol=1e-3, atol=1e-5, err_msg=k)
