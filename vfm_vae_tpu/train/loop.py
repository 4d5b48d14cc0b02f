"""Main training loop (reference: training/training_loop.py:462-881).

Orchestration only — all numerics live in jitted steps (train_step.py).
Per batch: [D-phase, G-phase] jitted updates with host-sampled EQ buckets;
per tick: status line, stats.jsonl, image + network snapshots, auto-resume
bookkeeping. Collectives, grad averaging and EMA are inside the steps.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import format_time, print0
from ..core.profiling import PhaseTimer, device_memory_stats, host_memory_stats
from ..core.stats import Collector
from ..models.adapter import EquivarianceTransform
from ..models.generator import trainable_mask, trainable_path_predicates
from ..parallel import local_mesh, shard_batch
from .checkpoint import find_latest_snapshot, load_snapshot, merge_loaded, save_snapshot
from .loss import TotalLoss, init_loss_state
from .optim import Adam
from .train_step import Trainer, TrainState


def save_image_grid(images: np.ndarray, path: str, drange=(-1, 1), grid_wh=None) -> None:
    """(reference: training_loop.py:146-194) NHWC batch -> PNG grid."""
    import PIL.Image

    lo, hi = drange
    img = (images - lo) * (255 / (hi - lo))
    img = np.rint(img).clip(0, 255).astype(np.uint8)
    B, H, W, C = img.shape
    if grid_wh is None:
        gw = int(np.ceil(np.sqrt(B)))
        gh = int(np.ceil(B / gw))
    else:
        gw, gh = grid_wh
    canvas = np.zeros((gh * H, gw * W, C), np.uint8)
    for i in range(B):
        y, x = divmod(i, gw)
        canvas[y * H : (y + 1) * H, x * W : (x + 1) * W] = img[i]
    PIL.Image.fromarray(canvas).save(path)


def training_loop(
    run_dir: str,
    training_set_kwargs: Dict[str, Any],
    G_kwargs: Dict[str, Any],
    D_kwargs: Dict[str, Any],
    loss_kwargs: Dict[str, Any],
    G_opt_kwargs: Dict[str, Any],
    D_opt_kwargs: Dict[str, Any],
    batch_size: int = 512,
    accumulate_gradients: int = 1,
    kimg_per_tick: int = 10,
    image_snapshot_ticks: int = 100,
    network_snapshot_ticks: int = 100,
    total_kimg: int = 20000,
    ema_kimg: float = 160.0,
    ema_rampup: Optional[float] = 0.05,
    random_seed: int = 42,
    resume_path: Optional[str] = None,
    resume_kimg: int = 0,
    resume_discriminator: bool = True,
    lpips_ckpt: Optional[str] = None,
    allow_random_lpips: bool = False,
    metrics=(),
    in_loop_metric_batches: int = 2,
    abort_fn=None,
    max_steps: Optional[int] = None,
    data_workers: int = 3,
    mesh=None,
    compute_dtype: str = "bfloat16",
    wandb_project_name: Optional[str] = None,
    wandb_run_name: Optional[str] = None,
    fused_phases: bool = False,
    **unused_kwargs,
):
    from ..core.compile_cache import enable_persistent_cache
    from ..core.registry import construct_class_by_name, get_class_by_name

    cache_dir = enable_persistent_cache()
    if cache_dir:
        print0(f"[compile-cache] persistent XLA cache at {cache_dir}")
    start_time = time.time()
    rank = jax.process_index()
    num_processes = jax.process_count()
    mesh = mesh or local_mesh()
    # Establish cross-process communicators NOW, in lockstep — the lazy
    # rendezvous at the first collective has a hard ~30 s deadline that
    # compile skew between processes otherwise blows (parallel/mesh.py
    # warm_up_collectives docstring; reference pays this inside
    # init_process_group, torch_utils/distributed.py:24-41).
    if num_processes > 1:
        from ..parallel import warm_up_collectives

        warm_up_collectives(mesh)
        print0(f"[multihost] collective warm-up done ({num_processes} processes)")
    # EQ bucket sampling must be IDENTICAL on every process: the (scale,
    # angle, prior) tuple feeds the jitted SPMD step over the GLOBAL mesh,
    # so divergent draws would have hosts executing different programs
    # against the same collectives (per-sample randomness comes from the
    # jax rng inside the step, not from this host rng).
    np_rng = np.random.default_rng(random_seed)
    host_rng = jax.random.PRNGKey(random_seed)

    # ------------------------------------------------------------ dataset
    print0("Loading training set...")
    training_set = construct_class_by_name(**training_set_kwargs)
    tokenizer = None
    assert batch_size % num_processes == 0, (
        f"global batch {batch_size} not divisible by {num_processes} processes"
    )
    data_iter = iter(
        training_set.loader(
            # batch_size is GLOBAL (configs/vfm_vae_details.yaml); each
            # process loads only its slice (reference splits per rank,
            # training_loop.py:272-289).
            batch_size=batch_size // num_processes,
            workers=data_workers,
            base_seed=random_seed,
            num_processes=num_processes,
            process_index=rank,
        )
    )

    # ------------------------------------------------------------ modules
    print0("Constructing networks...")
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    g_cls = get_class_by_name(G_kwargs.get("class_name", "networks.generator.Generator"))
    gk = {k: v for k, v in G_kwargs.items() if k != "class_name"}
    # Training default: selective rematerialization, chosen by measured
    # HBM fit (flagship B-sweep, tools/bench_train.py on v5e): `dots` is
    # fastest at per-chip batch <= 12 (447 ms at B8 vs 471 blanket-full)
    # but the matmul outputs it saves blow 16 GB HBM at B16, where
    # blanket `full` still fits and is the peak-throughput cell (883 ms,
    # 18.12 img/s). YAML G_kwargs `remat:` overrides (false / full /
    # dots / names).
    from ..parallel.mesh import DATA_AXIS

    per_chip_batch = batch_size // max(1, accumulate_gradients) // mesh.shape[DATA_AXIS]
    gk.setdefault("remat", "dots" if per_chip_batch <= 12 else "full")
    G = g_cls(compute_dtype=dtype, **gk)
    d_cls = get_class_by_name(
        D_kwargs.get("class_name", "networks.discriminator.ProjectedDiscriminator")
    )
    dk = {k: v for k, v in D_kwargs.items() if k != "class_name"}
    dk.setdefault("c_dim", G.c_dim)
    dk.setdefault("vfm_name", G.vfm_name)
    D = d_cls(compute_dtype=dtype, **dk)

    if G.conditional and G.label_type in ("text", "cls2text"):
        from ..data.tokenize import TextTokenizer

        try:
            tokenizer = TextTokenizer(G.vfm_name)
        except Exception as e:
            print0(f"[warn] text conditioning requested but tokenizer failed: {e}")

    res = G.img_resolution
    init_img = jnp.zeros((2, res, res, 3))
    # Conditional models need a label example at init (text towers / class
    # embeddings only materialize params when conditioning is present).
    init_c = None
    if G.conditional:
        if G.label_type in ("text", "cls2text"):
            init_c = {
                "input_ids": jnp.zeros((2, 64), jnp.int32),
                "attention_mask": jnp.ones((2, 64), bool),
            }
        else:
            init_c = jnp.zeros((2, G.label_dim or 0), jnp.float32)
    gv = jax.jit(lambda r: G.init({"params": r}, init_img, init_c, train=False))(jax.random.PRNGKey(random_seed))
    d_init_c = jnp.zeros((2, D.c_dim), jnp.float32) if getattr(D, "c_dim", 0) else None
    dv = jax.jit(lambda r: D.init({"params": r}, init_img, d_init_c, train=False))(jax.random.PRNGKey(random_seed + 1))
    g_params, g_bufs = gv["params"], gv.get("buffers", {})
    d_params, d_bufs = dv["params"], dv.get("buffers", {})

    from ..core.summary import module_summary

    print0(module_summary(g_params, g_bufs, name="Generator"))
    print0(module_summary(d_params, d_bufs, name="Discriminator"))

    # LPIPS.
    # class_name is registry plumbing; vfm_name is re-derived from G below
    # (derive_config back-fills it into loss_kwargs from G_kwargs, which
    # would otherwise collide with the explicit kwarg).
    lk = {k: v for k, v in loss_kwargs.items() if k not in ("class_name", "vfm_name")}
    lpips_module = None
    lpips_params = None
    if float(lk.get("perceptual_loss_weight", 0.0)) > 0:
        from .lpips import LPIPS, get_lpips_ckpt, load_lpips_params

        lpips_module = LPIPS()
        try:
            lpips_params = load_lpips_params(get_lpips_ckpt(lpips_ckpt))
        except Exception as e:
            # Random-init LPIPS silently trains against a garbage perceptual
            # loss — refuse unless explicitly requested (tests/smoke runs).
            if not allow_random_lpips:
                raise RuntimeError(
                    f"LPIPS weights unavailable ({e}); download "
                    f"vgg.pth and set lpips_ckpt, or set "
                    f"allow_random_lpips: true to run with random-init LPIPS"
                ) from e
            print0(f"[warn] LPIPS weights unavailable ({e}); "
                   "allow_random_lpips=True -> random-init LPIPS")
            lpips_params = lpips_module.init(jax.random.PRNGKey(0), init_img, init_img)["params"]

    # ------------------------------------------------------------ loss/opt
    loss = TotalLoss(
        G, D,
        vfm_name=G.vfm_name,
        lpips_module=lpips_module,
        total_kimg=total_kimg,
        **lk,
    )

    preds = trainable_path_predicates(
        G_kwargs.get("train_mode", "train_all"),
        conditional=G.conditional,
        label_type=G.label_type,
        block_resolutions=G.block_resolutions,
        concat_z_block_indices=G.concat_z_block_indices,
    )
    g_mask = trainable_mask(g_params, preds)
    import flax.traverse_util as tu

    d_flat = tu.flatten_dict(d_params, sep="/")
    d_mask = tu.unflatten_dict({k: not k.startswith("dino/") for k in d_flat}, sep="/")

    g_tx = Adam(
        lr=float(G_opt_kwargs.get("lr", 1e-4)),
        betas=tuple(G_opt_kwargs.get("betas", (0.0, 0.99))),
        eps=float(G_opt_kwargs.get("eps", 1e-8)),
        mask=g_mask,
    )
    d_tx = Adam(
        lr=float(D_opt_kwargs.get("lr", 1e-4)),
        betas=tuple(D_opt_kwargs.get("betas", (0.0, 0.99))),
        eps=float(D_opt_kwargs.get("eps", 1e-8)),
        mask=d_mask,
    )

    vf_anchor = None
    if lk.get("use_adaptive_vf_loss", False):
        # Path of the adapter's anchor tensor inside the G param tree.
        from ..models.adapter import LDMAdapter  # noqa

        if G.how_to_compress == "conv":
            vf_anchor = ("ldm_adapter", "final_quant", "weight")
        else:
            last = G.attnproj_quant_layers - 1
            vf_anchor = ("ldm_adapter", "final_quant", f"blocks_{last}", "mlp", "w2", "weight")

    trainer = Trainer(
        loss, g_tx, d_tx,
        lpips_params=lpips_params,
        g_trainable_mask=g_mask,
        vf_anchor_path=vf_anchor,
        batch_size=batch_size,
        ema_kimg=ema_kimg,
        ema_rampup=ema_rampup,
        num_accumulation=accumulate_gradients,
    )

    state = TrainState(
        g_params=g_params,
        d_params=d_params,
        g_bufs=g_bufs,
        d_bufs=d_bufs,
        ema_params=g_params,
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params),
        loss_state=init_loss_state(),
        cur_nimg=jnp.asarray(resume_kimg * 1000, jnp.float32),
    )
    # Commit the full state to its canonical layout: params/EMA replicated,
    # Adam moments ZeRO-1 sharded over the data axis (frees 2x-params fp32
    # of per-chip HBM, the binding constraint at 256px on 16GB v5e).
    # Committing ALL leaves (not just the moments) is what makes buffer
    # donation alias cleanly: input shardings == pinned output shardings.
    from ..parallel import place_state

    state = place_state(mesh, state)

    # ------------------------------------------------------------ resume
    if resume_path:
        print0(f"Resuming from {resume_path} ...")
        import flax.serialization

        template = flax.serialization.to_state_dict(state)
        try:
            # Template restore keeps nested-container structure exact.
            loaded = load_snapshot(os.path.abspath(resume_path), template)
        except Exception as e:
            print0(f"[resume] template restore failed ({type(e).__name__}); merging loosely")
            loaded = load_snapshot(os.path.abspath(resume_path))
            loaded = merge_loaded(template, loaded)
        if not resume_discriminator:
            loaded["d_params"] = template["d_params"]
            loaded["d_opt"] = template["d_opt"]
        state = flax.serialization.from_state_dict(state, loaded)
        # Restored arrays land on one device; re-commit to the canonical
        # layout (replicated params/EMA, ZeRO-1 moments).
        state = place_state(mesh, state)

    eq_transform = EquivarianceTransform(
        apply=bool(lk.get("use_equivariance_regularization", False)),
        p_eq_prior=G_kwargs.get("equivariance_regularization_p_prior", 0.5),
        p_eq_prior_scale=G_kwargs.get("equivariance_regularization_p_prior_scale", 0.25),
    )

    # ------------------------------------------------------------ sinks
    os.makedirs(run_dir, exist_ok=True)
    os.makedirs(os.path.join(run_dir, "train_samples"), exist_ok=True)
    stats_path = os.path.join(run_dir, "stats.jsonl") if rank == 0 else None
    stats_file = open(stats_path, "a") if stats_path else None
    collector = Collector()
    from ..core.wandb_sink import WandbSink

    wandb_sink = WandbSink(
        wandb_project_name,
        wandb_run_name,
        run_dir,
        config={
            "batch_size_per_process": batch_size // num_processes,
            "accumulation_steps": accumulate_gradients,
            "process_count": num_processes,
            "lr of G": G_opt_kwargs.get("lr"),
            "lr of D": D_opt_kwargs.get("lr"),
            "total_kimg": total_kimg,
        },
        enabled=rank == 0,
    )

    # Pin step outputs: params/EMA replicated, moments ZeRO-sharded (else
    # GSPMD propagates the moment sharding into params and the eager
    # snapshot/metric G.apply below chokes on the tiled layout).
    from ..parallel import replicated, zero1_state_shardings

    _out_sh = (zero1_state_shardings(mesh, state), replicated(mesh), replicated(mesh))

    from .train_step import jit_train_step

    # donate=True: the TrainState (params + EMA + both Adam states) is
    # consumed and rebound every step — without donation XLA double-buffers
    # multiple GB of HBM (reference updates in-place implicitly,
    # training_loop.py:727-742). OFF on the CPU backend: XLA's in-process
    # CPU collectives deadlock under donated buffers (measured A/B,
    # __graft_entry__._dryrun_multichip_impl has the full note); donation
    # never changes numerics, so CPU tests validate the same program.
    _donate = (mesh.devices.flat[0].platform != "cpu"
               or os.environ.get("VFM_VAE_FORCE_DONATE") == "1")

    def _jit_step(fn):
        # jit_train_step also folds the EQ rot90 angle into the compiled
        # program (one variant per (scale, prior) bucket instead of per
        # angle).
        return jit_train_step(fn, out_shardings=_out_sh, donate=_donate)

    # fused_phases: one jitted simultaneous D+G update sharing the generator
    # forward (train_step.fused_step) instead of the sequential [D, G] pair.
    d_step = None if fused_phases else _jit_step(trainer.d_step)
    g_step = _jit_step(trainer.fused_step if fused_phases else trainer.g_step)
    timer = PhaseTimer()

    # Warm-up FSM (reference loss.py:381-492); flag flips recompile the
    # steps (bounded: at most two flips per run).
    from .warmup import WarmupFSM

    warmup_fsm = WarmupFSM(loss)

    # ------------------------------------------------------------ loop
    print0(f"Training for {total_kimg} kimg (resume at {resume_kimg})...")
    cur_nimg = int(resume_kimg * 1000)
    cur_tick = 0
    tick_start_nimg = cur_nimg
    tick_start_time = time.time()
    step_count = 0
    first_batch_saved = False
    # VFM_VAE_SYNC_TIMING=1 restores per-phase device sync (accurate
    # Timing/D vs Timing/G split, at the cost of serializing dispatch);
    # default timing is dispatch wall only — sec/kimg stays authoritative
    # because the tick boundary syncs.
    _sync_timing = os.environ.get("VFM_VAE_SYNC_TIMING") == "1"
    pipeline_depth = int(os.environ.get("VFM_VAE_PIPELINE_DEPTH", "4"))
    inflight: list = []
    # Host-side EQ-bucket tally -> stats.jsonl per tick ("EQ/<scale>_<rot>_
    # <prior>": count). Each bucket is a distinct compiled step variant
    # (jit_train_step folds the rot90 angle), so the record shows which of
    # the 7 variants actually fired in a run (reference EQ sampler:
    # ldm_utils.py:491-517).
    eq_counts: Dict[str, int] = {}

    with jax.sharding.set_mesh(mesh):
        while True:
            images, labels = next(data_iter)
            # Transfer the loader's RAW uint8 bytes; the jitted step
            # normalizes on device (train_step._as_unit_float). 4x fewer
            # host->device bytes than shipping fp32 — measured on the
            # remote-tunnel dev host the fp32 transfer alone serialized
            # ~300 ms/step at B8 (the reference converts on host before
            # .to(device), training_loop.py:310-323; this path beats it on
            # any PCIe/DMA-constrained host too).
            real = shard_batch(mesh, np.ascontiguousarray(images))
            if isinstance(labels, np.ndarray):
                real_c = shard_batch(mesh, jnp.asarray(labels))
            elif tokenizer is not None and labels and isinstance(labels[0], str):
                tok = tokenizer(list(labels))
                real_c = {
                    "input_ids": shard_batch(mesh, jnp.asarray(tok["input_ids"])),
                    "attention_mask": shard_batch(mesh, jnp.asarray(tok["attention_mask"])),
                }
            else:
                real_c = None

            if not first_batch_saved and rank == 0:
                save_image_grid(
                    np.asarray(images[:16], np.float32) / 255.0,
                    os.path.join(run_dir, "train_samples", "reals.png"),
                    drange=(0, 1),
                )
                first_batch_saved = True

            host_rng, r1, r2 = jax.random.split(host_rng, 3)
            sync_res = _sync_timing or None
            def _tally_eq(eq):
                if eq_transform.apply:
                    k = f"EQ/{eq[0]}_{eq[1]}_{int(eq[2])}"
                    eq_counts[k] = eq_counts.get(k, 0) + 1

            if fused_phases:
                eq_g = eq_transform(np_rng)
                _tally_eq(eq_g)
                with timer.phase("Timing/G") as ph:
                    state, g_stats, g_total = g_step(state, real, real_c, r2, eq_g)
                    if sync_res:
                        ph(g_total)
                d_stats = {}
            else:
                eq_d = eq_transform(np_rng)
                _tally_eq(eq_d)
                with timer.phase("Timing/D") as ph:
                    state, d_stats, d_total = d_step(state, real, real_c, r1, eq_d)
                    if sync_res:
                        ph(d_total)
                eq_g = eq_transform(np_rng)
                _tally_eq(eq_g)
                with timer.phase("Timing/G") as ph:
                    state, g_stats, g_total = g_step(state, real, real_c, r2, eq_g)
                    if sync_res:
                        ph(g_total)

            # No per-step device sync (reference pattern: CUDA events synced
            # only at tick, training_loop.py:630-635): the host runs ahead so
            # dispatch latency overlaps device compute. A depth-K pipeline of
            # step totals bounds the run-ahead and forces a real host read of
            # step i-K while step i executes (the axon tunnel does not
            # guarantee execution on block_until_ready alone).
            inflight.append(g_total)
            if len(inflight) > pipeline_depth:
                float(inflight.pop(0))

            if warmup_fsm.active:
                # Host sync only while a warm-up is pending.
                pix = g_stats.get("Loss/G/l1_pixel_loss", g_stats.get("Loss/G/l2_pixel_loss"))
                dgan = g_stats.get("Loss/G/stylegan_t/loss")
                pix_v = float(pix[1] / max(pix[0], 1)) if pix is not None else 0.0
                d_v = float(dgan[1] / max(dgan[0], 1)) if dgan is not None else 0.0
                if warmup_fsm.update(pix_v, d_v, cur_nimg / 1000):
                    d_step = None if fused_phases else _jit_step(trainer.d_step)
                    g_step = _jit_step(
                        trainer.fused_step if fused_phases else trainer.g_step
                    )
            step_count += 1
            # images is this process's slice; kimg accounting is global.
            cur_nimg += images.shape[0] * num_processes

            done = cur_nimg >= total_kimg * 1000 or (
                max_steps is not None and step_count >= max_steps
            )
            if abort_fn is not None and abort_fn():
                done = True

            if (cur_nimg < tick_start_nimg + kimg_per_tick * 1000) and not done:
                continue

            # ---- tick maintenance ----
            # device_get on the newest step's stats forces completion of
            # every step dispatched this tick (per-device program order), so
            # sec/tick below reflects real device time, not dispatch time.
            collector.update(jax.device_get(d_stats))
            collector.update(jax.device_get(g_stats))
            inflight.clear()
            tick_time = time.time() - tick_start_time
            total_time = time.time() - start_time
            fields = [
                f"tick {cur_tick:<5d}",
                f"kimg {cur_nimg / 1000:<8.1f}",
                f"time {format_time(total_time):<12s}",
                f"sec/tick {tick_time:<7.1f}",
                f"sec/kimg {tick_time / max((cur_nimg - tick_start_nimg) / 1000, 1e-8):<7.2f}",
            ]
            for name in ("Loss/G/l1_pixel_loss", "Loss/G/vf_loss", "Loss/D/stylegan_t/loss"):
                if name in collector.names():
                    fields.append(f"{name.split('/')[-1]} {collector.mean(name):.4f}")
            print0(" | ".join(fields))

            if stats_file is not None:
                entry = {
                    "Progress/tick": cur_tick,
                    "Progress/kimg": cur_nimg / 1000,
                    "Timing/total_sec": total_time,
                    "Timing/sec_per_tick": tick_time,
                    "Timing/sec_per_kimg": tick_time
                    / max((cur_nimg - tick_start_nimg) / 1000, 1e-8),
                    "Timing/D": timer.mean("Timing/D"),
                    "Timing/G": timer.mean("Timing/G"),
                    "timestamp": time.time(),
                }
                entry.update(device_memory_stats())
                entry.update(host_memory_stats())
                if eq_counts:
                    entry.update(eq_counts)
                    eq_counts.clear()
                timer.reset()
                entry.update(
                    {name: collector.mean(name) for name in collector.names()}
                )
                stats_file.write(json.dumps(entry) + "\n")
                stats_file.flush()
                wandb_sink.log(entry, step=int(cur_nimg / 1e3))
            collector.reset()

            snap_path = None
            if network_snapshot_ticks and (
                cur_tick % network_snapshot_ticks == 0 or done
            ):
                import flax.serialization

                snap_state = state
                if num_processes > 1:
                    # ZeRO-1 moments are sharded across HOSTS on the global
                    # mesh; all-gather them to the replicated layout so rank
                    # 0 holds every byte (all processes must execute this
                    # jit — SPMD). Reference rank-0 save: training_loop.py.
                    snap_state = jax.jit(
                        lambda s: s, out_shardings=replicated(mesh)
                    )(state)
                # Orbax save is itself a COLLECTIVE under jax.distributed
                # (sync_global_processes inside AsyncCheckpointer.save): a
                # rank-0-only call leaves rank 0 blocked in an allgather its
                # peers never join (measured: 30 min gloo send timeout).
                # Every process calls; orbax's primary host does the writes
                # — the reference's rank-0 torch.save gate maps to orbax's
                # internal primary_host, not to a caller-side `if rank==0`.
                if rank == 0 or num_processes > 1:
                    sd = flax.serialization.to_state_dict(snap_state)
                    snap_path = save_snapshot(run_dir, cur_nimg // 1000, sd)
                    print0(f"Saved snapshot {snap_path}")
                    # sd references the gathered arrays — dropping only
                    # snap_state would keep the all-gathered ZeRO moments
                    # resident in HBM until the next snapshot tick.
                    del sd
                del snap_state

            # Metric evaluation rides the snapshot cadence (reference:
            # training_loop.py metric block — calc_metric per configured name
            # on the snapshot, report to metric-<name>.jsonl).
            # In-loop extras are single-process only: they run eager/local
            # G.apply on rank 0, which cannot touch globally-sharded arrays
            # under jax.distributed (offline tools are authoritative anyway).
            if num_processes == 1 and rank == 0 and metrics and network_snapshot_ticks and (
                cur_tick % network_snapshot_ticks == 0 or done
            ):
                from ..metrics import metric_main

                for mname in metrics:
                    if not metric_main.is_valid_metric(mname):
                        print0(f"[warn] unknown metric '{mname}'; have "
                               f"{metric_main.list_metrics()}")
                        continue
                    if mname != "recon_suite":
                        # rfid/pr/IS/clip_score need offline detector weights
                        # + a full 50k pass; run via tools/reconstruct.
                        print0(f"[warn] metric '{mname}' is offline-only "
                               f"(tools/reconstruct/evaluate.py); skipped in-loop")
                        continue
                    pairs = []
                    # Small streamed sample — indicative trend only (noisy;
                    # authoritative numbers come from tools/reconstruct over
                    # the full val set). Widen via in_loop_metric_batches.
                    for _ in range(in_loop_metric_batches):
                        m_imgs, m_lbls = next(data_iter)
                        m_real = jnp.asarray(m_imgs, jnp.float32) / 255.0
                        if isinstance(m_lbls, np.ndarray):
                            m_c = jnp.asarray(m_lbls)
                        elif tokenizer is not None and m_lbls and isinstance(m_lbls[0], str):
                            tok = tokenizer(list(m_lbls))
                            m_c = {
                                "input_ids": jnp.asarray(tok["input_ids"]),
                                "attention_mask": jnp.asarray(tok["attention_mask"]),
                            }
                        else:
                            m_c = None
                        out = G.apply(
                            {"params": state.ema_params, "buffers": state.g_bufs},
                            m_real,
                            m_c,
                            rng=jax.random.PRNGKey(0),
                            validation=True,
                            train=False,
                        )
                        pairs.append(
                            (np.asarray(m_real), (np.asarray(out.gen_img) + 1) / 2)
                        )
                    res = metric_main.calc_metric(
                        mname, pairs=pairs,
                        lpips_module=lpips_module, lpips_params=lpips_params,
                    )
                    # Stamp the sample size into the record itself: these
                    # in-loop numbers are a smoke trend over a few streamed
                    # batches, not the offline 50k-image evaluation, and the
                    # jsonl/wandb row should say so without external context.
                    res["results"]["num_val_images"] = int(
                        sum(p[0].shape[0] for p in pairs))
                    metric_main.report_metric(res, run_dir=run_dir, snapshot_pkl=snap_path)
                    wandb_sink.log_metrics(res["results"], step=int(cur_nimg / 1e3))

            if num_processes == 1 and rank == 0 and image_snapshot_ticks and (
                cur_tick % image_snapshot_ticks == 0 or done
            ):
                ema_g = state.ema_params
                # real_c is a dict of token arrays under text conditioning —
                # slice every leaf, not the container.
                c8 = (
                    jax.tree_util.tree_map(lambda x: x[:8], real_c)
                    if real_c is not None else None
                )
                # `real` is the raw uint8 device batch (the loop ships uint8
                # and the train step normalizes in-graph); this eager G.apply
                # path must normalize itself or the VFM preprocess sees
                # inputs ~255x out of range — and `* 2 - 1` would wrap under
                # uint8 arithmetic in the grid. Same contract as
                # train_step._as_unit_float: float inputs are already [0,1].
                r8 = np.asarray(real[:8], np.float32)
                if real.dtype == jnp.uint8:
                    r8 = r8 / 255.0
                out = G.apply(
                    {"params": ema_g, "buffers": state.g_bufs},
                    jnp.asarray(r8),
                    c8,
                    rng=jax.random.PRNGKey(0),
                    validation=True,
                    train=False,
                )
                gen_np = np.asarray(out.gen_img)
                # Free the eval forward's DEVICE buffers now: `out` carries
                # gen_img plus every auxiliary GeneratorOutput field, and a
                # retained reference would hold them in HBM for the next
                # image_snapshot_ticks ticks — co-resident with a training
                # step that already sits at ~15/16 GB at flagship B8.
                del out
                grid = np.concatenate(
                    [r8 * 2 - 1, gen_np], axis=0
                )
                save_image_grid(
                    grid,
                    os.path.join(run_dir, "train_samples", f"val_gens_{cur_nimg // 1000:06d}.png"),
                    drange=(-1, 1),
                    grid_wh=(8, 2),
                )

            cur_tick += 1
            tick_start_nimg = cur_nimg
            tick_start_time = time.time()
            if done:
                break

    if num_processes > 1:
        # Reference's check_ddp_consistency analog (torch_utils/misc.py):
        # every process digests its local copy of the replicated params and
        # the digests are allgathered + compared — a silent pod-level
        # divergence (bad ICI link, non-deterministic op) fails loudly here.
        from ..parallel import check_replica_consistency

        check_replica_consistency(
            {"g_params": state.g_params, "ema": state.ema_params,
             "d_params": state.d_params},
        )
        print0("[multihost] replica consistency OK "
               f"({num_processes} processes)")

    if stats_file is not None:
        stats_file.close()
    # Deterministic loader teardown: close the generator here so worker
    # processes/threads are reaped while the interpreter is fully alive,
    # not during shutdown GC (where mp machinery is already half-gone).
    if hasattr(data_iter, "close"):
        data_iter.close()
    wandb_sink.finish()
    print0(f"Done. Total time: {format_time(time.time() - start_time)}")
    return state
