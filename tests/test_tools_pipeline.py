"""Tools-level contracts: safetensors latent shard format, the DiT trainer's
shard reader, label json emission, and snapshot import/export structure."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # CLI subprocess pipeline, minutes per test

safetensors = pytest.importorskip("safetensors.numpy")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_latent_shards(d, n=40, c=8, hw=4, moments=False, vfm_features=False):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    ch = 2 * c if moments else c
    lat = rng.standard_normal((n, ch, hw, hw)).astype(np.float32)
    if moments:
        lat[:, c:] = np.abs(lat[:, c:])  # std half positive
    payload = {
        "latents": lat,
        "latents_flip": lat[:, :, :, ::-1].copy(),
        "labels": rng.integers(0, 10, n).astype(np.int64),
    }
    if vfm_features:
        payload["vfm_features"] = rng.standard_normal((n, hw * hw, 16)).astype(np.float16)
    save_file(payload, os.path.join(d, "latents_rank00_shard000.safetensors"))
    mean = lat.mean(axis=(0, 2, 3), keepdims=True)
    std = lat.std(axis=(0, 2, 3), keepdims=True)
    np.savez(os.path.join(d, "latents_stats.npz"), mean=mean, std=std)


def test_latent_batches_reader(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools", "preprocess_for_lightningdit"))
    import importlib

    train_mod = importlib.import_module("train")
    make_latent_shards(str(tmp_path))
    it = train_mod.latent_batches(str(tmp_path), 8, np.random.default_rng(0))
    x, y = next(it)
    assert x.shape == (8, 4, 4, 8)  # NHWC
    assert y.shape == (8,)
    # infinite stream
    for _ in range(10):
        x, y = next(it)
    assert np.isfinite(x).all()


def test_moment_batches_reader(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools", "preprocess_for_reg"))
    import importlib

    reg_train = importlib.import_module("train") if "train" in sys.modules else None
    # import by path to avoid name collision with the lightningdit train module
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "reg_train", os.path.join(REPO, "tools", "preprocess_for_reg", "train.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    make_latent_shards(str(tmp_path), moments=True)
    it = mod.moment_batches(str(tmp_path), 8, np.random.default_rng(0))
    x, y, feats = next(it)
    assert x.shape == (8, 4, 4, 16)  # mean || std channels-last
    assert feats is None  # no vfm_features key in these shards


def test_moment_batches_reader_repa(tmp_path):
    """Shards carrying vfm_features yield fp32 REPA targets alongside."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "reg_train2", os.path.join(REPO, "tools", "preprocess_for_reg", "train.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    make_latent_shards(str(tmp_path), moments=True, vfm_features=True)
    it = mod.moment_batches(str(tmp_path), 8, np.random.default_rng(0))
    x, y, feats = next(it)
    assert feats.shape == (8, 16, 16) and feats.dtype == np.float32


def test_decode_labels_tool(tmp_path):
    make_latent_shards(str(tmp_path))
    out = tmp_path / "labels.json"
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "decode", "decode_latents_to_labels.py"),
            "--latents", str(tmp_path), "--out", str(out),
        ],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    mapping = json.loads(out.read_text())
    assert len(mapping) == 40
    assert "00_00000000.png" in mapping


def test_dit_block_feature_extraction_cli(tmp_path):
    """evaluate_alignment dit mode end-to-end: noised stored latents ->
    per-tap token-mean feature files metrics.py can pair (the reference's
    diffusions/ extractor family, SURVEY §2.7)."""
    import yaml

    make_latent_shards(str(tmp_path))
    cfg = {
        "model": {"model_type": "LightningDiT-T/1", "in_chans": 8},
        "data": {"image_size": 64, "num_classes": 10, "latent_norm": True},
        "vae": {"downsample_ratio": 16},
    }
    cfg_path = tmp_path / "dit.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    # Tiny snapshot in the trainer's on-disk format.
    sys.path.insert(0, os.path.join(REPO, "tools", "preprocess_for_lightningdit"))
    try:
        from sample import build_dit
    finally:
        sys.path.pop(0)
    import jax
    import jax.numpy as jnp

    from vfm_vae_tpu.train.checkpoint import save_snapshot

    model, input_size, in_chans, _ = build_dit(cfg)
    assert (input_size, in_chans) == (4, 8)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)), jnp.zeros((1,)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    snap_path = save_snapshot(str(tmp_path), 0, {"params": params})

    out_prefix = str(tmp_path / "feats")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "evaluate_alignment", "extract_features.py"),
            "dit", "--config", str(cfg_path), "--snapshot", snap_path,
            "--latents", str(tmp_path), "--out", out_prefix,
            "--timestep", "0.5", "--num", "12", "--batch", "6",
        ],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "VFM_VAE_PLATFORM": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for tap in ("embedder", "block_0", "block_1", "final_layer"):
        d = np.load(f"{out_prefix}_{tap}_t0.500.npz")
        assert d["features"].shape[0] == 12
        assert list(d["names"][:1]) == ["image_000000"]
        assert np.isfinite(d["features"]).all()

    # The taps pair through metrics.py (CKNNA between two feature files).
    r2 = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "evaluate_alignment", "metrics.py"),
            "--a", f"{out_prefix}_block_0_t0.500.npz",
            "--b", f"{out_prefix}_block_1_t0.500.npz",
            "--topk", "3",
        ],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "VFM_VAE_PLATFORM": "cpu"},
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "CKNNA" in r2.stdout


@pytest.fixture(scope="module")
def gen_env(tmp_path_factory):
    """Tiny generator environment shared by the tool-CLI tests: a tiny VFM
    checkpoint, WDS tars, a trainer-schema YAML, and an orbax snapshot with
    the generator's init params in the trainer's key layout."""
    import yaml

    pytest.importorskip("transformers")
    import torch
    from transformers import SiglipVisionConfig, SiglipVisionModel

    from tests.test_data import make_shards, write_c2t
    from tests.test_loop import make_cfg

    root = tmp_path_factory.mktemp("toolcli")
    vfm = root / "siglip2-tiny-patch8-32"
    torch.manual_seed(0)
    SiglipVisionModel(SiglipVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=8, num_channels=3,
    )).save_pretrained(vfm)
    data = root / "shards"
    data.mkdir()
    make_shards(data, n_shards=1, per_shard=8, size=40)
    cfg = make_cfg(root, str(vfm), str(data), write_c2t(root))
    cfg_path = root / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    import jax
    import jax.numpy as jnp

    from vfm_vae_tpu.core.config import derive_config, load_config
    from vfm_vae_tpu.core.registry import get_class_by_name
    from vfm_vae_tpu.train.checkpoint import save_snapshot

    c = derive_config(load_config(str(cfg_path)))
    gk = {k: v for k, v in c["G_kwargs"].items() if k != "class_name"}
    G = get_class_by_name("networks.generator.Generator")(**gk)
    res = G.img_resolution
    variables = jax.jit(
        lambda r: G.init({"params": r}, jnp.zeros((1, res, res, 3)), train=False)
    )(jax.random.PRNGKey(0))
    snap_path = save_snapshot(str(root / "snap"), 0, {
        "g_params": variables["params"], "g_bufs": variables.get("buffers", {}),
    })
    return {"root": root, "cfg": str(cfg_path), "snap": snap_path,
            "data": str(data), "G": G, "res": res}


def run_tool(*argv, check=True, env=None):
    r = subprocess.run(
        [sys.executable, *argv], capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "VFM_VAE_PLATFORM": "cpu", **(env or {})},
    )
    if check:
        assert r.returncode == 0, (r.stderr[-3000:], r.stdout[-500:])
    return r


def test_prefetch_cli_store_images(gen_env, tmp_path):
    """prefetch.py end-to-end as a CLI: WDS tars -> ADM crop -> encode ->
    safetensors shards + stats, and --store-images dumps the cropped PNGs
    with an ADM dataset json (reference preprocess_for_reg/prefetch.py:264-270)."""
    G, res = gen_env["G"], gen_env["res"]
    out = tmp_path / "latents"
    run_tool(
        os.path.join(REPO, "tools", "preprocess_for_lightningdit", "prefetch.py"),
        "--config", gen_env["cfg"], "--snapshot", gen_env["snap"],
        "--data", gen_env["data"], "--out", str(out),
        "--batch", "4", "--shard-size", "8", "--resolution", str(res),
        "--store-images",
    )

    from safetensors.numpy import load_file

    shard = load_file(str(out / "latents_rank00_shard000.safetensors"))
    zres, zdim = G.z_resolution, G.z_dimension
    assert shard["latents"].shape == (8, zdim, zres, zres)  # stored NCHW
    assert shard["latents_flip"].shape == shard["latents"].shape
    assert shard["labels"].shape == (8,)
    assert np.isfinite(shard["latents"]).all()
    st = np.load(str(out / "latents_stats.npz"))
    assert st["mean"].shape == (1, zdim, 1, 1)

    ds = json.loads((out / "images" / "dataset_rank0.json").read_text())
    assert len(ds["labels"]) == 8
    rel, label = ds["labels"][0]
    png = out / "images" / rel
    assert png.is_file() and int(label) == int(rel.split("/")[0])
    import PIL.Image

    assert PIL.Image.open(png).size == (res, res)


def test_decode_images_and_npz_cli(gen_env, tmp_path):
    """decode_latents_to_images.py + save_images_as_npz.py: stored latent
    shards -> vae.decode PNGs -> ADM-evaluator npz (reference tools/decode/)."""
    G, res = gen_env["G"], gen_env["res"]
    make_latent_shards(str(tmp_path), n=6, c=G.z_dimension, hw=G.z_resolution)
    out = tmp_path / "pngs"
    run_tool(
        os.path.join(REPO, "tools", "decode", "decode_latents_to_images.py"),
        "--config", gen_env["cfg"], "--snapshot", gen_env["snap"],
        "--latents", str(tmp_path), "--out", str(out), "--batch", "3",
    )
    import PIL.Image

    pngs = sorted(out.glob("*.png"))
    assert len(pngs) == 6
    assert PIL.Image.open(pngs[0]).size == (res, res)

    npz = tmp_path / "samples.npz"
    run_tool(
        os.path.join(REPO, "tools", "decode", "save_images_as_npz.py"),
        "--images", str(out), "--out", str(npz), "--max", "5",
    )
    d = np.load(npz)
    assert d["arr_0"].shape == (5, res, res, 3) and d["arr_0"].dtype == np.uint8


def test_reconstruct_evaluate_extract_cli(gen_env, tmp_path):
    """The rFID eval trio (reference tools/reconstruct/): extract.py untars a
    validation set, reconstruct.py pairs inputs/ and outputs/ through the
    generator, evaluate.py reports paired LPIPS/PSNR/SSIM."""
    out_imgs = tmp_path / "val"
    run_tool(
        os.path.join(REPO, "tools", "reconstruct", "extract.py"),
        "--tars", gen_env["data"], "--out", str(out_imgs),
    )
    n_val = len(list(out_imgs.iterdir()))
    assert n_val == 8

    rec = tmp_path / "rec"
    run_tool(
        os.path.join(REPO, "tools", "reconstruct", "reconstruct.py"),
        "--config", gen_env["cfg"], "--snapshot", gen_env["snap"],
        "--data", str(out_imgs), "--out", str(rec), "--batch", "4",
        "--max-images", "6",
    )
    assert len(list((rec / "inputs").glob("*.png"))) == 6
    assert len(list((rec / "outputs").glob("*.png"))) == 6

    r = run_tool(
        os.path.join(REPO, "tools", "reconstruct", "evaluate.py"),
        "--inputs", str(rec / "inputs"), "--outputs", str(rec / "outputs"),
        "--batch", "3",
    )
    assert "psnr" in r.stdout.lower()


def test_tools_sharded_match_single_device(gen_env, tmp_path):
    """The tool layer's mesh-sharded path (parallel/serving.py — the
    reference's torchrun multi-GPU tools, reconstruct.py:116-122,
    decode_latents_to_images.py:49, prefetch.py:148-175) must produce the
    same bytes as the single-device path. Each tool runs twice — capped to
    1 device via VFM_VAE_SERVING_DEVICES, then over all 8 virtual devices
    — and the outputs are compared."""
    import PIL.Image
    from safetensors.numpy import load_file

    G, res = gen_env["G"], gen_env["res"]
    one = {"VFM_VAE_SERVING_DEVICES": "1"}

    # --- reconstruct ---
    val = tmp_path / "val"
    run_tool(os.path.join(REPO, "tools", "reconstruct", "extract.py"),
             "--tars", gen_env["data"], "--out", str(val))
    recs = {}
    for tag, env in (("d1", one), ("d8", None)):
        rec = tmp_path / f"rec_{tag}"
        run_tool(
            os.path.join(REPO, "tools", "reconstruct", "reconstruct.py"),
            "--config", gen_env["cfg"], "--snapshot", gen_env["snap"],
            "--data", str(val), "--out", str(rec), "--batch", "4",
            "--max-images", "6", env=env,
        )
        recs[tag] = rec
    names1 = sorted(p.name for p in (recs["d1"] / "outputs").glob("*.png"))
    names8 = sorted(p.name for p in (recs["d8"] / "outputs").glob("*.png"))
    assert names1 == names8 and len(names1) == 6
    for n in names1:
        a = np.asarray(PIL.Image.open(recs["d1"] / "outputs" / n), np.int16)
        b = np.asarray(PIL.Image.open(recs["d8"] / "outputs" / n), np.int16)
        # uint8 quantization of near-identical floats: allow one LSB for
        # values sitting on a rounding boundary across fusion variants.
        assert np.abs(a - b).max() <= 1, f"{n}: max diff {np.abs(a - b).max()}"

    # --- prefetch (encode hot path) ---
    lats = {}
    for tag, env in (("d1", one), ("d8", None)):
        out = tmp_path / f"lat_{tag}"
        run_tool(
            os.path.join(REPO, "tools", "preprocess_for_lightningdit", "prefetch.py"),
            "--config", gen_env["cfg"], "--snapshot", gen_env["snap"],
            "--data", gen_env["data"], "--out", str(out),
            "--batch", "4", "--shard-size", "8", "--resolution", str(res),
            env=env,
        )
        lats[tag] = load_file(str(out / "latents_rank00_shard000.safetensors"))
    np.testing.assert_array_equal(lats["d1"]["labels"], lats["d8"]["labels"])
    np.testing.assert_allclose(
        lats["d1"]["latents"], lats["d8"]["latents"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        lats["d1"]["latents_flip"], lats["d8"]["latents_flip"],
        rtol=1e-4, atol=1e-5)

    # --- decode (latent shards -> PNGs; ragged tail batch of 3) ---
    make_latent_shards(str(tmp_path), n=6, c=G.z_dimension, hw=G.z_resolution)
    pngs = {}
    for tag, env in (("d1", one), ("d8", None)):
        out = tmp_path / f"png_{tag}"
        run_tool(
            os.path.join(REPO, "tools", "decode", "decode_latents_to_images.py"),
            "--config", gen_env["cfg"], "--snapshot", gen_env["snap"],
            "--latents", str(tmp_path), "--out", str(out), "--batch", "4",
            env=env,
        )
        pngs[tag] = sorted(out.glob("*.png"))
    assert [p.name for p in pngs["d1"]] == [p.name for p in pngs["d8"]]
    for p1, p8 in zip(pngs["d1"], pngs["d8"]):
        a = np.asarray(PIL.Image.open(p1), np.int16)
        b = np.asarray(PIL.Image.open(p8), np.int16)
        assert np.abs(a - b).max() <= 1

    # --- alignment feature extraction (vae mode over the recon inputs) ---
    feats = {}
    for tag, env in (("d1", one), ("d8", None)):
        out = tmp_path / f"feats_{tag}.npz"
        run_tool(
            os.path.join(REPO, "tools", "evaluate_alignment", "extract_features.py"),
            "vae", "--config", gen_env["cfg"], "--snapshot", gen_env["snap"],
            "--images", str(val), "--out", str(out),
            "--resolution", str(res), "--batch", "4", env=env,
        )
        feats[tag] = np.load(str(out))
    np.testing.assert_array_equal(feats["d1"]["names"], feats["d8"]["names"])
    np.testing.assert_allclose(
        feats["d1"]["features"], feats["d8"]["features"], rtol=1e-4, atol=1e-5)


def test_reconstruct_cli_int8(gen_env, tmp_path):
    """--int8 serves the frozen tower in static-scale W8A8 (calibrated on
    the head of the dataset). The reconstructions must stay close to the
    bf16 run — PSNR between the two output sets, not just 'it ran'."""
    out_imgs = tmp_path / "val"
    run_tool(
        os.path.join(REPO, "tools", "reconstruct", "extract.py"),
        "--tars", gen_env["data"], "--out", str(out_imgs),
    )
    recs = {}
    for mode, flags in [("bf16", []), ("int8", ["--int8"])]:
        rec = tmp_path / f"rec_{mode}"
        run_tool(
            os.path.join(REPO, "tools", "reconstruct", "reconstruct.py"),
            "--config", gen_env["cfg"], "--snapshot", gen_env["snap"],
            "--data", str(out_imgs), "--out", str(rec), "--batch", "4",
            "--max-images", "4", *flags,
        )
        import PIL.Image

        recs[mode] = np.stack([
            np.asarray(PIL.Image.open(p), np.float32)
            for p in sorted((rec / "outputs").glob("*.png"))
        ])
    mse = float(np.mean(np.square(recs["bf16"] - recs["int8"])))
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr > 25.0, psnr  # random-weight tiny model; production is ~46dB


def test_fidelity_cli(tmp_path):
    """fidelity.py (native stand-in for the reference's external
    torch-fidelity step, README:341-357): folder-vs-folder FID + IS with the
    streaming InceptionV3 detector."""
    import PIL.Image

    rng = np.random.default_rng(0)
    for d in ("a", "b"):
        (tmp_path / d).mkdir()
        for i in range(6):
            PIL.Image.fromarray(
                rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            ).save(tmp_path / d / f"{i}.png")

    r = run_tool(
        os.path.join(REPO, "tools", "reconstruct", "fidelity.py"),
        "--input1", str(tmp_path / "a"), "--input2", str(tmp_path / "b"),
        "--fid", "--isc", "--batch", "3",
    )
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert set(res) == {"rfid", "is_mean", "is_std"}
    assert np.isfinite(list(res.values())).all()
    assert "random-init" in r.stderr  # no weights -> loud warning


def test_evaluate_npz_cli(tmp_path):
    """evaluate_npz.py (native ADM-evaluator role, reference README:365-376):
    gFID / sFID / IS / Precision / Recall from ADM-style npz batches.
    sample == ref must give FID = sFID = 0 and P = R = 1."""
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (12, 32, 32, 3), dtype=np.uint8)
    np.savez(tmp_path / "samples.npz", arr_0=imgs)
    np.savez(tmp_path / "ref.npz", arr_0=imgs)

    r = run_tool(
        os.path.join(REPO, "tools", "decode", "evaluate_npz.py"),
        "--sample-batch", str(tmp_path / "samples.npz"),
        "--ref-batch", str(tmp_path / "ref.npz"),
        "--batch", "5",
    )
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert set(res) == {"fid", "sfid", "inception_score", "precision",
                        "recall", "n_samples", "n_ref"}
    assert res["n_samples"] == 12 and res["n_ref"] == 12
    assert abs(res["fid"]) < 1e-3 and abs(res["sfid"]) < 1e-3
    assert res["precision"] == 1.0 and res["recall"] == 1.0
    assert np.isfinite(res["inception_score"])
    assert "random-init" in r.stderr  # no weights -> loud warning


def test_alignment_preprocess_cli(tmp_path):
    """evaluate_alignment/preprocess.py: deterministic equivariance records
    + noise sets (reference preprocess.py:39-110)."""
    import PIL.Image

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        PIL.Image.fromarray(
            rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        ).save(src / f"im{i}.png")

    out = tmp_path / "eq"
    run_tool(
        os.path.join(REPO, "tools", "evaluate_alignment", "preprocess.py"),
        "equivariance", "--input-dir", str(src), "--output-dir", str(out),
    )
    rec = json.loads((out / "equivariance_transforms.json").read_text())
    assert len(rec) == 4
    assert all(r["rotation"] in (0, 90, 180, 270) for r in rec.values())

    out2 = tmp_path / "noise"
    run_tool(
        os.path.join(REPO, "tools", "evaluate_alignment", "preprocess.py"),
        "noise", "--input-dir", str(src), "--output-dir", str(out2),
        "--noise-levels", "0.1", "--resolution", "16",
    )
    assert len(list((out2 / "noise_0.100").glob("*.png"))) == 4
    # Determinism: same seed -> byte-identical noise images.
    out3 = tmp_path / "noise2"
    run_tool(
        os.path.join(REPO, "tools", "evaluate_alignment", "preprocess.py"),
        "noise", "--input-dir", str(src), "--output-dir", str(out3),
        "--noise-levels", "0.1", "--resolution", "16",
    )
    a = (out2 / "noise_0.100" / "im0.png").read_bytes()
    b = (out3 / "noise_0.100" / "im0.png").read_bytes()
    assert a == b


def test_lightningdit_sample_cli(gen_env, tmp_path):
    """sample.py end-to-end: tiny DiT snapshot + the tiny VAE snapshot ->
    ODE-euler samples decoded to PNGs (reference
    tools/preprocess_for_lightningdit/sample.py)."""
    import yaml

    G = gen_env["G"]
    cfg = {
        "model": {"model_type": "LightningDiT-T/1", "in_chans": G.z_dimension},
        "data": {"image_size": G.img_resolution, "num_classes": 10,
                 "latent_norm": False},
        "vae": {"downsample_ratio": G.img_resolution // G.z_resolution},
    }
    cfg_path = tmp_path / "dit.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    sys.path.insert(0, os.path.join(REPO, "tools", "preprocess_for_lightningdit"))
    try:
        from sample import build_dit
    finally:
        sys.path.pop(0)
    import jax
    import jax.numpy as jnp

    from vfm_vae_tpu.train.checkpoint import save_snapshot

    model, input_size, in_chans, _ = build_dit(cfg)
    assert (input_size, in_chans) == (G.z_resolution, G.z_dimension)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, input_size, input_size, in_chans)), jnp.zeros((1,)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    dit_snap = save_snapshot(str(tmp_path / "dit_snap"), 0, {"params": params})

    out = tmp_path / "samples"
    run_tool(
        os.path.join(REPO, "tools", "preprocess_for_lightningdit", "sample.py"),
        "--config", str(cfg_path), "--dit-snapshot", dit_snap,
        "--vae-config", gen_env["cfg"], "--vae-snapshot", gen_env["snap"],
        "--out", str(out), "--num", "4", "--batch", "2", "--steps", "2",
        "--mode", "ode",
    )
    import PIL.Image

    pngs = sorted(out.glob("*.png"))
    assert len(pngs) == 4
    assert PIL.Image.open(pngs[0]).size == (G.img_resolution, G.img_resolution)

    # The REG wrapper drives the same sampler in SDE mode (reference
    # preprocess_for_reg/sample.py: SDE with cfg; delegates with --mode sde).
    out2 = tmp_path / "samples_sde"
    run_tool(
        os.path.join(REPO, "tools", "preprocess_for_reg", "sample.py"),
        "--config", str(cfg_path), "--dit-snapshot", dit_snap,
        "--vae-config", gen_env["cfg"], "--vae-snapshot", gen_env["snap"],
        "--out", str(out2), "--num", "2", "--batch", "2", "--steps", "2",
        "--cfg", "2.0",
    )
    assert len(sorted(out2.glob("*.png"))) == 2


def test_reg_block_feature_extraction_cli(tmp_path):
    """evaluate_alignment reg mode: posterior-moment shards + a REPA-enabled
    REG snapshot -> per-block features AND projector_0 (reference
    diffusions/get_block_features_from_reg.py:243-247)."""
    import importlib.util

    import yaml

    make_latent_shards(str(tmp_path), c=4, moments=True)
    cfg = {
        "model": {"in_chans": 4, "latent_size": 4, "hidden_size": 32,
                  "depth": 2, "num_heads": 4, "repa_weight": 0.1,
                  "repa_block": 0, "repa_target_dim": 16},
        "data": {"num_classes": 10},
    }
    cfg_path = tmp_path / "reg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    spec = importlib.util.spec_from_file_location(
        "reg_train3", os.path.join(REPO, "tools", "preprocess_for_reg", "train.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod  # flax dataclass transform resolves __module__
    spec.loader.exec_module(mod)
    import jax
    import jax.numpy as jnp

    from vfm_vae_tpu.train.checkpoint import save_snapshot

    model, projector, input_size, in_chans, repa_weight = mod.build_reg(cfg)
    assert (input_size, in_chans, repa_weight) == (4, 4, 0.1)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 4)), jnp.zeros((1,)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    proj_params = projector.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 32)))["params"]
    snap_path = save_snapshot(
        str(tmp_path), 0, {"params": {"dit": params, "proj": proj_params}}
    )

    out_prefix = str(tmp_path / "regfeats")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "evaluate_alignment", "extract_features.py"),
            "reg", "--config", str(cfg_path), "--snapshot", snap_path,
            "--latents", str(tmp_path), "--out", out_prefix,
            "--timestep", "0.25", "--path-type", "cosine",
            "--num", "10", "--batch", "5",
        ],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "VFM_VAE_PLATFORM": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for tap, dim in (("embedder", 32), ("block_0", 32), ("block_1", 32),
                     ("projector_0", 16), ("final_layer", 4)):
        d = np.load(f"{out_prefix}_{tap}_t0.250.npz")
        assert d["features"].shape == (10, dim), tap
        assert np.isfinite(d["features"]).all()
