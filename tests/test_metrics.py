"""Metric-layer tests: FID math, P&R, CKNNA vs reference torch impl, SSIM."""

import numpy as np
import pytest

from tests.oracle import import_reference

torch = pytest.importorskip("torch")


def test_frechet_distance_zero_for_identical():
    from vfm_vae_tpu.metrics.fid import frechet_distance

    rng = np.random.default_rng(0)
    mu = rng.standard_normal(16)
    a = rng.standard_normal((16, 16))
    sigma = a @ a.T + np.eye(16)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_fid_stats_streaming_matches_direct():
    from vfm_vae_tpu.metrics.feature_stats import FeatureStats
    from vfm_vae_tpu.metrics.fid import compute_fid_from_stats, frechet_distance

    rng = np.random.default_rng(1)
    x = rng.standard_normal((500, 8)).astype(np.float32)
    y = (rng.standard_normal((500, 8)) * 1.5 + 0.3).astype(np.float32)
    sa, sb = FeatureStats(capture_mean_cov=True), FeatureStats(capture_mean_cov=True)
    for i in range(0, 500, 64):
        sa.append(x[i : i + 64])
        sb.append(y[i : i + 64])
    fid = compute_fid_from_stats(sa, sb)
    direct = frechet_distance(
        x.mean(0), np.cov(x, rowvar=False, bias=True),
        y.mean(0), np.cov(y, rowvar=False, bias=True),
    )
    np.testing.assert_allclose(fid, direct, rtol=1e-4)


def test_precision_recall_sanity():
    from vfm_vae_tpu.metrics.precision_recall import compute_pr

    rng = np.random.default_rng(2)
    real = rng.standard_normal((300, 8)).astype(np.float32)
    # identical distribution -> high precision+recall
    gen_same = rng.standard_normal((300, 8)).astype(np.float32)
    p, r = compute_pr(real, gen_same)
    assert p > 0.8 and r > 0.8
    # far-away generated -> zero precision
    gen_far = gen_same + 100.0
    p2, r2 = compute_pr(real, gen_far)
    assert p2 < 0.05 and r2 < 0.05


def test_cknna_matches_reference():
    metrics_ref = import_reference("tools.evaluate_alignment.metrics")
    from vfm_vae_tpu.metrics.cknna import cknna

    rng = np.random.default_rng(3)
    a = rng.standard_normal((64, 16)).astype(np.float32)
    b = (a @ rng.standard_normal((16, 16)).astype(np.float32) * 0.5 + 0.1).astype(np.float32)
    ref_val = metrics_ref.AlignmentMetrics.cknna(
        torch.from_numpy(a), torch.from_numpy(b), topk=8
    )
    ours = cknna(a, b, topk=8)
    np.testing.assert_allclose(ours, ref_val, rtol=1e-3, atol=1e-4)


def test_cknna_self_similarity_is_one():
    from vfm_vae_tpu.metrics.cknna import cknna

    a = np.random.default_rng(4).standard_normal((50, 12)).astype(np.float32)
    assert abs(cknna(a, a, topk=5) - 1.0) < 1e-3


def test_psnr_known_value():
    import jax.numpy as jnp

    from vfm_vae_tpu.metrics.recon import psnr

    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 0.1)
    # mse = 0.01 -> psnr = 20 dB for data_range 1
    np.testing.assert_allclose(float(psnr(a, b)[0]), 20.0, rtol=1e-4)


def test_inception_features_shapes():
    import jax
    import jax.numpy as jnp

    from vfm_vae_tpu.metrics.inception import InceptionV3Features

    m = InceptionV3Features()
    x = jnp.asarray(np.random.default_rng(5).random((2, 64, 64, 3)), jnp.float32)
    variables = jax.jit(lambda r: m.init(r, x))(jax.random.PRNGKey(0))
    feats = m.apply(variables, x)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()
    # structural check: converter-compatible param tree
    import flax.traverse_util as tu

    keys = tu.flatten_dict(variables["params"], sep="/")
    assert "Mixed_7c/branch_pool/conv" in keys
    assert "Conv2d_1a_3x3/conv" in keys


def test_inception_score_uniform_is_one():
    from vfm_vae_tpu.metrics.metric_main import calc_metric

    probs = np.full((100, 10), 0.1, np.float32)
    r = calc_metric("inception_score", probs=probs, num_splits=2)
    np.testing.assert_allclose(r["results"]["is_mean"], 1.0, rtol=1e-5)


def test_clip_score_metric():
    from vfm_vae_tpu.metrics.metric_main import calc_metric

    f = np.eye(4, 8, dtype=np.float32)
    r = calc_metric("clip_score", image_features=f, text_features=f)
    np.testing.assert_allclose(r["results"]["clip_score"], 1.0)


def _write_image_folder(root, n, res=32, seed=0):
    import PIL.Image

    rng = np.random.default_rng(seed)
    for i in range(n):
        arr = rng.integers(0, 256, (res, res, 3), dtype=np.uint8)
        PIL.Image.fromarray(arr).save(root / f"img{i:04d}.png")


def test_fid_full_dataset_metric_and_cache(tmp_path):
    """fid50k_full-style dataset metric: real side from an image folder with
    md5 stat caching (reference metric_utils.py:208-240), gen side from
    batches; identical distributions give ~0 FID."""
    from vfm_vae_tpu.metrics.metric_main import calc_metric

    data = tmp_path / "data"
    data.mkdir()
    _write_image_folder(data, 24)

    def detector(imgs):  # tiny deterministic embedding
        x = np.asarray(imgs, np.float32) / 255.0
        return x.reshape(x.shape[0], -1)[:, :16]

    gen = [im for im in _dataset_iter(data)]
    cache = tmp_path / "cache"
    r = calc_metric(
        "fid10k_full", detector_fn=detector, dataset_path=str(data),
        gen_batches=iter(gen), cache_dir=str(cache),
    )
    assert abs(r["results"]["fid10k_full"]) < 1e-4
    cached = list(cache.glob("dataset-stats-*.npz"))
    assert len(cached) == 1
    # second call must hit the cache (delete the folder to prove it)
    r2 = calc_metric(
        "fid10k_full", detector_fn=detector, dataset_path=str(data),
        gen_batches=iter(gen), cache_dir=str(cache),
    )
    assert abs(r2["results"]["fid10k_full"]) < 1e-4


def _dataset_iter(path):
    from vfm_vae_tpu.data.zipfolder import ImageFolderDataset

    ds = ImageFolderDataset(str(path))
    for imgs, _ in ds.batches(8):
        yield imgs


def test_pr50k3_full_metric(tmp_path):
    from vfm_vae_tpu.metrics.metric_main import calc_metric

    data = tmp_path / "data"
    data.mkdir()
    _write_image_folder(data, 20)

    def detector(imgs):
        x = np.asarray(imgs, np.float32) / 255.0
        return x.reshape(x.shape[0], -1)[:, :8]

    r = calc_metric(
        "pr50k3_full", detector_fn=detector, dataset_path=str(data),
        gen_batches=_dataset_iter(data),
    )
    # identical manifolds -> precision == recall == 1
    assert r["results"]["pr50k3_full_precision"] == 1.0
    assert r["results"]["pr50k3_full_recall"] == 1.0


def test_coco_path_discovery(tmp_path, monkeypatch):
    from vfm_vae_tpu.metrics.metric_main import get_coco_path

    direct = tmp_path / "coco_val256.zip"
    direct.write_bytes(b"")
    assert get_coco_path(str(direct)) == str(direct)
    other = tmp_path / "imagenet.zip"
    other.write_bytes(b"")
    assert get_coco_path(str(other)) == str(direct)  # sibling discovery
    monkeypatch.setenv("COCOPATH", str(direct))
    assert get_coco_path("/nonexistent/foo.zip") == str(direct)
    monkeypatch.setenv("COCOPATH", "/nope/bar.zip")
    with pytest.raises(ValueError):
        get_coco_path("/nonexistent/foo.zip")


def test_cs10k_metric():
    from vfm_vae_tpu.metrics.metric_main import calc_metric

    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 255, (4, 8, 8, 3), dtype=np.uint8) for _ in range(2)]
    feats = {}

    def clip_image_fn(batch):
        return np.tile(np.array([[1.0, 0.0]]), (len(batch), 1))

    def clip_text_fn(texts):
        return np.tile(np.array([[1.0, 0.0]]), (len(texts), 1))

    r = calc_metric(
        "cs10k", clip_image_fn=clip_image_fn, clip_text_fn=clip_text_fn,
        gen_batches=iter(imgs), texts=iter(["a"] * 8),
    )
    np.testing.assert_allclose(r["results"]["cs"], 1.0)


def test_ssim_torchmetrics_parity_and_tpu_precision_guard():
    """SSIM matches torchmetrics (the reference's
    StructuralSimilarityIndexMeasure, training/loss.py:152) AND its lowered
    program pins the gaussian filters to HIGHEST precision. The precision
    pin is load-bearing on TPU only (default conv precision rounds to bf16
    and the windowed E[x^2]-E[x]^2 variance cancels catastrophically —
    observed SSIM 3.03 on-chip for images whose true SSIM is 0.856), so a
    CPU value test alone cannot guard it; the lowered-text assertion does.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    from vfm_vae_tpu.train.ssim import ssim

    rng = np.random.default_rng(0)
    a = rng.random((2, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)

    got = float(ssim(jnp.asarray(a), jnp.asarray(b), data_range=1.0))
    assert -1.0 <= got <= 1.0

    try:
        import torch
        from torchmetrics.image import StructuralSimilarityIndexMeasure
    except ImportError:
        torch = None
    if torch is not None:
        tm = StructuralSimilarityIndexMeasure(data_range=1.0)
        want = float(tm(torch.from_numpy(a).permute(0, 3, 1, 2),
                        torch.from_numpy(b).permute(0, 3, 1, 2)))
        np.testing.assert_allclose(got, want, atol=2e-4)

    txt = jax.jit(lambda x, y: ssim(x, y, data_range=1.0)).lower(
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3))
    ).as_text()
    assert "HIGHEST" in txt, "SSIM filters lost their precision pin"
