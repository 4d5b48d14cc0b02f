"""End-to-end rehearsal of tools/import_checkpoint.py as a CLI: a reference
torch snapshot (.pth with G/G_ema state dicts, training_loop.py:781-801
format) -> orbax snapshot -> our Generator decodes identically to the
directly-converted weights. Catches drift between the tool's conversion
arguments and what the parity tests exercise."""

import os
import runpy
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "import_checkpoint.py")


def test_import_checkpoint_cli_roundtrip(tmp_path, monkeypatch):
    import yaml

    from tests.oracle import import_reference, to_nhwc, to_nchw_tensor
    from tests.test_generator_parity import G_KWARGS

    from transformers import SiglipVisionConfig, SiglipVisionModel

    vfm = tmp_path / "siglip2-tiny-patch8-32"
    cfg_hf = SiglipVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=8, num_channels=3,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    SiglipVisionModel(cfg_hf).save_pretrained(vfm)

    ref_gen_mod = import_reference("networks.generator")
    torch.manual_seed(7)
    ref = ref_gen_mod.Generator(vfm_name=str(vfm), train_mode="train_all",
                                **G_KWARGS).eval()

    pth = tmp_path / "network-snapshot-000001.pth"
    torch.save({"G": ref.state_dict(), "G_ema": ref.state_dict()}, pth)

    cfg = {"G_kwargs": dict(G_KWARGS, vfm_name=str(vfm),
                            class_name="networks.generator.Generator")}
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg, default_flow_style=False))

    out = tmp_path / "imported"
    monkeypatch.setattr(sys, "argv", [
        "import_checkpoint.py", "--pth", str(pth), "--config", str(cfg_path),
        "--out", str(out), "--kimg", "1",
    ])
    runpy.run_path(TOOL, run_name="__main__")

    from vfm_vae_tpu.models.generator import Generator
    from vfm_vae_tpu.train.checkpoint import find_latest_snapshot, load_snapshot

    latest = find_latest_snapshot(str(out))
    assert latest is not None and latest[1] == 1
    snap = load_snapshot(latest[0])
    assert "ema_params" in snap and "g_params" in snap and "g_bufs" in snap

    ours = Generator(vfm_name=str(vfm), **G_KWARGS)
    z = np.random.default_rng(2).standard_normal((2, 4, 4, 8)).astype(np.float32)
    with torch.no_grad():
        img_ref = ref.decode(to_nchw_tensor(z), c=None)
    img = ours.apply(
        {"params": snap["ema_params"], "buffers": snap["g_bufs"]},
        jnp.asarray(z), method=ours.decode,
    )
    np.testing.assert_allclose(np.asarray(img), to_nhwc(img_ref), rtol=1e-3, atol=2e-3)
