"""End-to-end `python train.py --config <yaml>` CLI smoke in a subprocess:
YAML load + derivation + run-dir provenance + loop launch + auto-resume —
the full user-facing path the reference drives via torchrun
(/root/reference/train.py:55-207), here on the forced-CPU backend.

Unlike tests/test_loop.py (which calls training_loop() in-process), this
exercises argument forwarding, config dump, the Logger tee, and the
kimg-named auto-resume discovery through the real CLI.
"""

import json
import os
import subprocess
import sys

import pytest
import yaml

pytestmark = pytest.mark.heavy  # e2e CLI subprocess, ~9 min on a fast host

from tests.test_loop import make_cfg, tiny_env  # noqa: F401  (fixture)

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _to_plain(x):
    if isinstance(x, dict):
        return {k: _to_plain(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_to_plain(v) for v in x]
    return x


def _run_cli(cfg_path, max_steps):
    env = dict(os.environ)
    env["VFM_VAE_PLATFORM"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "train.py"),
         "--config", cfg_path, "--max-steps", str(max_steps)],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=1200,
    )


def test_train_cli_end_to_end_and_autoresume(tiny_env, tmp_path):  # noqa: F811
    root, vfm, data, c2t = tiny_env
    cfg = _to_plain(make_cfg(root, vfm, data, c2t))
    cfg["run_dir"] = str(tmp_path / "run")
    cfg["network_snapshot_ticks"] = 1  # snapshot every tick for the resume leg
    cfg["image_snapshot_ticks"] = 1
    cfg_path = str(tmp_path / "tiny_stage.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    proc = _run_cli(cfg_path, max_steps=2)
    assert proc.returncode == 0, proc.stderr[-3000:]
    run = cfg["run_dir"]
    # Provenance + sinks the reference contract requires.
    assert os.path.isfile(os.path.join(run, "training_config.yaml"))
    assert os.path.isfile(os.path.join(run, "log.txt"))
    stats = [json.loads(l) for l in open(os.path.join(run, "stats.jsonl"))]
    assert any("Loss/G/l1_pixel_loss" in l for l in stats)
    snaps = [d for d in os.listdir(run) if d.startswith("network-snapshot-")]
    assert snaps, "CLI run wrote no snapshot"

    # Second invocation must auto-resume from the newest snapshot.
    proc2 = _run_cli(cfg_path, max_steps=1)
    assert proc2.returncode == 0, proc2.stderr[-3000:]
    assert "[auto-resume] found" in (proc2.stdout + proc2.stderr), (
        proc2.stdout[-2000:]
    )
