"""Per-buffer HBM-traffic attribution from optimized HLO.

Parses the post-optimization HLO text of a compiled jit and models HBM
traffic at the buffer level: every top-level value in the ENTRY computation
is WRITTEN once by its producer and READ once per consumer. Fusion
internals never appear — exactly right, because XLA keeps them in
VMEM/registers. This is the byte-level companion to the device-time view
in tools/profile_attribution.py: time tells you WHERE the step spends, the
buffer table tells you WHICH tensors carry the bytes (saved activations,
optimizer moments, EMA, D-branch features), i.e. what a traffic cut must
target.

Caveats (stated in the report): values consumed by several ops inside one
downstream fusion count once per fusion (XLA re-reads or keeps in VMEM —
proxy may under/over-count a few %); `while`/`conditional` bodies are
counted once, not per trip (the training step has none); aliased outputs
(donation) still pay the write. The aggregate read+write total lands close
to XLA cost_analysis's "bytes accessed" — both are HLO-level proxies of
DRAM traffic.

Reference hot loop being attributed: /root/reference/training/loss.py:523 +
training_loop.py:690-732 (the per-step G/D update all 44M images pay).
"""

from __future__ import annotations

import collections
import re
from typing import Dict, List, Optional, Tuple

_DTYPE_BYTES = {
    "pred": 1, "s4": 0.5, "u4": 0.5, "s8": 1, "u8": 1,
    "f8e4m3fn": 1, "f8e5m2": 1, "f8e4m3b11fnuz": 1, "f8e5m2fnuz": 1,
    "f8e4m3fnuz": 1, "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8, "u64": 8,
    "c64": 8, "c128": 16, "token": 0, "opaque": 0,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
# `%name = <type> opcode(...)` — type is a shape or a (tuple, of, shapes).
_DEF_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%([^\s=]+)\s*=\s*"
    r"((?:\([^=]*?\))|(?:[a-z0-9]+\[[^\]]*\](?:\{[^}]*\})?))\s+"
    r"([a-zA-Z0-9_\-]+)\("
)
_OPNAME_RE = re.compile(r'op_name="([^"]+)"')

# Opcodes that define an alias, not a materialized buffer.
_FREE_OPS = {
    "parameter", "constant", "get-tuple-element", "tuple", "bitcast",
    "bitcast-convert", "after-all", "iota",
}


def shape_bytes(type_str: str) -> float:
    """Total bytes of an HLO type string — a single shape or a tuple."""
    total = 0.0
    for dtype, dims in _SHAPE_RE.findall(type_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def lane_of(op_name: str) -> str:
    """fwd / bwd (cotangent math) / remat (fwd re-run inside the bwd) /
    opt (optimizer + EMA elementwise) — same taxonomy as
    tools/profile_attribution.py."""
    if "rematted_computation" in op_name or "checkpoint" in op_name:
        return "remat"
    low = op_name.lower()
    if "/adam" in low or "/ema" in low or "apply_updates" in low or "/opt" in low:
        return "opt"
    if "transpose(" in op_name or op_name.startswith("transpose"):
        return "bwd"
    return "fwd"


def module_of(op_name: str) -> str:
    """Condensed module path (top 2 levels after the jit scope), numbers
    folded, matching profile_attribution's grouping."""
    m = re.search(r"jit\(\w+\)/([^/]+/[^/]+)", op_name)
    if m:
        return re.sub(r"_\d+", "_N", m.group(1))
    if op_name:
        return re.sub(r"_\d+", "_N", "/".join(op_name.split("/")[-2:]))[:60]
    return "?"


class EntryValue:
    __slots__ = ("name", "bytes", "opcode", "op_name", "reads")

    def __init__(self, name, nbytes, opcode, op_name):
        self.name = name
        self.bytes = nbytes
        self.opcode = opcode
        self.op_name = op_name
        self.reads = 0


def _entry_block(hlo_text: str) -> List[str]:
    lines = hlo_text.splitlines()
    out: List[str] = []
    depth = 0
    in_entry = False
    for ln in lines:
        if ln.startswith("ENTRY "):
            in_entry = True
            depth = 0
        if in_entry:
            out.append(ln)
            depth += ln.count("{") - ln.count("}")
            if depth <= 0 and out and "{" in "".join(out):
                break
    return out


def parse_entry_traffic(hlo_text: str) -> List[EntryValue]:
    """Parse the ENTRY computation into materialized values with read
    counts. Values from _FREE_OPS carry bytes but are marked free
    (opcode recorded) — parameters' READS still count (state streamed
    from HBM) while their definition costs nothing."""
    values: Dict[str, EntryValue] = {}
    order: List[EntryValue] = []
    for ln in _entry_block(hlo_text):
        m = _DEF_RE.match(ln)
        if not m:
            continue
        name, type_str, opcode = m.groups()
        op_name = ""
        om = _OPNAME_RE.search(ln)
        if om:
            op_name = om.group(1)
        v = EntryValue(name, shape_bytes(type_str), opcode, op_name)
        values[name] = v
        order.append(v)
        # Operand list: first (...) group after the opcode.
        rest = ln[m.end():]
        d = 1
        i = 0
        while i < len(rest) and d > 0:
            if rest[i] == "(":
                d += 1
            elif rest[i] == ")":
                d -= 1
            i += 1
        for op in re.findall(r"%([A-Za-z0-9_.\-]+)", rest[: i - 1]):
            if op in values:
                values[op].reads += 1
    return order


def traffic_report(hlo_text: str, top: int = 30) -> dict:
    """Aggregate the ENTRY traffic into the ranked tables the README's
    training dossier quotes. Returns a dict (callers print/JSON it)."""
    vals = parse_entry_traffic(hlo_text)
    total_write = sum(v.bytes for v in vals if v.opcode not in _FREE_OPS)
    total_read = 0.0
    by_module = collections.Counter()
    by_lane = collections.Counter()
    by_class = collections.Counter()
    for v in vals:
        traffic = v.bytes * v.reads  # reads by consumers
        if v.opcode not in _FREE_OPS:
            traffic += v.bytes  # the producing write
        total_read += v.bytes * v.reads
        if traffic == 0:
            continue
        lane = lane_of(v.op_name)
        by_lane[lane] += traffic
        by_module[f"[{lane}] {module_of(v.op_name)}"] += traffic
        by_class[classify(v)] += traffic
    ranked = sorted(
        (v for v in vals if v.bytes * (v.reads + (v.opcode not in _FREE_OPS)) > 0),
        key=lambda v: v.bytes * (v.reads + (v.opcode not in _FREE_OPS)),
        reverse=True,
    )[:top]
    return {
        "total_gb": (total_read + total_write) / 1e9,
        "write_gb": total_write / 1e9,
        "read_gb": total_read / 1e9,
        "by_lane": dict(by_lane),
        "by_class": dict(by_class),
        "by_module": by_module.most_common(top),
        "top_buffers": [
            {
                "name": v.name,
                "mb": round(v.bytes / 1e6, 2),
                "reads": v.reads,
                "writes": int(v.opcode not in _FREE_OPS),
                "traffic_mb": round(
                    v.bytes * (v.reads + (v.opcode not in _FREE_OPS)) / 1e6, 2
                ),
                "opcode": v.opcode,
                "lane": lane_of(v.op_name),
                "op_name": v.op_name[:140],
            }
            for v in ranked
        ],
    }


def classify(v: EntryValue) -> str:
    """Buffer class for the ranked table: what KIND of tensor carries the
    bytes. Parameters (the TrainState stream) split from intermediates."""
    if v.opcode == "parameter":
        return "state-in (params/opt/ema/batch)"
    op = v.op_name
    lane = lane_of(op)
    if lane == "opt":
        return "optimizer/EMA update"
    low = op.lower()
    if lane == "remat":
        return "remat recompute intermediates"
    if lane == "bwd":
        return "gradient/cotangent intermediates"
    if "dino" in low or "discriminator" in low:
        return "D-branch activations"
    if "lpips" in low or "vgg" in low:
        return "LPIPS activations"
    if "vfm" in low or "siglip" in low or "encoder" in low:
        return "frozen-tower activations"
    if "synthesis" in low or "decoder" in low:
        return "decoder activations (saved fwd)"
    return "other fwd activations"


def format_report(rep: dict, wall_ms: Optional[float] = None,
                  hbm_gbps: float = 819.0) -> str:
    out = []
    tot = rep["total_gb"]
    out.append(
        f"HLO entry traffic: {tot:.1f} GB "
        f"(write {rep['write_gb']:.1f} + read {rep['read_gb']:.1f})"
    )
    if wall_ms:
        need_ms = tot / hbm_gbps * 1e3
        out.append(
            f"at {hbm_gbps:.0f} GB/s HBM peak this is {need_ms:.0f} ms of "
            f"pure traffic vs the {wall_ms:.0f} ms measured step "
            f"({100 * need_ms / wall_ms:.0f}% of wall)"
        )
    out.append("\n-- traffic by lane --")
    for k, b in sorted(rep["by_lane"].items(), key=lambda kv: -kv[1]):
        out.append(f"{b / 1e9:8.1f} GB {100 * b / (tot * 1e9):5.1f}%  {k}")
    out.append("\n-- traffic by buffer class --")
    for k, b in sorted(rep["by_class"].items(), key=lambda kv: -kv[1]):
        out.append(f"{b / 1e9:8.1f} GB {100 * b / (tot * 1e9):5.1f}%  {k}")
    out.append("\n-- traffic by module --")
    for k, b in rep["by_module"]:
        out.append(f"{b / 1e9:8.1f} GB {100 * b / (tot * 1e9):5.1f}%  {k}")
    out.append("\n-- top single buffers (write + reads) --")
    for t in rep["top_buffers"]:
        out.append(
            f"{t['traffic_mb']:9.1f} MB  {t['mb']:8.1f} MB "
            f"x({t['writes']}w+{t['reads']}r) "
            f"[{t['lane']}] {t['opcode']:<12s} {t['op_name']}"
        )
    return "\n".join(out)
