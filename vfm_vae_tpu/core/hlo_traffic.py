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
    __slots__ = ("name", "bytes", "opcode", "op_name", "reads",
                 "read_bytes", "write_bytes")

    def __init__(self, name, nbytes, opcode, op_name):
        self.name = name
        self.bytes = nbytes
        self.opcode = opcode
        self.op_name = op_name
        self.reads = 0
        self.read_bytes = 0.0
        self.write_bytes = 0.0


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


_CALLS_RE = re.compile(r"calls=%([A-Za-z0-9_.\-]+)")
_COMP_HDR_RE = re.compile(r"^%([A-Za-z0-9_.\-]+)\s*\(")


def _computation_opnames(hlo_text: str) -> Dict[str, str]:
    """comp name -> a representative op_name (the ROOT instruction's, else
    the last metadata seen). Late-created entry fusions often carry no
    metadata themselves; their CALLED computation's root does — without
    this fallback a third of flagship traffic lands in '?'."""
    out: Dict[str, str] = {}
    cur = None
    last = root = ""
    for ln in hlo_text.splitlines():
        m = _COMP_HDR_RE.match(ln)
        if m or ln.startswith("ENTRY "):
            if cur:
                out[cur] = root or last
            cur = m.group(1) if m else None
            last = root = ""
            continue
        if cur:
            om = _OPNAME_RE.search(ln)
            if om:
                last = om.group(1)
                if ln.lstrip().startswith("ROOT "):
                    root = last
    if cur:
        out[cur] = root or last
    return out


# Consumers that are pure aliases: their "read" moves no HBM bytes — the
# real read is charged when the ALIAS value is itself consumed (a
# get-tuple-element's .bytes is the element size, so element-wise tuple
# consumption is priced exactly once).
_ALIAS_CONSUMERS = {"tuple", "bitcast", "bitcast-convert", "get-tuple-element"}
# Consumers that read only a sub-region of their operand (async or not):
# charge the PAYLOAD (their own output), not the whole operand.
_PARTIAL_READERS = {"slice", "slice-start", "dynamic-slice", "dynamic-slice-start"}


def parse_entry_traffic(hlo_text: str) -> List[EntryValue]:
    """Parse the ENTRY computation into materialized values with byte-
    accurate read/write accounting:

      * write_bytes: the value's own materialization. Free for
        _FREE_OPS (parameters, constants, aliases). Async `*-start` ops
        return a tuple EMBEDDING their aliased operand — their write is
        output minus operands (the fresh payload only).
      * read_bytes: charged on the OPERAND when a consumer touches it —
        full operand bytes normally, payload bytes for slices, zero for
        alias consumers (tuple/GTE/bitcast; `-done` ops are GTEs in
        disguise and parse as such).
    """
    values: Dict[str, EntryValue] = {}
    order: List[EntryValue] = []
    comp_names = _computation_opnames(hlo_text)
    for ln in _entry_block(hlo_text):
        m = _DEF_RE.match(ln)
        if not m:
            continue
        name, type_str, opcode = m.groups()
        op_name = ""
        om = _OPNAME_RE.search(ln)
        if om:
            op_name = om.group(1)
        if not op_name:
            cm = _CALLS_RE.search(ln)
            if cm:
                op_name = comp_names.get(cm.group(1), "")
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
        ops = [op for op in re.findall(r"%([A-Za-z0-9_.\-]+)", rest[: i - 1])
               if op in values]
        operand_bytes = sum(values[op].bytes for op in ops)
        # Fresh payload of this op's output (async `-start` tuples embed
        # their aliased operand; subtract it).
        payload = (max(v.bytes - operand_bytes, 0.0)
                   if opcode.endswith("-start") else v.bytes)
        for op in ops:
            src = values[op]
            src.reads += 1
            if opcode in _ALIAS_CONSUMERS or opcode.endswith("-done"):
                pass  # alias — no bytes move here
            elif opcode in _PARTIAL_READERS:
                # reads only the sub-region it emits
                src.read_bytes += payload / max(len(ops), 1)
            else:
                src.read_bytes += src.bytes
        if opcode in _FREE_OPS or opcode.endswith("-done"):
            v.write_bytes = 0.0
        else:
            v.write_bytes = payload
    return order


def traffic_report(hlo_text: str, top: int = 30) -> dict:
    """Aggregate the ENTRY traffic into the ranked tables the README's
    training dossier quotes. Returns a dict (callers print/JSON it)."""
    vals = parse_entry_traffic(hlo_text)
    total_write = sum(v.write_bytes for v in vals)
    total_read = sum(v.read_bytes for v in vals)
    by_module = collections.Counter()
    by_lane = collections.Counter()
    by_class = collections.Counter()
    for v in vals:
        traffic = v.read_bytes + v.write_bytes
        if traffic == 0:
            continue
        lane = lane_of(v.op_name)
        by_lane[lane] += traffic
        by_module[f"[{lane}] {module_of(v.op_name)}"] += traffic
        by_class[classify(v)] += traffic
    # Aggregate identical (size, reads, producer) rows — a decoder block's
    # per-layer saves repeat dozens of times; one row with a count reads
    # better than a wall of clones.
    groups: Dict[tuple, dict] = {}
    for v in vals:
        t = v.read_bytes + v.write_bytes
        if t <= 0:
            continue
        key = (round(v.bytes), v.reads, v.opcode, v.op_name[:140])
        g = groups.setdefault(key, {"count": 0, "traffic": 0.0, "v": v})
        g["count"] += 1
        g["traffic"] += t
    ranked = sorted(groups.values(), key=lambda g: -g["traffic"])[:top]
    return {
        "total_gb": (total_read + total_write) / 1e9,
        "write_gb": total_write / 1e9,
        "read_gb": total_read / 1e9,
        "by_lane": dict(by_lane),
        "by_class": dict(by_class),
        "by_module": by_module.most_common(top),
        "top_buffers": [
            {
                "name": g["v"].name,
                "count": g["count"],
                "mb": round(g["v"].bytes / 1e6, 2),
                "reads": g["v"].reads,
                "writes": int(g["v"].write_bytes > 0),
                "traffic_mb": round(g["traffic"] / 1e6, 2),
                "opcode": g["v"].opcode,
                "lane": lane_of(g["v"].op_name),
                "op_name": g["v"].op_name[:140],
            }
            for g in ranked
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
            f"{t['traffic_mb']:9.1f} MB  {t['count']:3d}x {t['mb']:8.1f} MB "
            f"x({t['writes']}w+{t['reads']}r) "
            f"[{t['lane']}] {t['opcode']:<12s} {t['op_name']}"
        )
    return "\n".join(out)
