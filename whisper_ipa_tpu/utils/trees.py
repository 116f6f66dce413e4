"""Parameter-tree inspection utilities."""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def tree_count(tree) -> int:
    """Total number of scalar elements in a pytree."""
    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(tree))


def tree_bytes(tree) -> int:
    """Total bytes across leaves (by dtype itemsize)."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        arr = np.asarray(leaf) if not hasattr(leaf, "dtype") else leaf
        total += int(np.prod(np.shape(arr))) * arr.dtype.itemsize
    return total


def tree_summary(tree, max_depth: int = 2) -> Dict[str, int]:
    """Per-subtree element counts down to max_depth (debugging aid)."""
    out: Dict[str, int] = {}

    def walk(node, prefix, depth):
        if depth >= max_depth or not isinstance(node, dict):
            out[prefix or "/"] = tree_count(node)
            return
        for key, value in node.items():
            walk(value, f"{prefix}.{key}" if prefix else key, depth + 1)

    walk(tree, "", 0)
    return out
