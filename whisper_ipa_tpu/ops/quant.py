"""Weight-only int8 quantization for memory-bound inference.

Autoregressive decode is HBM-bandwidth-bound: every step re-reads all
decoder weights. Per-output-channel symmetric int8 storage halves weight
bytes (vs bf16; 4x vs f32) — the dequantize (int8 -> compute dtype * scale)
fuses into the consuming matmul, so only int8 ever crosses HBM.

Scheme: for a linear weight w (in, out), scale s[out] = max|w[:, out]|/127,
q = round(w / s) in int8. Biases, layer norms, embeddings, and convs stay
in float32 (negligible bytes). models/layers.linear consumes the
{"w_q", "w_s"} form transparently.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def quantize_linear(p: Dict[str, Any]) -> Dict[str, Any]:
    """{"w": (in, out), ...} -> {"w_q": int8, "w_s": (out,), ...}."""
    w = np.asarray(p["w"], np.float32)
    s = np.max(np.abs(w), axis=0) / 127.0
    s = np.where(s == 0.0, 1.0, s).astype(np.float32)
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    out = {k: v for k, v in p.items() if k != "w"}
    out["w_q"] = jnp.asarray(q)
    out["w_s"] = jnp.asarray(s)
    return out


def _is_linear(node) -> bool:
    return isinstance(node, dict) and "w" in node and np.ndim(node["w"]) == 2


def quantize_tree(tree):
    """Recursively quantize every 2-D linear weight in a param subtree."""
    if _is_linear(tree):
        return quantize_linear(tree)
    if isinstance(tree, dict):
        return {k: quantize_tree(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [quantize_tree(v) for v in tree]
    return tree


def quantize_params(params, quantize_encoder: bool = True):
    """Quantize decoder (and optionally encoder) linear weights.

    Embeddings and conv stems stay full precision: the tied embedding also
    produces the logits, where quantization directly moves token choices.
    """
    out = dict(params)
    dec = dict(params["decoder"])
    dec["blocks"] = [quantize_tree(b) for b in dec["blocks"]]
    out["decoder"] = dec
    if quantize_encoder:
        enc = dict(params["encoder"])
        enc["blocks"] = [quantize_tree(b) for b in enc["blocks"]]
        out["encoder"] = enc
    return out


def quantized_bytes(params) -> int:
    """Total parameter bytes after quantization (for reporting)."""
    total = 0
    for leaf in jax.tree.leaves(params):
        arr = np.asarray(leaf)
        total += arr.size * arr.dtype.itemsize
    return total
