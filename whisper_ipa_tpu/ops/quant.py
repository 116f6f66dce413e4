"""Weight-only int8/int4 quantization for memory-bound inference.

Autoregressive decode is HBM-bandwidth-bound: every step re-reads all
decoder weights. Per-output-channel symmetric int8 storage halves weight
bytes (vs bf16; 4x vs f32); group-wise int4 halves them again — the
dequantize (codes -> compute dtype * scale) fuses into the consuming
matmul, so only quantized bytes ever cross HBM.

int8 scheme: for a linear weight w (in, out), scale s[out] =
max|w[:, out]|/127, q = round(w / s) in int8.

int4 scheme: scales are per (input-group, output-channel) — one float32
scale per `group` consecutive input rows (AWQ/GPTQ-style grouping; a
single per-channel scale is too coarse at 4 bits). Codes in [-8, 7] are
nibble-packed two-per-int8 along the input dim (JAX's int4 dtype is not
bit-packed in this build, so packing is done by hand). Optional
stochastic rounding makes the quantizer unbiased: q = floor(w/s + u),
u ~ U[0, 1).

Biases, layer norms, embeddings, and convs stay in float32 (negligible
bytes). models/layers.linear consumes the {"w_q", "w_s"} (int8) and
{"w_q4", "w_s4"} (int4) forms transparently.
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


def pack_int4(q: np.ndarray) -> np.ndarray:
    """(in, out) int8 codes in [-8, 7] -> (in//2, out) nibble-packed int8.

    Row 2i goes to the low nibble, row 2i+1 to the high nibble — the
    layout models/layers._unpack_int4 restores with two shifts.
    """
    assert q.shape[0] % 2 == 0, "input dim must be even to nibble-pack"
    u = q.astype(np.uint8)
    lo = u[0::2] & 0x0F
    hi = (u[1::2] & 0x0F) << 4
    return (lo | hi).view(np.int8)


def quantize_linear_int4(
    p: Dict[str, Any],
    group: int = 64,
    stochastic: bool = False,
    seed: int = 0,
) -> Dict[str, Any]:
    """{"w": (in, out), ...} -> {"w_q4": packed int8, "w_s4": (in/G, out)}."""
    w = np.asarray(p["w"], np.float32)
    n_in, n_out = w.shape
    if n_in % group != 0:
        # fall back to one group per remaining row block; keep it simple by
        # shrinking the group to the largest even divisor
        group = int(np.gcd(n_in, group))
        group = max(group - (group % 2), 2)
    assert group % 2 == 0, "group must be even (nibble packing)"
    wg = w.reshape(n_in // group, group, n_out)
    s = np.max(np.abs(wg), axis=1) / 7.0  # (n_groups, out)
    s = np.where(s == 0.0, 1.0, s).astype(np.float32)
    q = wg / s[:, None, :]
    if stochastic:
        rng = np.random.default_rng(seed)
        q = np.floor(q + rng.random(q.shape, dtype=np.float32))
    else:
        q = np.round(q)
    q = np.clip(q, -8, 7).astype(np.int8).reshape(n_in, n_out)
    out = {k: v for k, v in p.items() if k != "w"}
    out["w_q4"] = jnp.asarray(pack_int4(q))
    out["w_s4"] = jnp.asarray(s)
    return out


def _is_linear(node) -> bool:
    return isinstance(node, dict) and "w" in node and np.ndim(node["w"]) == 2


def quantize_tree(tree, bits: int = 8, group: int = 64,
                  stochastic: bool = False, seed: int = 0):
    """Recursively quantize every 2-D linear weight in a param subtree."""
    if _is_linear(tree):
        if bits == 4:
            return quantize_linear_int4(
                tree, group=group, stochastic=stochastic, seed=seed
            )
        return quantize_linear(tree)
    if isinstance(tree, dict):
        return {
            k: quantize_tree(v, bits, group, stochastic, seed)
            for k, v in tree.items()
        }
    if isinstance(tree, list):
        return [quantize_tree(v, bits, group, stochastic, seed) for v in tree]
    return tree


def quantize_params(params, quantize_encoder: bool = True, bits: int = 8,
                    group: int = 64, stochastic: bool = False,
                    seed: int = 0):
    """Quantize decoder (and optionally encoder) linear weights.

    bits: 8 (per-output-channel scales) or 4 (per-(input-group, channel)
    scales, nibble-packed). Embeddings and conv stems stay full precision:
    the tied embedding also produces the logits, where quantization
    directly moves token choices.
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    out = dict(params)
    dec = dict(params["decoder"])
    dec["blocks"] = [
        quantize_tree(b, bits, group, stochastic, seed)
        for b in dec["blocks"]
    ]
    out["decoder"] = dec
    if quantize_encoder:
        enc = dict(params["encoder"])
        enc["blocks"] = [
            quantize_tree(b, bits, group, stochastic, seed)
            for b in enc["blocks"]
        ]
        out["encoder"] = enc
    return out


def quantized_bytes(params) -> int:
    """Total parameter bytes after quantization (for reporting)."""
    total = 0
    for leaf in jax.tree.leaves(params):
        arr = np.asarray(leaf)
        total += arr.size * arr.dtype.itemsize
    return total
