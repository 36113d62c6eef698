"""Weight-only int8 quantization for serving — beyond-parity.

The decode-time matmuls of a KV-cached beam search are memory-bound: per
step, a handful of (beam, d) activations multiply (d, d)/(d, 4d)/(d, V)
weight matrices streamed from HBM. Storing those weights as int8 with
per-channel scales halves (vs bf16) or quarters (vs f32) the resident
parameter bytes and the weight traffic XLA must schedule; the dequantize
(convert + scale) runs inside the jitted executable where XLA can fuse it
into the consumer.

Design: quantization is a TREE transform, not a module change. A selected
weight leaf ``w`` is replaced by a subtree ``{__wq8__, scale, odtype}``
(symmetric per-out-channel int8: ``scale = max|w| / 127`` along every
axis but the channel axis), and :func:`dequantize_variables` — called at
the TOP of every jitted inference entry point (infer/asr.py,
infer/tts_decoding.py, models/lm decode drivers) — walks any tree and
reconstructs the original dtype, acting as the identity on unquantized
trees. Drivers are therefore quantization-agnostic: the runner decides by
handing them a quantized tree (``infer_cfg: {weight_quant: int8}``).

The channel axis is the LAST axis for kernels (out features — flax Dense
kernels are (in, out)) and the FIRST for embedding tables (per-vocab-row
scales: token embedding magnitudes vary far more across rows than across
dims). Biases, LayerNorm/BatchNorm parameters, and small leaves stay in
float: they are a rounding error of the footprint and quantizing them
costs accuracy for nothing.

The reference has no quantized inference (torch fp32/fp16 only).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp

MARKER = "__wq8__"

#: collections that hold model weights; stats/caches are never quantized
_QUANT_COLLECTIONS = ("params",)


def _is_qnode(node) -> bool:
    return isinstance(node, Mapping) and MARKER in node


def quantize_variables(variables: Mapping[str, Any], *,
                       min_elems: int = 8192) -> Dict[str, Any]:
    """Replace large float weight leaves of ``variables['params']`` with
    symmetric per-channel int8 subtrees. Returns a plain-dict tree of the
    same overall layout; every other collection passes through."""

    def q(path, leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim < 2 or leaf.size < min_elems or \
                not jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf
        last = path[-1]
        name = str(getattr(last, "key", last))
        axis = 0 if "embed" in name.lower() else leaf.ndim - 1
        w = leaf.astype(jnp.float32)
        red = tuple(i for i in range(leaf.ndim) if i != axis)
        scale = jnp.max(jnp.abs(w), axis=red, keepdims=True) / 127.0
        scale = jnp.maximum(scale, 1e-12)
        q8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return {MARKER: q8, "scale": scale,
                # zero-size dtype carrier: records the original dtype in
                # the tree itself so dequantize needs no side channel
                "odtype": jnp.zeros((0,), leaf.dtype)}

    out = {k: dict(v) if isinstance(v, Mapping) else v
           for k, v in variables.items()}
    for coll in _QUANT_COLLECTIONS:
        if coll in out:
            out[coll] = jax.tree_util.tree_map_with_path(q, out[coll])
    return out


def dequantize_variables(tree: Any) -> Any:
    """Reconstruct float weights from int8 subtrees anywhere in ``tree``.
    Identity on unquantized trees; safe to call unconditionally at the top
    of a jitted inference function (traced as convert+multiply, which XLA
    fuses into the consumers)."""
    if _is_qnode(tree):
        w = tree[MARKER].astype(jnp.float32) * tree["scale"]
        return w.astype(tree["odtype"].dtype)
    if isinstance(tree, Mapping):
        return {k: dequantize_variables(v) for k, v in tree.items()}
    return tree


def quantized_bytes(tree: Any) -> Tuple[int, int]:
    """(bytes_now, bytes_if_dequantized) of every array in ``tree`` —
    the serving-footprint report the runner logs."""
    now = deq = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        now += leaf.size * leaf.dtype.itemsize
        deq += leaf.size * leaf.dtype.itemsize
    # correct the dequantized estimate: each q8 leaf would widen
    def walk(node):
        nonlocal deq
        if _is_qnode(node):
            q8 = node[MARKER]
            odt = node["odtype"].dtype.itemsize
            deq += q8.size * (odt - 1)           # int8 -> odtype
            deq -= node["scale"].size * node["scale"].dtype.itemsize
            deq -= node["odtype"].size * node["odtype"].dtype.itemsize
        elif isinstance(node, Mapping):
            for v in node.values():
                walk(v)
    walk(tree)
    return now, deq
