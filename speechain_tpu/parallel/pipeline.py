"""GPipe-style pipeline parallelism over a 'pipe' mesh axis.

The reference framework has no model parallelism at all (its scaling story
is single-node DDP, reference runner.py:221/2014); this module is a
TPU-native extension: a homogeneous stack of layers is split into S
stages, one per device along the 'pipe' mesh axis, and microbatches flow
stage-to-stage via ``lax.ppermute`` (collectives ride the ICI ring). The
schedule is the classic fill-drain (GPipe) loop expressed as a
``lax.scan`` inside ``shard_map``: tick t feeds microbatch t into stage 0
while every other stage processes what it received on tick t-1.

Differentiable end-to-end: the gradient of a ``ppermute`` is the reverse
``ppermute``, so wrapping :func:`pipeline_apply` in a loss and calling
``jax.grad`` yields pipeline-parallel backprop without extra code.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def stack_layer_params(params_list: Sequence[Any]):
    """Stack per-layer param pytrees (identical structure) along a new
    leading 'layer' axis — the layout :func:`pipeline_apply` consumes."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, 0), *params_list)


def pipeline_apply(layer_fn: Callable[[Any, Array], Array],
                   stacked_params: Any,
                   x: Array,
                   mesh: Mesh,
                   *,
                   n_micro: Optional[int] = None,
                   axis: str = "pipe") -> Array:
    """Apply ``L`` stacked layers as an ``S``-stage pipeline.

    Args:
      layer_fn: pure per-layer function ``(params, x) -> x`` (same shapes
        in and out — a residual block).
      stacked_params: param pytree with a leading axis of size ``L``
        (:func:`stack_layer_params`); ``L`` must be divisible by the size
        ``S`` of the ``axis`` dimension of ``mesh``. Each stage runs the
        ``L // S`` consecutive layers it owns.
      x: global batch ``(B, ...)``; split into ``n_micro`` microbatches on
        dim 0 (default: one microbatch per stage).
      mesh: mesh containing ``axis``.

    Returns the globally-assembled output batch ``(B, ...)``.
    """
    S = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    n_micro = n_micro or S
    B = x.shape[0]
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro
    micro = x.reshape(n_micro, mb, *x.shape[1:])

    # stage s owns layers [s*K, (s+1)*K): shard the stacked layer axis
    param_specs = jax.tree_util.tree_map(
        lambda l: P(*((axis,) + (None,) * (l.ndim - 1))), stacked_params)

    def staged(local_params, micro_local):
        # local_params leaves: (K, ...) — this stage's layers
        # micro_local: (n_micro, mb, ...) — full microbatch queue
        # (replicated over 'pipe')
        stage = jax.lax.axis_index(axis)

        def run_stage(params, h):
            def body(h, p):
                return layer_fn(p, h), None
            h, _ = jax.lax.scan(body, h, params)
            return h

        zero = jnp.zeros_like(micro_local[0])
        n_ticks = n_micro + S - 1
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            recv = carry
            # stage 0 ingests microbatch t (zeros once drained)
            feed = jnp.where(t < n_micro,
                             micro_local[jnp.minimum(t, n_micro - 1)], zero)
            h = jnp.where(stage == 0, feed, recv)
            out = run_stage(local_params, h)
            nxt = jax.lax.ppermute(out, axis, perm)
            # the last stage emits microbatch t-(S-1) at tick t
            return nxt, out

        _, outs = jax.lax.scan(tick, zero, jnp.arange(n_ticks))
        # outs: (n_ticks, mb, ...) as produced by THIS stage; only the last
        # stage's outputs from tick S-1 onward are the pipeline's results.
        # ppermute them from stage S-1 to stage 0..: simplest correct
        # assembly — broadcast the last stage's slice to all stages via
        # psum of a masked buffer (tiny vs activations; once per call).
        valid = outs[S - 1:]                          # (n_micro, mb, ...)
        is_last = (stage == S - 1).astype(valid.dtype)
        assembled = jax.lax.psum(valid * is_last, axis)
        return assembled.reshape(B, *x.shape[1:])

    pf = jax.shard_map(staged, mesh=mesh, in_specs=(param_specs, P()),
                       out_specs=P(), check_vma=False)
    return pf(stacked_params, micro)
