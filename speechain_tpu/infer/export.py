"""AOT export of serving executables (jax.export / StableHLO).

Deployment story: compile the serving graph ONCE, ship a portable
artifact, load it on the serving fleet without the model code. Each
export captures the jitted function's StableHLO (with shardings) for one
or more target platforms — ``platforms=("cpu", "tpu")`` lowers a
TPU-servable artifact from any build machine (cross-platform lowering is
shape/dtype-only; no TPU needed to export). The reference has no AOT
path at all — it pickles torch modules and re-traces at load.

Artifacts are self-describing: ``export_serving`` writes ``<name>.shlo``
(the serialized ``jax.export.Exported``) plus a ``manifest.json`` entry
with the call signature. ``load_serving`` returns the deserialized
object; ``.call(*args)`` executes it under jax on the local backend.

Custom pytree containers crossing the boundary (StreamState, PoolState,
PrefixBeamState) are registered for serialization on import.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
from jax import export as jexport

__all__ = ["export_serving", "load_serving", "export_stream_asr",
           "export_asr_decoder", "export_vocoder"]


def _register_states():
    """Idempotently register serving-state NamedTuples for export."""
    from speechain_tpu.infer.beam_search import BeamState
    from speechain_tpu.infer.ctc_prefix_beam import PrefixBeamState
    from speechain_tpu.infer.ctc_scorer import CTCScorerState
    from speechain_tpu.infer.stream_pool import PoolState
    from speechain_tpu.infer.streaming import StreamState
    from speechain_tpu.ops.feat_norm import NormStats
    for cls in (StreamState, PoolState, PrefixBeamState, NormStats,
                BeamState, CTCScorerState):
        try:
            jexport.register_namedtuple_serialization(
                cls, serialized_name=f"speechain_tpu.{cls.__name__}")
        except ValueError:
            pass   # already registered in this process


_register_states()


def export_serving(fn, example_args: Tuple, out_dir: str, name: str,
                   platforms: Optional[Sequence[str]] = None) -> str:
    """Export ``fn(*example_args)`` to ``out_dir/name.shlo`` and record it
    in ``out_dir/manifest.json``. Returns the artifact path."""
    os.makedirs(out_dir, exist_ok=True)
    exp = jexport.export(jax.jit(fn),
                         platforms=tuple(platforms) if platforms else None)(
        *example_args)
    path = os.path.join(out_dir, f"{name}.shlo")
    with open(path, "wb") as f:
        f.write(exp.serialize())
    manifest_path = os.path.join(out_dir, "manifest.json")
    manifest: Dict[str, Any] = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    manifest[name] = dict(
        file=f"{name}.shlo",
        platforms=list(exp.platforms),
        in_avals=[str(a) for a in exp.in_avals],
        out_avals=[str(a) for a in exp.out_avals],
    )
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1)
    return path


def load_serving(path: str):
    """Deserialize an exported artifact; run it with ``.call(*args)``."""
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def export_stream_asr(stream, out_dir: str, batch_size: int = 1,
                      platforms: Optional[Sequence[str]] = None
                      ) -> Dict[str, str]:
    """Export a StreamingASR's three tick executables (start/step/finish).

    Each artifact is ``f(variables, state, chunk, tail_len) ->
    (state, ids, emit)`` — the exact functions the live object jits
    (infer/streaming.py), minus donation (a load-time choice, not part of
    the graph). The serving loader restores ``variables`` from the
    checkpoint and drives reset -> start -> step* -> finish itself;
    ``stream.reset(batch_size)`` documents the state layout in the
    manifest avals.
    """
    import functools

    import jax.numpy as jnp

    state = stream.reset(batch_size)
    chunk = jnp.zeros((batch_size, stream.S), jnp.float32)
    zero = jnp.zeros((), jnp.int32)
    paths = {}
    for mode in ("start", "step", "finish"):
        fn = functools.partial(stream._call, mode=mode)
        paths[mode] = export_serving(
            fn, (stream.exec_variables, state, chunk, zero),
            out_dir, f"stream_{mode}", platforms)
    return paths


def export_asr_decoder(net, variables, feat_shape: Tuple[int, int],
                       out_dir: str,
                       platforms: Optional[Sequence[str]] = None,
                       **decode_kwargs) -> str:
    """Export the one-executable beam-search decoder
    (infer/asr.py::make_asr_decoder) for a fixed (batch, samples) shape."""
    import jax.numpy as jnp

    from speechain_tpu.infer.asr import asr_beam_search
    from speechain_tpu.infer.quantize import dequantize_variables

    def decode(variables, feat, feat_len):
        variables = dequantize_variables(variables)
        return asr_beam_search(net, variables, feat, feat_len,
                               **decode_kwargs)

    B, T = feat_shape
    feat = jnp.zeros((B, T, 1), jnp.float32)
    feat_len = jnp.full((B,), T, jnp.int32)
    return export_serving(decode, (variables, feat, feat_len),
                          out_dir, "asr_decode", platforms)


def export_vocoder(net, variables, n_frames: int, out_dir: str,
                   batch_size: int = 1,
                   platforms: Optional[Sequence[str]] = None) -> str:
    """Export a HiFi-GAN window executable: ``f(variables, mel) -> wave``
    for a fixed (batch, n_frames, n_mels) window — pair with
    infer/streaming_tts.py window sizes for streaming deployment."""
    import jax.numpy as jnp

    mel = jnp.zeros((batch_size, n_frames, net.in_channels), jnp.float32)
    return export_serving(lambda v, m: net.apply(v, m), (variables, mel),
                          out_dir, "vocoder", platforms)
