"""Multi-host (pod) launch path: ``jax.distributed`` + per-process data.

The reference's multi-node branch is unimplemented
(``/root/reference/speechain/runner.py:1986`` raises NotImplementedError);
here the TPU story runs chip -> mesh -> pod: each host process owns its
local chips, ``jax.distributed.initialize`` stitches them into one global
device set, and the existing mesh/step machinery (parallel/mesh.py) works
unchanged because jit inputs become *global* jax.Arrays.

Division of labour per host:
- the iterator shards each batch's ROWS over hosts
  (``data_parallel_size=num_hosts, data_parallel_rank=host_id`` —
  iterator.py:93-113, mirroring the reference's per-rank slices
  abs.py:224-240), so every host reads/decodes only its own audio;
- :func:`global_batch` re-assembles the per-host row slices into one
  globally-sharded batch (shape consensus via a tiny allgather, then
  ``jax.make_array_from_process_local_data``);
- train state / rng are computed identically on every host (same seed)
  and promoted to replicated global arrays once via :func:`replicate`;
- step outputs are fully replicated (out_specs P()), so every host can
  read metrics, but only host 0 owns the canonical result dir — the
  runner points other hosts' logs at ``<result_path>/hosts/h<k>``;
- checkpoints are ONE cooperative orbax save into the canonical dir
  (shared fs / GCS on real pods): every process joins the collective
  save, the primary finalizes (train/checkpoint.py multi-host notes).

Launch (one process per host, same command modulo --host_id)::

    python -m speechain_tpu.runner --config ... --train \
        --coordinator 10.0.0.1:8476 --num_hosts 4 --host_id $K

The 2-process CPU smoke test (tests/test_multihost.py) exercises this
end-to-end with gloo collectives on a 2x4-device virtual mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

_initialized = False


def initialize(coordinator: str, num_hosts: int, host_id: int) -> None:
    """``jax.distributed.initialize`` with the runner's flag surface.

    Must run before the backend is touched (first trace/device query).
    Safe to call once per process; subsequent calls are no-ops.
    """
    global _initialized
    if _initialized:
        return
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=int(num_hosts),
                               process_id=int(host_id))
    _initialized = True


def process_count() -> int:
    import jax
    return jax.process_count()


def process_index() -> int:
    import jax
    return jax.process_index()


def is_primary() -> bool:
    return process_index() == 0


def _consensus_shapes(batch: Dict[str, Any]) -> Dict[str, tuple]:
    """Per-leaf elementwise-max shape across hosts.

    Bucketing (collate_speech_text) makes per-host shapes agree almost
    always; they can still differ when rank row-slices straddle a bucket
    edge (host A's longest row rounds up, host B's doesn't). One tiny
    allgather of the concatenated shape vector settles it; padding the
    loser is masked out downstream by the ``*_len`` fields (zero-length
    rows are inert — tests/test_masks.py).
    """
    import numpy as np
    from jax.experimental import multihost_utils

    keys = sorted(k for k, v in batch.items() if hasattr(v, "shape"))
    vec = np.asarray(sum((list(batch[k].shape) for k in keys), []),
                     dtype=np.int64)
    all_vecs = np.asarray(multihost_utils.process_allgather(vec))
    mx = all_vecs.max(axis=0)
    out, i = {}, 0
    for k in keys:
        n = len(batch[k].shape)
        out[k] = tuple(int(x) for x in mx[i:i + n])
        i += n
    return out


def global_batch(batch: Dict[str, Any], mesh) -> Dict[str, Any]:
    """Per-host row-slice dict -> globally data-sharded batch.

    Array leaves of rank>=1 are treated as this host's rows (dim 0) of the
    global batch; scalars (e.g. ``epoch``) replicate. Leaves are first
    padded to the cross-host consensus shape, then assembled with
    ``jax.make_array_from_process_local_data`` so each host's rows land on
    its local devices — no cross-host data movement.
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    if batch and all(isinstance(v, dict) for v in batch.values()):
        return {name: global_batch(sub, mesh) for name, sub in batch.items()}
    shapes = _consensus_shapes(batch)
    out = {}
    for k, v in batch.items():
        if not hasattr(v, "shape") or v.ndim == 0:
            out[k] = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P()), np.asarray(v))
            continue
        v = np.asarray(v)
        target = shapes[k]
        if tuple(v.shape) != target:
            pad = [(0, t - s) for s, t in zip(v.shape, target)]
            v = np.pad(v, pad)
        spec = P(*(("data",) + (None,) * (v.ndim - 1)))
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), v)
    return out


def replicate(tree, mesh):
    """Promote a host-local pytree (identical on every host) to replicated
    global arrays over ``mesh`` — used once for train state and rng."""
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    return multihost_utils.host_local_array_to_global_array(tree, mesh, P())


def fetch(x):
    """Host-readable numpy view of a step output.

    Step outputs are fully replicated (out_specs P()), which every host
    can read directly; assert instead of silently gathering."""
    import numpy as np

    if hasattr(x, "is_fully_replicated") and not x.is_fully_replicated:
        raise ValueError("fetch() expects replicated outputs; got sharding "
                         f"{x.sharding}")
    return np.asarray(x)
