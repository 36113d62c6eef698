"""Device-mesh parallelism: mesh construction, sharding rules, collectives.

The reference's parallelism story is single-node DDP over NCCL
(runner.py:221,1666 + DistributedDataParallel). The TPU-native design:
one jitted train step under ``jax.shard_map`` over a ``jax.sharding.Mesh``
— gradients/metrics/norm-stats sync with ``psum`` on ICI; no parameter
server, no process groups, no explicit handshake protocols (the reference's
empty-batch / error-skip ``all_gather`` flags disappear because shapes are
static and steps are deterministic).
"""

from speechain_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    train_step_under_mesh,
)
