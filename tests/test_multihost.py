"""Multi-host launch smoke test (VERDICT r2 item 9).

Two REAL OS processes, each owning 4 virtual CPU devices, are stitched
into one 8-device global mesh by ``jax.distributed.initialize`` (gloo
collectives) and run the full runner CLI train path: per-host loader
row-sharding (iterator.py:93-113), global-batch assembly
(parallel/multihost.py), replicated state, host-0-canonical artifacts.

The reference's multi-node branch raises NotImplementedError
(/root/reference/speechain/runner.py:1986) — this path is beyond-parity.

Equivalence: the 2-host run's final parameters must match a single-host
8-device run on the same config/seed. The global batch is a row
permutation of the single-host batch (rank slicing b[start::2]), so the
math agrees up to fp reassociation — asserted at loose tolerance.
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from test_runner import CONFIG_TEMPLATE, make_dataset

pytestmark = pytest.mark.slow

DRIVER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from speechain_tpu import runner
runner.main(sys.argv[1:])
"""


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_host_train_matches_single_host(tmp_path):
    from speechain_tpu import runner
    from speechain_tpu.train.checkpoint import CheckpointManager

    root = make_dataset(str(tmp_path / "data"), n_train=16, n_valid=4,
                        n_test=4)
    cfg_path = str(tmp_path / "exp_cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_TEMPLATE.format(root=root, epochs=2))
    driver = str(tmp_path / "driver.py")
    with open(driver, "w") as f:
        f.write(DRIVER)

    # ---- 2-host run: one subprocess per host -------------------------
    exp_mh = str(tmp_path / "exp_mh")
    port = free_port()
    common = [sys.executable, driver, "--config", cfg_path, "--train",
              "--result_path", exp_mh, "--time_bucket", "1600",
              "--batch_bucket", "4", "--num_workers", "1",
              "--coordinator", f"127.0.0.1:{port}", "--num_hosts", "2"]
    env = {**os.environ, "PYTHONPATH": os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))}
    procs = [subprocess.Popen(common + ["--host_id", str(k)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env)
             for k in (0, 1)]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for k, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host {k} failed:\n{out[-4000:]}"

    # ONE cooperative checkpoint in the canonical dir (the production pod
    # layout: shared fs/GCS); per-host logs live under hosts/h<k>
    assert os.path.exists(os.path.join(exp_mh, "checkpoint"))
    assert os.path.exists(os.path.join(exp_mh, "hosts", "h1", "train.log"))
    assert not os.path.exists(
        os.path.join(exp_mh, "hosts", "h1", "checkpoint"))
    mh_state, mh_meta = CheckpointManager(exp_mh).restore_train_state(None)
    assert mh_meta["epoch"] == 2

    # ---- single-host reference run (in-process, 8 devices) -----------
    exp_1 = str(tmp_path / "exp_1host")
    # batch_bucket 8 = the 2-host runs' GLOBAL row bucket (4 rows/host x 2
    # hosts): both runs then see identical 8-row global batches, and every
    # batch divides the 8-device mesh (padding rows are inert — test_masks)
    args = runner.parse_args(
        ["--config", cfg_path, "--train", "--result_path", exp_1,
         "--time_bucket", "1600", "--batch_bucket", "8",
         "--num_workers", "1"])
    runner.train_main(runner.merge_config(args), args)
    ref_state, _ = CheckpointManager(exp_1).restore_train_state(None)

    for a, b in zip(jax.tree_util.tree_leaves(mh_state["params"]),
                    jax.tree_util.tree_leaves(ref_state["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-2)
