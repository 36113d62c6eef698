"""Checkpointing: orbax-backed save/restore of the full train state plus the
reference's best/latest model bookkeeping.

Rebuild of reference semantics (SURVEY §5.4):
- per-epoch ``models/epoch_{n}`` checkpoints with a retention set driven by
  best-model selection and ``last_n`` (monitor.py:929-971);
- ``checkpoint`` = latest full train state (params, optimizer, running
  stats, monitor records, epoch cursor) for --resume (runner.py:1257-1273);
- N-best model averaging (monitor.py:1031-1121) — parameter-space mean of
  the selected epochs' params.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper with reference-style layout under ``exp_dir``:

    exp_dir/
      checkpoint/          latest full train state (resume point)
      models/epoch_{n}/    per-epoch params-only checkpoints
      models/registry.json epoch -> metrics record
    """

    def __init__(self, exp_dir: str, async_save: bool = True):
        self.exp_dir = os.path.abspath(exp_dir)
        self.models_dir = os.path.join(self.exp_dir, "models")
        os.makedirs(self.models_dir, exist_ok=True)
        # async: the disk write runs on orbax's background thread while the
        # NEXT epoch trains; the atomic commit (tmp -> final rename, meta/
        # registry writes) is deferred until the write finishes and runs in
        # _drain() — called before every subsequent save/restore/read and
        # by close(). The host snapshot (jax.device_get) stays synchronous:
        # train-state buffers are donated into the next step, so the writer
        # must never read live device memory.
        self._async = bool(async_save)
        self._ckptr = (ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
                       if self._async else ocp.StandardCheckpointer())
        self._pending = None   # deferred commit closure of the last save

    def _drain(self):
        """Block until the in-flight async save lands, then commit it."""
        if hasattr(self._ckptr, "wait_until_finished"):
            self._ckptr.wait_until_finished()
        if self._pending is not None:
            fn, self._pending = self._pending, None
            fn()

    def close(self):
        """Finalize any in-flight save (call at the end of training)."""
        self._drain()

    def _finish(self, commit):
        """Run ``commit`` now (sync) or defer it behind the async write."""
        if self._async:
            self._pending = commit
        else:
            if hasattr(self._ckptr, "wait_until_finished"):
                self._ckptr.wait_until_finished()
            commit()

    # Multi-host launch (parallel/multihost.py): ONE cooperative checkpoint
    # in the canonical exp_dir (shared fs / GCS on real pods). Every process
    # calls the orbax save (collective: process 0 writes the data since the
    # state is replicated, the rest join its barriers); only the primary
    # performs the surrounding non-collective fs mutations (tmp cleanup,
    # atomic rename, meta/registry writes, pruning), bracketed by process
    # barriers so non-primaries never read a half-committed checkpoint.
    @staticmethod
    def _is_primary() -> bool:
        return jax.process_index() == 0

    @staticmethod
    def _sync(tag: str):
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"ckpt_{tag}")

    def _save(self, path, tree):
        try:
            self._ckptr.save(path, args=ocp.args.StandardSave(tree))
        except (TypeError, AttributeError):
            self._ckptr.save(path, tree)

    def _restore(self, path, template):
        try:
            return self._ckptr.restore(
                path, args=ocp.args.StandardRestore(template))
        except (TypeError, AttributeError):
            return self._ckptr.restore(path, template)

    # ---------------- full-state resume point ---------------------------
    def save_train_state(self, state, extra: Optional[Dict] = None):
        self._drain()
        path = os.path.join(self.exp_dir, "checkpoint")
        tmp = path + ".tmp"
        if self._is_primary() and os.path.exists(tmp):
            shutil.rmtree(tmp)
        self._sync("pre_state")
        self._save(tmp, jax.device_get(state))

        def commit():
            if self._is_primary():
                if os.path.exists(path):
                    shutil.rmtree(path)
                os.rename(tmp, path)
                if extra is not None:
                    with open(os.path.join(self.exp_dir,
                                           "checkpoint_meta.json"),
                              "w") as f:
                        json.dump(extra, f)
            self._sync("commit_state")

        self._finish(commit)

    def restore_train_state(self, template):
        self._drain()
        path = os.path.join(self.exp_dir, "checkpoint")
        state = self._restore(path, template)
        # orbax commits restored arrays to one device; hand back host numpy
        # so the sharded/jitted step can place them on the full mesh freely
        state = jax.tree_util.tree_map(np.asarray, state)
        meta_path = os.path.join(self.exp_dir, "checkpoint_meta.json")
        meta = None
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return state, meta

    def has_checkpoint(self) -> bool:
        self._drain()
        return os.path.exists(os.path.join(self.exp_dir, "checkpoint"))

    # ---------------- per-epoch model snapshots -------------------------
    def save_epoch_model(self, epoch: int, params,
                         mutables: Optional[Dict] = None):
        self._drain()
        path = os.path.join(self.models_dir, f"epoch_{epoch}")
        if self._is_primary() and os.path.exists(path):
            shutil.rmtree(path)
        self._sync(f"pre_epoch{epoch}")
        payload = {"params": jax.device_get(params)}
        if mutables:
            payload.update(jax.device_get(mutables))
        self._save(path, payload)
        self._finish(lambda: self._sync(f"commit_epoch{epoch}"))

    def restore_epoch_model(self, epoch: int, template):
        self._drain()
        path = os.path.join(self.models_dir, f"epoch_{epoch}")
        return self._restore(path, template)

    def prune_epochs(self, keep: List[int]):
        """Delete epoch checkpoints not in ``keep`` (monitor.py:959-971)."""
        self._drain()
        keep_set = {f"epoch_{e}" for e in keep}
        if self._is_primary():
            for name in os.listdir(self.models_dir):
                if name.startswith("epoch_") and name not in keep_set:
                    shutil.rmtree(os.path.join(self.models_dir, name),
                                  ignore_errors=True)
        self._sync("prune")

    def average_models(self, epochs: List[int], template,
                       name: str = "average"):
        """N-best parameter averaging (monitor.py:1031-1121)."""
        assert epochs, "cannot average zero checkpoints"
        acc = None
        for e in epochs:
            payload = self.restore_epoch_model(e, template)
            params = payload["params"]
            if acc is None:
                acc = jax.tree_util.tree_map(
                    lambda x: np.asarray(x, dtype=np.float64), params)
            else:
                acc = jax.tree_util.tree_map(
                    lambda a, x: a + np.asarray(x, dtype=np.float64),
                    acc, params)
        n = float(len(epochs))
        avg = jax.tree_util.tree_map(
            lambda a: (a / n).astype(np.float32), acc)
        path = os.path.join(self.models_dir,
                            f"{len(epochs)}_{name}")
        if self._is_primary() and os.path.exists(path):
            shutil.rmtree(path)
        self._sync("pre_average")
        self._save(path, {"params": avg})
        self._finish(lambda: self._sync("commit_average"))
        return avg


class BestModelTracker:
    """best_model_selection bookkeeping (monitor.py:647-1027): track the top
    N epochs per (metric, mode) rule, decide retention, early stopping."""

    def __init__(self, rules: List, last_n: int = 1,
                 early_stopping_patience: int = 10,
                 early_stopping_threshold: float = 0.0):
        # rule: (metric_name, 'min'|'max', keep_n)
        self.rules = [tuple(r) for r in rules] or [("loss", "min", 5)]
        self.last_n = last_n
        self.records: Dict[int, Dict[str, float]] = {}
        self.patience = early_stopping_patience
        self.threshold = early_stopping_threshold
        self._best_so_far: Optional[float] = None
        self._bad_epochs = 0

    def update(self, epoch: int, metrics: Dict[str, float]) -> Dict:
        self.records[epoch] = dict(metrics)
        keep = set()
        best_per_rule = {}
        for metric, mode, n in self.rules:
            scored = [(ep, rec[metric]) for ep, rec in self.records.items()
                      if metric in rec]
            scored.sort(key=lambda kv: kv[1], reverse=(mode == "max"))
            chosen = [ep for ep, _ in scored[: int(n)]]
            keep.update(chosen)
            if chosen:
                best_per_rule[metric] = chosen
        recent = sorted(self.records)[-self.last_n:]
        keep.update(recent)

        # early stopping on the first rule's metric (monitor.py:973-1027)
        metric, mode, _ = self.rules[0]
        cur = metrics.get(metric)
        stop = False
        if cur is not None:
            improved = (self._best_so_far is None
                        or (mode == "min"
                            and cur < self._best_so_far - self.threshold)
                        or (mode == "max"
                            and cur > self._best_so_far + self.threshold))
            if improved:
                self._best_so_far = cur
                self._bad_epochs = 0
            else:
                self._bad_epochs += 1
                stop = self._bad_epochs >= self.patience
        return dict(keep=sorted(keep), best=best_per_rule,
                    early_stop=stop, bad_epochs=self._bad_epochs)

    def state_dict(self):
        return dict(records=self.records, best_so_far=self._best_so_far,
                    bad_epochs=self._bad_epochs)

    def load_state_dict(self, d):
        self.records = {int(k): v for k, v in d["records"].items()}
        self._best_so_far = d["best_so_far"]
        self._bad_epochs = d["bad_epochs"]
