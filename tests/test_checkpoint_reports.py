"""Checkpoint manager, best-model tracker, report writers, monitor."""

import os

import jax.numpy as jnp
import numpy as np

from speechain_tpu.train.checkpoint import BestModelTracker, CheckpointManager
from speechain_tpu.train.monitor import TrainValidMonitor
from speechain_tpu.utils.reports import (
    md_table,
    topn_bad_cases,
    write_test_reports,
)


def test_best_model_tracker_selection_and_early_stop():
    tr = BestModelTracker(rules=[("loss", "min", 2)], last_n=1,
                          early_stopping_patience=2)
    d1 = tr.update(1, {"loss": 5.0})
    d2 = tr.update(2, {"loss": 4.0})
    d3 = tr.update(3, {"loss": 4.5})
    # keep: 2 best (epochs 2,3 by loss -> 2 and 1? loss 4.0,4.5 best two)
    assert 2 in d3["keep"] and 3 in d3["keep"]
    assert not d3["early_stop"]
    d4 = tr.update(4, {"loss": 4.6})
    assert d4["early_stop"]  # 2 epochs without improvement


def test_tracker_state_roundtrip():
    tr = BestModelTracker(rules=[("loss", "min", 3)])
    tr.update(1, {"loss": 2.0})
    tr.update(2, {"loss": 1.0})
    sd = tr.state_dict()
    tr2 = BestModelTracker(rules=[("loss", "min", 3)])
    tr2.load_state_dict(sd)
    d = tr2.update(3, {"loss": 1.5})
    assert set(d["keep"]) >= {2, 3}


def test_checkpoint_epoch_models_and_averaging(tmp_path):
    cm = CheckpointManager(str(tmp_path))
    template = {"params": {"w": np.zeros((2, 2), np.float32)}}
    for e, val in [(1, 1.0), (2, 3.0)]:
        cm.save_epoch_model(e, {"w": np.full((2, 2), val, np.float32)})
    avg = cm.average_models([1, 2], template)
    np.testing.assert_allclose(avg["w"], 2.0)
    cm.prune_epochs(keep=[2])
    assert not os.path.exists(os.path.join(cm.models_dir, "epoch_1"))
    assert os.path.exists(os.path.join(cm.models_dir, "epoch_2"))


def test_write_test_reports_with_groups(tmp_path):
    out = str(tmp_path / "rep")
    idx2hypo = {"a": "hello", "b": "worl", "c": "foo"}
    idx2cer = {"a": 0.0, "b": 0.2, "c": 1.0}
    idx2wer = {"a": 0.0, "b": 1.0, "c": 1.0}
    groups = {"speaker": {"a": "spk1", "b": "spk1", "c": "spk2"}}
    write_test_reports(out, idx2hypo=idx2hypo, idx2cer=idx2cer,
                       idx2wer=idx2wer, summary=dict(wer=0.66, cer=0.4),
                       group_info=groups, topn=2)
    md = open(os.path.join(out, "overall_results.md")).read()
    assert "Results by speaker" in md and "spk1" in md
    assert "Top-2 bad cases" in md
    assert open(os.path.join(out, "idx2hypo_text")).read().startswith(
        "a hello")


def test_topn_and_md_table():
    top = topn_bad_cases({"a": 0.1, "b": 0.9, "c": 0.5}, n=2)
    assert [k for k, _ in top] == ["b", "c"]
    t = md_table(["x", "y"], [[1, 2]])
    assert t.splitlines()[2] == "|1|2|"


def test_monitor_epoch_summary(tmp_path):
    mon = TrainValidMonitor(str(tmp_path), report_per_steps=2)
    for i in range(4):
        mon.train_step({"loss": float(i)})
    mon.finish_train_epoch(1)
    mon.valid_step({"loss": 1.5})
    summary = mon.finish_valid_epoch(1)
    assert abs(summary["loss"] - 1.5) < 1e-6
    sd = mon.state_dict()
    assert sd["epoch_records"]["train"]["loss"] == [1.5]  # mean of 0..3
    mon.close()


def test_snapshooter_audio_type(tmp_path):
    # snapshooter.py:405-491 parity: 'audio' snapshots write a listenable
    # wav per step
    import wave as wavemod

    import numpy as np

    from speechain_tpu.train.monitor import SnapShooter

    sh = SnapShooter(str(tmp_path))
    t = np.arange(8000) / 8000.0
    sh.snapshot({"valid_sample": (np.sin(2 * np.pi * 220 * t), 8000)},
                step=3, plot_type="audio")
    sh.wait_empty()
    sh.close()
    p = tmp_path / "figures" / "valid_sample" / "valid_sample_3.wav"
    assert p.exists()
    with wavemod.open(str(p)) as f:
        assert f.getframerate() == 8000
        assert f.getnframes() == 8000


def test_set_random_seeds_controls(monkeypatch):
    import os
    import random

    import numpy as np

    from speechain_tpu.runner import set_random_seeds

    eff = set_random_seeds(123, same_proc_seed=True)
    assert eff == 123
    assert os.environ["PYTHONHASHSEED"] == "123"
    a = random.random(); na = np.random.rand()
    set_random_seeds(123, same_proc_seed=True)
    assert random.random() == a and np.random.rand() == na


def test_async_save_overlaps_and_commits(tmp_path):
    """Async checkpointing: save_train_state returns before the commit
    (tmp dir still uncommitted), a second save drains + commits the first,
    and every read path self-drains — restore always sees the newest
    committed state."""
    from speechain_tpu.train.state import TrainState

    cm = CheckpointManager(str(tmp_path / "exp"), async_save=True)
    mk = lambda v: TrainState(
        step=jnp.asarray(v, jnp.int32),
        params={"w": np.full((4,), float(v), np.float32)},
        opt_state=(), mutables={})

    cm.save_train_state(mk(1), extra={"epoch": 1})
    # commit is deferred: only close()/next-op finalizes the rename
    cm.save_train_state(mk(2), extra={"epoch": 2})  # drains + commits #1
    assert cm.has_checkpoint()                      # drains + commits #2
    state, meta = cm.restore_train_state(mk(0))
    assert meta["epoch"] == 2
    np.testing.assert_allclose(state.params["w"], 2.0)
    cm.close()

    # sync mode still commits inline
    cm2 = CheckpointManager(str(tmp_path / "exp2"), async_save=False)
    cm2.save_train_state(mk(7), extra={"epoch": 7})
    assert os.path.exists(os.path.join(cm2.exp_dir, "checkpoint"))
    state, meta = cm2.restore_train_state(mk(0))
    assert meta["epoch"] == 7 and float(state.params["w"][0]) == 7.0


def test_async_epoch_models_average_prune(tmp_path):
    """Epoch snapshots + N-best averaging + pruning through the async
    checkpointer: each op drains the previous in-flight write."""
    cm = CheckpointManager(str(tmp_path), async_save=True)
    template = {"params": {"w": np.zeros((2, 2), np.float32)}}
    for e, val in [(1, 1.0), (2, 3.0), (3, 5.0)]:
        cm.save_epoch_model(e, {"w": np.full((2, 2), val, np.float32)})
    avg = cm.average_models([1, 3], template)
    np.testing.assert_allclose(avg["w"], 3.0)
    cm.prune_epochs(keep=[2, 3])
    cm.close()
    assert not os.path.exists(os.path.join(cm.models_dir, "epoch_1"))
    got = cm.restore_epoch_model(2, template)
    np.testing.assert_allclose(got["params"]["w"], 3.0)


def test_bad_case_selection_configurable(tmp_path):
    """A custom (metric, mode, N) selection changes which report files are
    written and what they rank by (reference ar_asr.py:330-339 +
    monitor.py:1812-1837 semantics)."""
    from speechain_tpu.utils.reports import write_bad_case_reports

    out = str(tmp_path / "rep")
    idx2hypo = {"a": "hello", "b": "worl", "c": "foo"}
    metrics = dict(wer={"a": 0.0, "b": 1.0, "c": 0.5},
                   text_confid={"a": 0.9, "b": 0.1, "c": 0.4})

    # defaults: wer/max present, text_confid min+max present, cer absent
    written = write_bad_case_reports(out, metrics, idx2hypo)
    names = sorted(os.path.basename(p) for p in written)
    assert "top30_max_wer.md" in names
    assert "top30_min_text_confid.md" in names
    assert not any("cer" in n for n in names)

    # custom: one triple, different N/mode/metric -> different file + order
    written = write_bad_case_reports(
        out, metrics, idx2hypo, selection=[["text_confid", "min", 2]])
    assert [os.path.basename(p) for p in written] == \
        ["top2_min_text_confid.md"]
    body = open(written[0]).read().splitlines()
    rows = [ln for ln in body if ln.startswith("|") and "idx" not in ln
            and "---" not in ln]
    assert rows[0].startswith("|b|") and rows[1].startswith("|c|")
    assert len(rows) == 2

    # a single bare triple is normalized (monitor.py:1443-1446)
    written = write_bad_case_reports(out, metrics, idx2hypo,
                                     selection=["wer", "max", 1])
    assert [os.path.basename(p) for p in written] == ["top1_max_wer.md"]
