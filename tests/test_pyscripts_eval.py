"""Smoke tests for the evaluation/metadata pyscripts (reference
recipes/tts/tts_evaluation.py, recipes/tts/spk_sim_evaluation.py,
datasets/meta_post_processor.py)."""

import os

import numpy as np
import pytest

from speechain_tpu.utils.fileio import write_idx2data_file, write_wav


def _tone(freq, sr=16000, dur=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_tts_evaluation_cli(tmp_path):
    from speechain_tpu.pyscripts.tts_evaluation import main

    sr = 16000
    hypo_dir, ref_dir = tmp_path / "hypo", tmp_path / "ref"
    hypo_dir.mkdir(); ref_dir.mkdir()
    idx2hypo, idx2ref = {}, {}
    for i, f in enumerate([220.0, 330.0]):
        hp, rp = str(hypo_dir / f"u{i}.wav"), str(ref_dir / f"u{i}.wav")
        write_wav(hp, _tone(f * 1.02), sr)  # slightly detuned hypo
        write_wav(rp, _tone(f), sr)
        idx2hypo[f"u{i}"], idx2ref[f"u{i}"] = hp, rp
    write_idx2data_file(idx2hypo, str(tmp_path / "idx2hypo_wav"))
    write_idx2data_file(idx2ref, str(tmp_path / "idx2refer_wav"))

    out = tmp_path / "eval"
    main(["--hypo_path", str(tmp_path / "idx2hypo_wav"),
          "--refer_path", str(tmp_path / "idx2refer_wav"),
          "--result_path", str(out), "--topn_num", "2"])
    assert (out / "overall_results.md").exists()
    for m in ["mcd", "msd", "log_f0_rmse"]:
        lines = (out / f"idx2{m}").read_text().strip().splitlines()
        assert len(lines) == 2
        for ln in lines:
            idx, val = ln.split()
            assert float(val) >= 0.0
    # identical tones through the same pipeline -> near-zero MCD
    same = tmp_path / "same"
    main(["--hypo_path", str(tmp_path / "idx2refer_wav"),
          "--refer_path", str(tmp_path / "idx2refer_wav"),
          "--result_path", str(same), "--metric_list", "mcd"])
    vals = [float(l.split()[1]) for l in
            (same / "idx2mcd").read_text().strip().splitlines()]
    assert max(vals) < 1e-3


def test_spk_sim_evaluation_cli_feat_mode(tmp_path):
    from speechain_tpu.pyscripts.spk_sim_evaluation import (
        cosine_similarity, main)

    rng = np.random.default_rng(0)
    h_dir, r_dir = tmp_path / "h", tmp_path / "r"
    h_dir.mkdir(); r_dir.mkdir()
    idx2h, idx2r, expect = {}, {}, {}
    for i in range(3):
        a = rng.normal(size=192).astype(np.float32)
        b = a if i == 0 else rng.normal(size=192).astype(np.float32)
        np.save(h_dir / f"u{i}.npy", a)
        np.save(r_dir / f"u{i}.npy", b)
        idx2h[f"u{i}"] = str(h_dir / f"u{i}.npy")
        idx2r[f"u{i}"] = str(r_dir / f"u{i}.npy")
        expect[f"u{i}"] = cosine_similarity(a, b)
    write_idx2data_file(idx2h, str(tmp_path / "idx2h"))
    write_idx2data_file(idx2r, str(tmp_path / "idx2r"))

    out = tmp_path / "out"
    main(["--hypo_path", str(tmp_path / "idx2h"),
          "--refer_path", str(tmp_path / "idx2r"),
          "--hypo_is_feat", "--refer_is_feat",
          "--result_path", str(out)])
    got = {l.split()[0]: float(l.split()[1]) for l in
           (out / "idx2ecapa_spk_sim").read_text().strip().splitlines()}
    assert got["u0"] == pytest.approx(1.0, abs=1e-3)
    for k, v in expect.items():
        assert got[k] == pytest.approx(v, abs=1e-3)

    with pytest.raises(ValueError):
        main(["--hypo_path", str(tmp_path / "idx2h"),
              "--refer_path", str(tmp_path / "idx2r")])  # no checkpoint


def test_meta_post_processor_merge(tmp_path):
    from speechain_tpu.pyscripts.meta_post_processor import main

    for subset, idxs in [("dev-clean", ["a1", "a2"]),
                         ("dev-other", ["b1"])]:
        d = tmp_path / subset
        d.mkdir()
        write_idx2data_file({i: f"/wav/{i}.flac" for i in idxs},
                            str(d / "idx2wav"))
        write_idx2data_file({i: len(i) * 100 for i in idxs},
                            str(d / "idx2wav_len"))
    # extra file only in one member must NOT propagate
    write_idx2data_file({"a1": "spk0"},
                        str(tmp_path / "dev-clean" / "idx2spk"))

    main(["--src_path", str(tmp_path), "--dataset", "librispeech"])
    merged = tmp_path / "dev"
    lines = (merged / "idx2wav").read_text().strip().splitlines()
    assert sorted(l.split()[0] for l in lines) == ["a1", "a2", "b1"]
    assert (merged / "idx2wav_len").exists()
    assert not (merged / "idx2spk").exists()
    # train-960 members missing -> skipped quietly
    assert not (tmp_path / "train-960").exists()

    main(["--src_path", str(tmp_path),
          "--combine", "tiny=dev-clean,dev-other"])
    assert (tmp_path / "tiny" / "idx2wav").exists()
