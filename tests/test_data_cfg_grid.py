"""The standalone data_cfg yaml grid (recipes/**/data_cfg/*.yaml) and the
machinery it rides on: the runner's --data_cfg replacement flag, speaker-
balanced RandomSpkFeatDataset with per-speaker average embeddings
(reference speech_text.py:529-648), and on-the-fly WORLD pitch extraction
via pitch_conf (reference speech_text.py:93-104,307-313)."""

import glob
import os
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_CFGS = sorted(glob.glob(os.path.join(REPO, "recipes", "**", "data_cfg",
                                          "*.yaml"), recursive=True))


def test_data_cfg_grid_is_complete():
    # one port per reference recipes/**/data_cfg/*.yaml (34 files)
    assert len(DATA_CFGS) == 34


@pytest.mark.parametrize(
    "path", DATA_CFGS,
    ids=[os.path.relpath(p, os.path.join(REPO, "recipes"))
         for p in DATA_CFGS])
def test_data_cfg_parses_and_resolves(path):
    import speechain_tpu.data.dataset   # noqa: F401 (registry population)
    import speechain_tpu.data.iterator  # noqa: F401
    from speechain_tpu.utils.registry import resolve
    from speechain_tpu.utils.yamlref import load_yaml

    cfg = load_yaml(path)
    assert cfg.get("data_cfg"), path
    for name, spec in cfg["data_cfg"].items():
        resolve("iterator." + spec["type"])
        conf = spec["conf"]
        ds_type = conf["dataset_type"]
        cls = resolve("dataset." + ds_type
                      if "." not in ds_type else ds_type)
        ds_conf = conf["dataset_conf"]
        main = ds_conf["main_data"]
        assert main and all(isinstance(v, str) for v in main.values())
        if "random_spk_feat" in ds_type or "RandomSpkFeat" in ds_type:
            assert "spk_feat" in ds_conf, (path, name)
        # every set is a held-out set: no shuffling at test time
        assert spec["conf"].get("shuffle") is False, (path, name)
        assert cls is not None


def test_runner_data_cfg_flag_replaces_block(tmp_path):
    from speechain_tpu.runner import merge_config

    exp = tmp_path / "exp.yaml"
    exp.write_text(
        "data_cfg:\n  train: {type: abs, conf: {}}\n"
        "  test: {type: abs, conf: {}}\n"
        "train_cfg:\n  model: {model_type: lm.LM}\n")
    alt = tmp_path / "alt_data.yaml"
    alt.write_text(
        "root: /somewhere\n"
        "data_cfg:\n  dev-other:\n    type: abs\n    conf:\n"
        "      dataset_type: speech_text\n"
        "      dataset_conf:\n        main_data:\n"
        "          wav: !ref <root>/idx2wav\n")

    def args(**over):
        base = dict(config=str(exp), data_cfg=None, result_path=None,
                    test_model=None)
        base.update(over)
        return types.SimpleNamespace(**base)

    merged = merge_config(args())
    assert set(merged["data_cfg"]) == {"train", "test"}
    merged = merge_config(args(data_cfg=str(alt)))
    assert set(merged["data_cfg"]) == {"dev-other"}
    wav = merged["data_cfg"]["dev-other"]["conf"]["dataset_conf"][
        "main_data"]["wav"]
    assert wav == "/somewhere/idx2wav"


def _spk_feat_tree(root, n_spk=3, per_spk=4, dim=8, with_aver=True):
    os.makedirs(root, exist_ok=True)
    idx2feat, idx2spk, spk2aver = {}, {}, {}
    rng = np.random.RandomState(0)
    for s in range(n_spk):
        spk = f"spk{s}"
        for u in range(per_spk):
            idx = f"{spk}_utt{u}"
            p = os.path.join(root, idx + ".npy")
            np.save(p, rng.randn(dim).astype(np.float32))
            idx2feat[idx] = p
            idx2spk[idx] = spk
        if with_aver:
            p = os.path.join(root, f"aver_{spk}.npy")
            np.save(p, np.full((dim,), float(s), np.float32))
            spk2aver[spk] = p
    def dump(name, d):
        with open(os.path.join(root, name), "w") as f:
            for k, v in d.items():
                f.write(f"{k} {v}\n")
    dump("idx2ecapa_spk_feat", idx2feat)
    dump("idx2spk", idx2spk)
    if with_aver:
        dump("spk2aver_ecapa_spk_feat", spk2aver)
    return os.path.join(root, "idx2ecapa_spk_feat")


def test_random_spk_feat_uses_speaker_average(tmp_path):
    from speechain_tpu.data.dataset import RandomSpkFeatDataset

    feat_file = _spk_feat_tree(str(tmp_path / "ref"))
    ds = RandomSpkFeatDataset(
        main_data={"text": {f"t{i}": "hello" for i in range(9)}},
        spk_feat=feat_file, use_aver_feat=True)
    picked = []
    for i in range(9):
        item = ds[f"t{i}"]
        # per-speaker average embedding is constant per speaker id
        assert item["spk_feat_ids"] == "aver_spk_feat"
        spk = item["spk_ids"]
        assert np.allclose(item["spk_feat"],
                           float(spk.removeprefix("spk")))
        picked.append(spk)
    # frequency balancing at the SPEAKER level: 9 picks over 3 speakers
    # must be exactly 3 each (speech_text.py:605-615)
    counts = {s: picked.count(s) for s in set(picked)}
    assert counts == {"spk0": 3, "spk1": 3, "spk2": 3}


def test_random_spk_feat_per_utterance_without_aver(tmp_path):
    from speechain_tpu.data.dataset import RandomSpkFeatDataset

    feat_file = _spk_feat_tree(str(tmp_path / "ref"), with_aver=False)
    ds = RandomSpkFeatDataset(
        main_data={"text": {"t0": "hi"}}, spk_feat=feat_file,
        use_aver_feat=True)  # aver file absent -> per-utterance embeddings
    item = ds["t0"]
    assert item["spk_feat_ids"].startswith("spk")
    assert item["spk_ids"] == item["spk_feat_ids"].split("_")[0]
    assert item["spk_feat"].shape == (8,)


def test_random_spk_feat_mixup_sorted_ids(tmp_path):
    from speechain_tpu.data.dataset import RandomSpkFeatDataset

    feat_file = _spk_feat_tree(str(tmp_path / "ref"))
    ds = RandomSpkFeatDataset(
        main_data={"text": {"t0": "hi"}}, spk_feat=feat_file,
        use_aver_feat=True, mixup_number=2)
    item = ds["t0"]
    spks = item["spk_ids"].split("+")
    assert len(spks) == 2 and spks == sorted(spks)
    # mixup averages the two speaker-average embeddings
    expect = np.mean([float(s.removeprefix("spk")) for s in spks])
    assert np.allclose(item["spk_feat"], expect)


def _tone_wav(path, sr=16000, f0=220.0, sec=0.5, silent=False):
    from speechain_tpu.utils.fileio import write_wav
    t = np.arange(int(sr * sec)) / sr
    sig = (np.zeros_like(t) if silent
           else 0.6 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    write_wav(path, sig, sr)
    return path


def test_pitch_conf_extracts_on_the_fly(tmp_path):
    from speechain_tpu.data.dataset import SpeechTextDataset

    wav = _tone_wav(str(tmp_path / "a.wav"), f0=220.0)
    ds = SpeechTextDataset(
        main_data={"wav": {"a": wav}, "text": {"a": "x"}},
        sample_rate=16000, pitch_conf={"hop_length": 256,
                                       "f0min": 80, "f0max": 400})
    item = ds["a"]
    pitch = item["pitch"]
    assert pitch.ndim == 1 and len(pitch) > 10
    voiced = pitch[5:-5]
    assert np.abs(np.median(voiced) - 220.0) < 5.0
    # pitch_conf disables the native fast path (it needs the waveform on
    # the Python side)
    assert ds.raw_audio_paths(["a"]) is None


def test_pitch_conf_drops_all_unvoiced(tmp_path):
    from speechain_tpu.data.dataset import SpeechTextDataset

    wav = _tone_wav(str(tmp_path / "s.wav"), silent=True)
    ds = SpeechTextDataset(
        main_data={"wav": {"s": wav}, "text": {"s": "x"}},
        sample_rate=16000, pitch_conf={"hop_length": 256})
    assert ds["s"] is None  # reference drops the utterance (:313)
