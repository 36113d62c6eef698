import os

import numpy as np
import pytest

from speechain_tpu.utils.yamlref import load_yaml
from speechain_tpu.utils.fileio import (
    read_idx2data_file,
    write_idx2data_file,
    read_wav,
    write_wav,
    read_data_by_path,
)
from speechain_tpu.utils.registry import register, resolve


def test_yaml_ref_basic():
    cfg = load_yaml(
        """
        d_model: 256
        layers: 4
        enc_dim: !ref <d_model>
        name: !ref model_<d_model>x<layers>
        t: !tuple (1, 2, 3)
        l: !list [1, a, 3]
        s: !str 42
        plain: !ref nothing_here
        """
    )
    assert cfg["enc_dim"] == 256 and isinstance(cfg["enc_dim"], int)
    assert cfg["name"] == "model_256x4"
    assert cfg["t"] == (1, 2, 3)
    assert cfg["l"] == [1, "a", 3]
    assert cfg["s"] == "42"
    assert cfg["plain"] == "nothing_here"


def test_yaml_ref_indexing_and_nested():
    cfg = load_yaml(
        """
        dims: [80, 256, 512]
        model:
          input: !ref <dims[0]>
          hidden: !ref <dims[2]>
        """
    )
    assert cfg["model"]["input"] == 80
    assert cfg["model"]["hidden"] == 512


def test_yaml_ref_forward_reference():
    # forward refs to plain values are fine (matches reference semantics) ...
    cfg = load_yaml("a: !ref <b>\nb: 3\n")
    assert cfg["a"] == 3
    # ... but a ref chain must be declared in order
    with pytest.raises((KeyError, ValueError)):
        load_yaml("a: !ref <b>\nb: !ref <c>\nc: 3\n")


def test_idx2data_roundtrip(tmp_path):
    p = str(tmp_path / "idx2text")
    write_idx2data_file({"utt1": "hello world", "utt2": "foo"}, p)
    back = read_idx2data_file(p)
    assert back == {"utt1": "hello world", "utt2": "foo"}
    lens = read_idx2data_file(p)
    assert list(lens) == ["utt1", "utt2"]


def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.linspace(0, 1, sr, endpoint=False)
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, wav, sr)
    back, sr2 = read_wav(p)
    assert sr2 == sr
    assert back.shape == wav.shape
    assert np.max(np.abs(back - wav)) < 1e-3  # 16-bit quantization


def test_read_data_by_path_npz(tmp_path):
    feat = np.random.randn(17, 80).astype(np.float32)
    p = str(tmp_path / "f.npz")
    np.savez(p, feat=feat, sample_rate=16000)
    data, sr = read_data_by_path(p, return_sample_rate=True)
    assert sr == 16000
    np.testing.assert_allclose(data, feat)


def test_registry():
    @register("test.dummy", "dummy.Dummy")
    class Dummy:
        pass

    assert resolve("test.dummy") is Dummy
    assert resolve("dummy.Dummy") is Dummy
    with pytest.raises(KeyError):
        resolve("not.registered.at.all.Nope")


def test_infer_cfg_expansion():
    from speechain_tpu.runner import expand_infer_cfg

    assert expand_infer_cfg({}) == {"": {}}
    flat = expand_infer_cfg({"beam_size": 4})
    assert flat == {"": {"beam_size": 4}}
    prod = expand_infer_cfg({
        "shared_args": {"beam_size": 16},
        "exclu_args": [{"ctc_weight": 0.2}, {"ctc_weight": 0.3}]})
    assert prod["ctc_weight=0.2"]["beam_size"] == 16
    assert len(prod) == 2


def test_dataset_unk_mask_and_g2p_passthrough(tmp_path):
    from speechain_tpu.data.dataset import SpeechTextDataset

    ds = SpeechTextDataset(main_data={"text": {"a": "hello world"}},
                           unk_mask_prob=1.0)
    assert ds["a"]["text"] == "<unk> <unk>"

    lex = tmp_path / "lexicon"
    lex.write_text("hello HH AH0\nworld W ER1 LD\n")
    ds2 = SpeechTextDataset(main_data={"text": {"a": "hello world"}},
                            use_g2p=True, lexicon_path=str(lex))
    assert ds2["a"]["text"] == "['HH', 'AH0', '<space>', 'W', 'ER1', 'LD']"


def test_dataset_silence_trimming():
    import numpy as np
    from speechain_tpu.data.dataset import SpeechTextDataset

    ds = SpeechTextDataset(
        main_data={"text": {"a": "['<space>', 'HH', 'AH0', '<space>']"},
                   "duration": {"a": "10 20 30 40"}},
        remove_sil=True)
    s = ds["a"]
    assert s["text"] == "['HH', 'AH0']"
    assert list(s["duration"]) == [20.0, 30.0]


def test_multi_optimizer_routing():
    """Multiple named optimizers own disjoint updated_modules subsets; each
    parameter updates via exactly one optimizer, unclaimed params freeze
    (optim_sche/abs.py:112-126 + runner.py:741-755 semantics)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from speechain_tpu.train.optim import build_optimizers

    cfg = {
        "enc": {"type": "noam", "conf": {"optim_conf": {"lr": 1e-1},
                "warmup_steps": 1, "updated_modules": ["encoder"]}},
        "dec": {"type": "const", "conf": {"optim_conf": {"lr": 0.0},
                "updated_modules": ["decoder"]}},
    }
    tx = build_optimizers(cfg)
    params = {"encoder": {"w": jnp.ones(3)}, "decoder": {"w": jnp.ones(3)},
              "other": {"w": jnp.ones(3)}}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert abs(float(updates["encoder"]["w"][0])) > 1e-6
    assert float(jnp.abs(updates["decoder"]["w"]).max()) < 1e-12
    assert float(jnp.abs(updates["other"]["w"]).max()) < 1e-12


def test_hdf5_chunk_roundtrip(tmp_path):
    """data_packager --comp_format hdf5 -> chunk_N.hdf5:idx addressing
    (reference data_loading_util.py:56-58)."""
    import numpy as np

    from speechain_tpu.pyscripts.data_packager import main
    from speechain_tpu.utils.fileio import (read_data_by_path,
                                            read_idx2data_file,
                                            write_idx2data_file)

    src = tmp_path / "in"
    src.mkdir()
    idx2feat = {}
    for i in range(5):
        p = str(src / f"u{i}.npy")
        np.save(p, np.full((4, 3), i, np.float32))
        idx2feat[f"u{i}"] = p
    write_idx2data_file(idx2feat, str(tmp_path / "idx2feat"))
    main(["--data_path", str(tmp_path / "idx2feat"),
          "--save_path", str(tmp_path / "out"),
          "--chunk_size", "3", "--comp_format", "hdf5"])
    m = read_idx2data_file(str(tmp_path / "out" / "idx2feat"))
    assert m["u4"].endswith("chunk_1.hdf5:u4")
    for i in range(5):
        d = read_data_by_path(m[f"u{i}"])
        assert d.shape == (4, 3) and (d == i).all()


def test_process_pool_loader_matches_thread_loader(tmp_path):
    """num_worker_procs path must yield identical batch order and content
    to the thread path."""
    import functools
    import wave as wavemod

    import numpy as np

    from speechain_tpu.data.dataset import SpeechTextDataset
    from speechain_tpu.data.iterator import Iterator
    from speechain_tpu.data.loader import EpochLoader, collate_speech_text
    from speechain_tpu.data.tokenizer import CharTokenizer
    from speechain_tpu.utils.fileio import write_idx2data_file

    sr = 8000
    (tmp_path / "wav").mkdir()
    idx2wav, idx2text, idx2len = {}, {}, {}
    for i in range(12):
        p = str(tmp_path / "wav" / f"u{i}.wav")
        sig = (np.sin(np.arange(sr) * (0.01 + 0.001 * i)) * 16000
               ).astype("<i2")
        with wavemod.open(p, "wb") as f:
            f.setnchannels(1); f.setsampwidth(2); f.setframerate(sr)
            f.writeframes(sig.tobytes())
        idx2wav[f"u{i}"], idx2text[f"u{i}"] = p, "ab"
        idx2len[f"u{i}"] = sr
    for name, d in [("idx2wav", idx2wav), ("idx2text", idx2text),
                    ("idx2wav_len", idx2len)]:
        write_idx2data_file(d, str(tmp_path / name))
    (tmp_path / "vocab").write_text(
        "\n".join(["<blank>", "<unk>", "a", "b", "<sos/eos>"]) + "\n")

    tok = CharTokenizer(token_vocab=str(tmp_path / "vocab"))
    ds = SpeechTextDataset(main_data=dict(wav=str(tmp_path / "idx2wav"),
                                          text=str(tmp_path / "idx2text")))
    it = Iterator(dataset=ds, data_len=str(tmp_path / "idx2wav_len"),
                  shuffle=True, batch_size=4)
    collate = functools.partial(collate_speech_text, tokenizer=tok,
                                time_bucket=1600, batch_bucket=4)
    thr = EpochLoader(it, collate, num_workers=2)
    prc = EpochLoader(it, collate, num_worker_procs=2)
    try:
        for ep in (0, 1):
            a, b = list(thr.epoch(ep)), list(prc.epoch(ep))
            assert [x["indices"] for x in a] == [y["indices"] for y in b]
            for x, y in zip(a, b):
                np.testing.assert_array_equal(x["feat"], y["feat"])
                assert x["feat"].dtype == np.int16  # int16 fast path live
        # early-exit consumer against the pool
        g = prc.epoch(2)
        next(g)
        g.close()
    finally:
        prc.close()


def test_data_selection_group_mode(tmp_path):
    # 'group' mode: selection_num is a LIST of metadata values to keep
    # (dataset/abs.py:331-338)
    from speechain_tpu.data.dataset import data_selection
    meta = tmp_path / "idx2spk"
    meta.write_text("a spk1\nb spk2\nc spk1\nd spk3\n")
    out = data_selection(["a", "b", "c", "d"], "group", ["spk1", "spk3"],
                         str(meta))
    assert out == ["a", "c", "d"]
    # numeric group ids survive the float-coercion of the metadata sort
    meta2 = tmp_path / "idx2spk2"
    meta2.write_text("a 103\nb 204\nc 103\n")
    assert data_selection(["a", "b", "c"], "group", [103], str(meta2)) == \
        ["a", "c"]


def test_main_data_and_data_len_accept_lists(tmp_path):
    # multi-corpus merged idx2 files (the reference's librispeech+libritts
    # configs, utilbox/data_loading_util.py:91-180)
    from speechain_tpu.data.dataset import Dataset
    from speechain_tpu.data.iterator import Iterator
    a = tmp_path / "idx2text_a"; a.write_text("u1 hello\nu2 world\n")
    b = tmp_path / "idx2text_b"; b.write_text("u3 foo\n")
    la = tmp_path / "len_a"; la.write_text("u1 5\nu2 5\n")
    lb = tmp_path / "len_b"; lb.write_text("u3 3\n")
    ds = Dataset(main_data={"text": [str(a), str(b)]})
    assert sorted(ds.get_data_index()) == ["u1", "u2", "u3"]
    it = Iterator(dataset=ds, data_len=[str(la), str(lb)], batch_size=2)
    assert sorted(it.data_len) == ["u1", "u2", "u3"]


def test_enable_hardware_rng_noop_on_cpu(monkeypatch):
    # tests run with the cpu platform forced; the switch must refuse and
    # leave the default threefry implementation alone
    from speechain_tpu.utils.hardware import enable_hardware_rng
    assert enable_hardware_rng() is False
    monkeypatch.setenv("SPEECHAIN_THREEFRY", "1")
    assert enable_hardware_rng() is False
