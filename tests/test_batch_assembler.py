"""Native batch assembler: one C call reads+decodes+pad-packs the batch.

The fast path must be bit-identical to the per-utterance Python path and
must fall back (not crash, not corrupt) whenever a per-item transform or an
unsupported container is involved.
"""

import os
import wave as wavemod
from functools import partial

import numpy as np
import pytest

from speechain_tpu.data.dataset import SpeechTextDataset
from speechain_tpu.data.iterator import Iterator
from speechain_tpu.data.loader import EpochLoader, collate_speech_text
from speechain_tpu.data.tokenizer import CharTokenizer
from tests.test_native_audio import write_flac


def _write_wav(path, pcm, sr=16000):
    with wavemod.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(np.asarray(pcm, "<i2").tobytes())


def _corpus(tmp_path, fmt="wav", sr=16000, n=12):
    rng = np.random.RandomState(0)
    d = tmp_path / fmt
    d.mkdir(exist_ok=True)
    idx2wav, idx2len, idx2text = {}, {}, {}
    for i in range(n):
        m = int(sr * (0.3 + 0.4 * rng.rand()))
        pcm = (rng.randn(m) * 3000).astype(np.int16)
        p = str(d / f"u{i}.{fmt}")
        if fmt == "wav":
            _write_wav(p, pcm, sr)
        else:
            write_flac(p, pcm[:, None], sr=sr)
        k = f"u{i}"
        idx2wav[k], idx2len[k], idx2text[k] = p, m, "ab ba"
    for name, data in [("idx2wav", idx2wav), ("idx2wav_len", idx2len),
                       ("idx2text", idx2text)]:
        with open(tmp_path / f"{name}_{fmt}", "w") as f:
            for k, v in data.items():
                f.write(f"{k} {v}\n")
    vp = tmp_path / "vocab"
    if not vp.exists():
        vp.write_text("\n".join(["<blank>", "<unk>", "<space>", "a", "b",
                                 "<sos/eos>"]) + "\n")
    return str(tmp_path)


def _loader(root, fmt, sr=16000, **ds_conf):
    tok = CharTokenizer(token_vocab=os.path.join(root, "vocab"))
    ds = SpeechTextDataset(
        main_data={"wav": os.path.join(root, f"idx2wav_{fmt}"),
                   "text": os.path.join(root, f"idx2text_{fmt}")},
        sample_rate=sr, **ds_conf)
    it = Iterator(dataset=ds, data_len=os.path.join(root, f"idx2wav_len_{fmt}"),
                  batch_size=8, shuffle=False)
    return EpochLoader(it, partial(collate_speech_text, tokenizer=tok),
                       num_workers=0, prefetch=0)


@pytest.mark.parametrize("fmt", ["wav", "flac"])
def test_fast_path_bit_identical(tmp_path, fmt):
    root = _corpus(tmp_path, fmt)
    ld = _loader(root, fmt)
    fast = list(ld.epoch(0))
    assert all(b["feat"].dtype == np.int16 for b in fast)
    ld._fast_audio_batch = lambda idxs: None  # force the Python path
    slow = list(ld.epoch(0))
    assert len(fast) == len(slow) > 0
    for bf, bs in zip(fast, slow):
        assert bf["feat"].shape == bs["feat"].shape
        assert np.array_equal(bf["feat"], bs["feat"])
        assert np.array_equal(bf["feat_len"], bs["feat_len"])
        assert np.array_equal(bf["text"], bs["text"])


def test_fast_path_declined_when_perturb_active(tmp_path):
    root = _corpus(tmp_path, "wav")
    ld = _loader(root, "wav", use_speed_perturb=True)
    assert ld._fast_audio_batch(["u0", "u1"]) is None
    # and the slow path still yields float32 (perturbed) batches
    b = next(ld.epoch(0))
    assert b["feat"].dtype == np.float32


def test_fast_path_declined_on_sample_rate_mismatch(tmp_path):
    # files at 22050 but dataset configured for 16000: C refuses, loader
    # falls back to the Python path which downsamples
    root = _corpus(tmp_path, "wav", sr=22050)
    ld = _loader(root, "wav", sr=16000)
    assert ld._fast_audio_batch(["u0", "u1"]) is None
    b = next(ld.epoch(0))
    assert b["feat"].dtype == np.float32  # downsample path promotes
