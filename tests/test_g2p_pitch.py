"""OOV letter-to-sound G2P + WORLD-style (dio+stonemask) pitch extraction."""

import numpy as np

from speechain_tpu.utils.letter_to_sound import (CMU_CONSONANTS, CMU_VOWELS,
                                                 letter_to_sound)
from speechain_tpu.utils.world_pitch import (continuous_f0,
                                             convert_wav_to_pitch, dio,
                                             stonemask)


def _legal(phones):
    for p in phones:
        base = p[:-1] if p[-1:].isdigit() else p
        if not ((p[-1:].isdigit() and base in CMU_VOWELS)
                or base in CMU_CONSONANTS):
            return False
    return True


def test_letter_to_sound_stays_in_cmu_inventory():
    words = ["hello", "speechain", "zyzzyva", "qwerty", "phonetics",
             "xylograph", "brrr", "aeiou", "knighthood", "throughput"]
    for w in words:
        ph = letter_to_sound(w)
        assert len(ph) > 0, w
        assert _legal(ph), (w, ph)


def test_letter_to_sound_known_patterns():
    assert letter_to_sound("chain") == ["CH", "EY1", "N"]
    assert letter_to_sound("phone") == ["F", "OW1", "N"]
    assert letter_to_sound("knight") == ["N", "AY1", "T"]
    assert letter_to_sound("nation") == ["N", "AE1", "SH", "AH0", "N"]
    assert letter_to_sound("quick") == ["K", "W", "IH1", "K"]


def test_letter_to_sound_probe_per():
    """OOV phoneme error rate against the embedded CMUdict probe set stays
    at the measured level (docs/PARITY.md records 0.130/0.174; the gate
    leaves headroom so probe-set tweaks don't flap it). The reference's
    g2p_en neural model is the comparison point (tokenizer/g2p.py:112)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.g2p_eval import PROBE_LEXICON, evaluate

    result = evaluate(PROBE_LEXICON)
    assert result["n_words"] >= 150
    assert result["per"] <= 0.16, result["per"]
    assert result["per_stressed"] <= 0.21, result["per_stressed"]


def test_g2p_tokenizer_oov_words_get_phones_not_unk(tmp_path):
    from speechain_tpu.data.tokenizer import GraphemeToPhonemeTokenizer

    vocab = ["<blank>", "<unk>", "<space>", "CH", "EY", "N", "F", "OW",
             "HH", "AH", "L", "<sos/eos>"]
    vp = tmp_path / "vocab"
    vp.write_text("\n".join(vocab) + "\n")
    lx = tmp_path / "lexicon"
    lx.write_text("chain CH EY N\n")
    tok = GraphemeToPhonemeTokenizer(token_vocab=str(vp),
                                     lexicon_path=str(lx))
    # in-lexicon word resolves through the lexicon; the OOV word "phone"
    # goes through letter-to-sound and lands on in-vocab phones (with the
    # stress digit stripped to match the unstressed vocabulary)
    ids = tok.text2tensor("chain phone")
    unk = tok.unk_idx
    assert (ids == unk).sum() == 0, tok.tensor2text(ids)
    assert "F OW N" in tok.tensor2text(ids)


def test_dio_stonemask_accuracy_on_harmonic_tone():
    sr = 22050
    t = np.arange(int(sr * 0.8)) / sr
    w = sum(0.6 / k * np.sin(2 * np.pi * 220 * k * t) for k in range(1, 5))
    pos, f0 = dio(w, sr, frame_period=1000 * 256 / sr)
    f0 = stonemask(w, sr, pos, f0)
    v = f0[f0 > 0]
    assert len(v) / len(f0) > 0.8
    assert abs(float(v.mean()) - 220.0) < 2.0
    assert float(np.abs(v - 220.0).max()) < 5.0


def test_dio_tracks_a_chirp():
    sr = 22050
    t = np.arange(int(sr * 1.0)) / sr
    fi = 150 + 150 * t
    phase = 2 * np.pi * np.cumsum(fi) / sr
    w = sum(0.5 / k * np.sin(k * phase) for k in range(1, 4))
    pos, f0 = dio(w, sr, frame_period=1000 * 256 / sr)
    f0 = stonemask(w, sr, pos, f0)
    tgt = 150 + 150 * pos
    voiced = f0 > 0
    assert voiced.mean() > 0.6
    assert float(np.median(np.abs(f0[voiced] - tgt[voiced]))) < 5.0


def test_silence_is_unvoiced_and_continuous_f0_fills():
    sr = 16000
    t = np.arange(sr // 2) / sr
    tone = np.sin(2 * np.pi * 180 * t)
    w = np.concatenate([np.zeros(sr // 4), tone, np.zeros(sr // 4)])
    pos, f0 = dio(w, sr, frame_period=1000 * 200 / sr)
    n_head = int(0.15 / (200 / sr))
    assert (f0[:n_head] > 0).sum() <= 2        # leading silence unvoiced
    c = continuous_f0(f0)
    assert (c > 0).all()                        # interpolation fills gaps


def test_convert_wav_to_pitch_contract():
    sr = 22050
    t = np.arange(sr) / sr
    w = np.sin(2 * np.pi * 200 * t)
    f0 = convert_wav_to_pitch(w, hop_length=256, sr=sr)
    assert f0.dtype == np.float32
    # pyworld.dio frame count contract: len/fs*1000/frame_period + 1
    assert len(f0) == int(len(w) / sr * 1000 / (1000 * 256 / sr)) + 1
    v = f0[f0 > 0]
    assert abs(float(np.median(v)) - 200.0) < 3.0
