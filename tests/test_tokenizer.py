"""Tokenizers: char roundtrip, subword training + encode, G2P lexicon."""

import os

import numpy as np

from speechain_tpu.data.tokenizer import (
    CharTokenizer,
    GraphemeToPhonemeTokenizer,
    SubwordTokenizer,
    train_subword_tokenizer,
)


def _write_vocab(path, tokens):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "vocab"), "w") as f:
        f.write("\n".join(tokens) + "\n")


def test_char_tokenizer_roundtrip(tmp_path):
    d = str(tmp_path / "tok")
    _write_vocab(d, ["<blank>", "<unk>", "<space>"]
                 + list("abcdefgh") + ["<sos/eos>"])
    tok = CharTokenizer(token_path=d)
    ids = tok.text2tensor("abc fg")
    assert ids[0] == tok.sos_eos_idx and ids[-1] == tok.sos_eos_idx
    assert tok.tensor2text(ids) == "abc fg"
    # unknown char -> unk -> '*'
    ids2 = tok.text2tensor("axz"[0] + "z")
    assert "*" in tok.tensor2text(ids2)


def test_subword_train_encode_decode(tmp_path):
    d = str(tmp_path / "bpe")
    corpus = ["the quick brown fox", "the lazy dog", "quick quick fox",
              "the dog barks", "a brown dog"] * 20
    train_subword_tokenizer(corpus, d, vocab_size=60, model_type="bpe")
    tok = SubwordTokenizer(token_path=d)
    ids = tok.text2tensor("the quick dog")
    assert ids[0] == tok.sos_eos_idx
    text = tok.tensor2text(ids)
    assert text == "the quick dog"


def test_g2p_lexicon_and_list_format(tmp_path):
    d = str(tmp_path / "g2p")
    _write_vocab(d, ["<blank>", "<unk>", "<space>", "HH", "AH0", "L", "OW1",
                     "<sos/eos>"])
    with open(os.path.join(d, "lexicon"), "w") as f:
        f.write("hello HH AH0 L OW1\n")
    tok = GraphemeToPhonemeTokenizer(token_path=d)
    ids = tok.text2tensor("hello")
    assert tok.tensor2text(ids) == "HH AH0 L OW1"
    # pre-phonemized list-format input (dataset/speech_text.py:322-334)
    ids2 = tok.text2tensor("['HH', 'AH0', 'L', 'OW1']")
    assert list(np.asarray(ids2)) == list(np.asarray(ids))
