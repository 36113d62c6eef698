"""SentencePiece .model reader: parse a hand-built ModelProto and encode."""

import struct

import numpy as np

from speechain_tpu.data.sp_model import SentencePieceModel, WORD_MARK


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint((num << 3) | wire) + payload


def _piece(piece: str, score: float, ptype: int = 1) -> bytes:
    body = _field(1, 2, _varint(len(piece.encode())) + piece.encode())
    body += _field(2, 5, struct.pack("<f", score))
    if ptype != 1:
        body += _field(3, 0, _varint(ptype))
    return _field(1, 2, _varint(len(body)) + body)


def build_model(pieces, model_type=1) -> bytes:
    out = b"".join(_piece(p, s, t) for p, s, t in pieces)
    trainer = _field(3, 0, _varint(model_type))
    out += _field(2, 2, _varint(len(trainer)) + trainer)
    return out


def test_unigram_viterbi_segmentation():
    m = WORD_MARK
    pieces = [
        ("<unk>", 0.0, 2),
        (m + "hel", -1.0, 1), ("lo", -1.0, 1),
        (m + "hello", -1.5, 1),
        (m + "h", -5.0, 1), ("e", -5.0, 1), ("l", -5.0, 1), ("o", -5.0, 1),
        (m + "world", -1.0, 1),
    ]
    sp = SentencePieceModel(build_model(pieces, model_type=1))
    assert sp.model_type == "unigram"
    # '▁hello' (-1.5) beats '▁hel'+'lo' (-2.0)
    assert sp.encode_pieces("hello") == [m + "hello"]
    assert sp.encode_pieces("hello world") == [m + "hello", m + "world"]
    assert sp.decode_pieces(sp.encode_pieces("hello world")) == "hello world"


def test_unigram_unknown_fallback():
    m = WORD_MARK
    pieces = [("<unk>", 0.0, 2), (m + "ab", -1.0, 1),
              (m, -2.0, 1), ("a", -3.0, 1), ("b", -3.0, 1)]
    sp = SentencePieceModel(build_model(pieces))
    out = sp.encode_pieces("abz")
    # 'z' is not in the vocab: must still produce a full segmentation
    assert "".join(out) == m + "abz"


def test_bpe_merges_by_rank():
    m = WORD_MARK
    # score = -rank: prefer merging 'ab' (rank 0) before 'abc' exists
    pieces = [("<unk>", 0.0, 2),
              (m, -100.0, 1), ("a", -101.0, 1), ("b", -102.0, 1),
              ("c", -103.0, 1),
              ("ab", -0.0, 1), ("abc", -1.0, 1), (m + "abc", -2.0, 1)]
    sp = SentencePieceModel(build_model(pieces, model_type=2))
    assert sp.model_type == "bpe"
    out = sp.encode_pieces("abc")
    assert out == [m + "abc"]


def test_encode_ids_roundtrip():
    m = WORD_MARK
    pieces = [("<unk>", 0.0, 2), (m + "hi", -1.0, 1), (m + "yo", -1.0, 1)]
    sp = SentencePieceModel(build_model(pieces))
    ids = sp.encode_ids("hi yo")
    assert ids == [1, 2]
