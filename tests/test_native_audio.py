"""Native FLAC decoder round-trip test.

A minimal pure-Python FLAC *writer* (verbatim and constant subframes — legal
uncompressed FLAC) produces files the native decoder must reconstruct
bit-exactly. This covers the container, frame-header, subframe and
channel-decorrelation paths; the Rice/LPC paths are covered by decoding any
externally-produced FLAC (LibriSpeech data in real recipes).
"""

import os
import struct

import numpy as np
import pytest

NATIVE_LIB = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libspeechain_native.so")

pytestmark = pytest.mark.skipif(
    not os.path.exists(NATIVE_LIB),
    reason="native library not built (run native/build.sh)")


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def align(self):
        while self.nbits:
            self.write(0, 1)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def write_flac(path, pcm: np.ndarray, sr=16000, constant_blocks=False):
    """pcm: (n, channels) int16. Verbatim (or constant) subframes,
    4096-sample blocks."""
    n, channels = pcm.shape
    bps = 16
    block = 4096
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = bytearray()
    si += struct.pack(">HH", block, block)           # min/max block size
    si += b"\x00\x00\x00" * 2                        # min/max frame size
    si += bytes([
        (sr >> 12) & 0xFF, (sr >> 4) & 0xFF,
        ((sr & 0xF) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4),
        (((bps - 1) & 0xF) << 4) | ((n >> 32) & 0xF),
        (n >> 24) & 0xFF, (n >> 16) & 0xFF, (n >> 8) & 0xFF, n & 0xFF])
    si += b"\x00" * 16                               # md5 (unchecked)
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    frame_idx = 0
    for start in range(0, n, block):
        chunk = pcm[start:start + block]
        bs = len(chunk)
        bw = BitWriter()
        bw.write(0x3FFE, 14)          # sync
        bw.write(0, 1)                # reserved
        bw.write(0, 1)                # fixed blocksize stream
        # block size code: 4096 -> 12; else 16-bit code 7
        if bs == 4096:
            bw.write(12, 4)
        else:
            bw.write(7, 4)
        bw.write(0, 4)                # sample rate: from STREAMINFO
        bw.write(channels - 1, 4)     # independent channels
        bw.write(4, 3)                # bps 16
        bw.write(0, 1)                # reserved
        # frame number as UTF-8 (frame_idx < 128 in tests)
        assert frame_idx < 128
        bw.write(frame_idx, 8)
        if bs != 4096:
            bw.write(bs - 1, 16)
        header = bytes(bw.bytes) + (bytes([bw.acc << (8 - bw.nbits)])
                                    if bw.nbits else b"")
        # CRC-8 over the header bits so far (must be byte aligned here)
        assert bw.nbits == 0
        bw.write(crc8(bytes(bw.bytes)), 8)
        for c in range(channels):
            bw.write(0, 1)            # pad
            if constant_blocks:
                bw.write(0, 6)        # CONSTANT
                bw.write(0, 1)        # no wasted bits
                bw.write(int(chunk[0, c]) & 0xFFFF, 16)
            else:
                bw.write(1, 6)        # VERBATIM
                bw.write(0, 1)
                for s in chunk[:, c]:
                    bw.write(int(s) & 0xFFFF, 16)
        bw.align()
        body = bytes(bw.bytes)
        bw.write(crc16(body), 16)
        out += bytes(bw.bytes)
        frame_idx += 1
    with open(path, "wb") as f:
        f.write(out)


def test_flac_verbatim_roundtrip(tmp_path):
    from speechain_tpu.utils.native_audio import read_flac

    rng = np.random.RandomState(0)
    pcm = (rng.randn(10000, 1) * 3000).astype(np.int16)
    path = str(tmp_path / "test.flac")
    write_flac(path, pcm, sr=16000)
    wave, sr = read_flac(path)
    assert sr == 16000
    assert len(wave) == 10000
    np.testing.assert_allclose(wave, pcm[:, 0] / 32768.0, atol=1e-6)


def test_flac_stereo_mixdown(tmp_path):
    from speechain_tpu.utils.native_audio import read_flac

    rng = np.random.RandomState(1)
    pcm = (rng.randn(5000, 2) * 2000).astype(np.int16)
    path = str(tmp_path / "stereo.flac")
    write_flac(path, pcm, sr=8000)
    wave, sr = read_flac(path)
    assert sr == 8000 and len(wave) == 5000
    want = (pcm[:, 0] / 32768.0 + pcm[:, 1] / 32768.0) / 2
    np.testing.assert_allclose(wave, want, atol=1e-6)


def test_flac_constant_blocks(tmp_path):
    from speechain_tpu.utils.native_audio import read_flac

    pcm = np.full((8192, 1), -1234, np.int16)
    path = str(tmp_path / "const.flac")
    write_flac(path, pcm, sr=16000, constant_blocks=True)
    wave, sr = read_flac(path)
    assert len(wave) == 8192
    np.testing.assert_allclose(wave, -1234 / 32768.0, atol=1e-6)


def test_flac_via_generic_reader(tmp_path):
    from speechain_tpu.utils.fileio import read_data_by_path

    pcm = (np.sin(np.arange(4000) / 10) * 10000).astype(np.int16)[:, None]
    path = str(tmp_path / "gen.flac")
    write_flac(path, pcm, sr=16000)
    wave, sr = read_data_by_path(path, return_sample_rate=True)
    assert sr == 16000 and len(wave) == 4000


def test_flac_int16_fast_path(tmp_path):
    """Mono 16-bit FLAC decodes to raw int16 PCM losslessly; stereo falls
    back to float (native flac_decode_file_i16)."""
    from speechain_tpu.utils.fileio import read_data_by_path, read_flac

    rng = np.random.default_rng(7)
    pcm = (rng.normal(size=(8000, 1)) * 6000).astype(np.int16)
    p = str(tmp_path / "m.flac")
    write_flac(p, pcm, sr=16000)
    wf, sr = read_flac(p)
    wi, sr2 = read_flac(p, int16=True)
    assert wi.dtype == np.int16 and sr == sr2 == 16000
    np.testing.assert_array_equal(wi, pcm[:, 0])
    np.testing.assert_array_equal(
        wf, wi.astype(np.float32) * np.float32(2.0 ** -15))
    assert read_data_by_path(p, prefer_int16=True).dtype == np.int16

    st = (rng.normal(size=(4000, 2)) * 6000).astype(np.int16)
    p2 = str(tmp_path / "s.flac")
    write_flac(p2, st, sr=16000)
    w2, _ = read_flac(p2, int16=True)
    assert w2.dtype == np.float32  # stereo -> float fallback
