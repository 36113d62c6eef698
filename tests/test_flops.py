"""Sanity checks for the analytic FLOP counters (utils/flops.py) that
anchor the decode/TTS reference baselines in bench.py."""

import numpy as np

from speechain_tpu.utils import flops as fl


def test_linear_and_mhsa_counts():
    assert fl.linear(10, 4, 8) == 2 * 10 * 4 * 8
    # self-attention at t=1 reduces to 4 projections + 2 t*d terms
    d = 16
    assert fl.mhsa(1, 1, d) == 4 * 2 * d * d + 2 * 2 * d


def test_ref_beam_search_quadratic_blowup():
    """The reference's full-prefix recompute must cost ~L^2/2 token
    forwards vs our cached ~L — the ratio grows with L."""
    kw = dict(t_enc=100, beam=4, layers=2, d=64, ff=256, vocab=100)
    ratios = [fl.ref_beam_search_decoder_flops(L, **kw)
              / fl.cached_beam_search_decoder_flops(L, **kw)
              for L in (8, 32, 128)]
    assert ratios[0] > 1.0
    assert ratios[0] < ratios[1] < ratios[2]
    # at L=128 the prefix recompute must dominate by an order of magnitude
    assert ratios[2] > 10.0


def test_conformer_vs_transformer_encoder():
    # conformer layer = transformer layer + extra macaron FFN + conv module
    t, d, ff = 50, 64, 256
    assert fl.conformer_encoder(t, 1, d, ff) > fl.transformer_encoder(
        t, 1, d, ff) + fl.ffn(t, d, ff)


def test_hifigan_dominates_fs2_and_scales_linearly():
    """HiFiGAN V1 is the compute bulk of TTS synthesis (known ~GFLOPs per
    audio-second) and is linear in mel length."""
    f1, f2 = fl.hifigan_fwd_flops(320), fl.hifigan_fwd_flops(640)
    assert np.isclose(f2 / f1, 2.0, rtol=0.02)
    fs2 = fl.fastspeech2_fwd_flops(100, 640, 384, 1536, 4, 4, 80)
    assert f2 > fs2
    # magnitude: V1 at 22.05kHz is ~10-20 GFLOP per second of audio
    per_audio_sec = f2 / (640 * 0.0125)
    assert 5e9 < per_audio_sec < 5e10


def test_anchor_magnitude():
    """The derived 3090 effective throughput must land in a plausible
    band (1-10 TFLOP/s: a few percent of bf16 tensor peak)."""
    T_MEL, T_ENC, L, D, V = 801, 201, 32, 256, 1000
    enc = (fl.conv2d_subsample_prenet(T_MEL, 80, [D, D])
           + fl.conformer_encoder(T_ENC, 12, D, 4 * D))
    dec = fl.transformer_decoder(L, L, T_ENC, 6, D, 4 * D) + fl.linear(
        L, D, V)
    eff = 45_000.0 * 3.0 * (enc + dec) / T_MEL
    assert 1e12 < eff < 1e13
