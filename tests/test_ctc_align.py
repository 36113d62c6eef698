"""CTC forced alignment (infer/ctc_align.py): the jitted lattice Viterbi
must match a transparent numpy oracle on random inputs (score, path,
durations), recover a planted alignment from peaked logits, and produce
FastSpeech2-consistent durations (sum == frames) from a real model."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechain_tpu.infer.ctc_align import ctc_forced_align, make_ctc_aligner

pytestmark = pytest.mark.slow


def _oracle(logp, labels, T_len, L_len, blank=0):
    """Dict-based CTC Viterbi for ONE row: returns (score, states)."""
    z = [blank]
    for tok in labels[:L_len]:
        z += [int(tok), blank]
    S = len(z)
    NEG = -1e30
    alpha = np.full(S, NEG)
    alpha[0] = logp[0, z[0]]
    if S > 1:
        alpha[1] = logp[0, z[1]]
    back = np.zeros((T_len, S), np.int32)
    for t in range(1, T_len):
        new = np.full(S, NEG)
        for s in range(S):
            cands = [alpha[s]]
            if s >= 1:
                cands.append(alpha[s - 1])
            if s >= 2 and z[s] != blank and z[s] != z[s - 2]:
                cands.append(alpha[s - 2])
            k = int(np.argmax(cands))
            new[s] = cands[k] + logp[t, z[s]]
            back[t, s] = k
        alpha = new
    ends = [S - 1] if S == 1 else [S - 2, S - 1]
    end = ends[int(np.argmax([alpha[e] for e in ends]))]
    score = alpha[end]
    states = np.zeros(T_len, np.int32)
    cur = end
    for t in range(T_len - 1, -1, -1):
        states[t] = cur
        cur -= back[t, cur]
    return score, states


def test_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    B, T, V, L = 3, 14, 6, 4
    logits = rng.randn(B, T, V).astype(np.float32)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    labels = rng.randint(1, V, size=(B, L)).astype(np.int32)
    # avoid planted repeats being impossible in T frames: fine either way,
    # the oracle and the lattice share the topology
    T_len = np.array([14, 11, 9], np.int32)
    L_len = np.array([4, 3, 2], np.int32)

    out = ctc_forced_align(jnp.asarray(logp), jnp.asarray(labels),
                           jnp.asarray(T_len), jnp.asarray(L_len))
    for b in range(B):
        score, states = _oracle(logp[b], labels[b], int(T_len[b]),
                                int(L_len[b]))
        np.testing.assert_allclose(float(out.score[b]), score, atol=1e-4)
        # same frame->token mapping convention as the module
        want_tok = np.where(states % 2 == 1, (states - 1) // 2,
                            np.maximum(states // 2 - 1, 0))
        got = np.asarray(out.path[b])
        np.testing.assert_array_equal(got[:int(T_len[b])], want_tok)
        assert (got[int(T_len[b]):] == -1).all()
        # durations: one per label, summing to the frame count
        dur = np.asarray(out.durations[b])
        assert dur[int(L_len[b]):].sum() == 0
        assert dur.sum() == int(T_len[b])
        np.testing.assert_array_equal(
            dur[:int(L_len[b])],
            np.bincount(want_tok, minlength=L)[:int(L_len[b])])


def test_recovers_planted_alignment():
    """Peaked logits along a known alignment must be recovered exactly."""
    V, blank = 5, 0
    labels = np.array([[2, 3, 2]], np.int32)
    # frames: token0 x3, blank x2, token1 x2, token2 x3 (blank needed
    # between the repeated 2s is covered by the explicit blanks)
    seq = [2, 2, 2, 0, 0, 3, 3, 0, 2, 2, 2]
    T = len(seq)
    logp = np.full((1, T, V), -10.0, np.float32)
    for t, v in enumerate(seq):
        logp[0, t, v] = 0.0
    out = ctc_forced_align(jnp.asarray(logp), jnp.asarray(labels),
                           jnp.asarray([T]), jnp.asarray([3]))
    # blanks merge into the preceding token
    np.testing.assert_array_equal(np.asarray(out.durations[0]), [5, 3, 3])
    assert float(out.score[0]) > -1.0


def test_aligner_on_real_model():
    """make_ctc_aligner end-to-end: durations in encoder frames, one per
    transcript token, summing to the encoder length."""
    from tests.test_streaming import _causal_asr, _init

    net, cfg = _causal_asr(encoder_type="transformer")
    wave, wave_len, variables = _init(net, 3200, amp=1.0)
    labels = jnp.array([[1, 3, 4], [2, 5, 0]], jnp.int32)
    label_len = jnp.array([3, 2], jnp.int32)
    align = make_ctc_aligner(net)
    out, enc_len = align(variables, wave[..., None], wave_len,
                         labels, label_len)
    enc_len = np.asarray(enc_len)
    dur = np.asarray(out.durations)
    for b in range(2):
        assert dur[b].sum() == enc_len[b]
        assert (dur[b, :int(label_len[b])] >= 0).all()
        assert dur[b, int(label_len[b]):].sum() == 0
    assert np.isfinite(np.asarray(out.score)).all()


def test_align_cli_end_to_end(tmp_path):
    """Full user path: runner-train a CTC-headed ASR, then speechain-align
    writes idx2duration/idx2align_score for a corpus — the native
    replacement for the reference's MFA round-trip."""
    from tests.test_runner import CONFIG_TEMPLATE, make_dataset

    from speechain_tpu import runner
    from speechain_tpu.pyscripts import align_cli

    root = make_dataset(str(tmp_path / "data"), n_train=16, n_valid=8,
                        n_test=4)
    cfg_text = CONFIG_TEMPLATE.format(root=root, epochs=2).replace(
        "        label_smoothing: 0.0",
        "        label_smoothing: 0.0\n        ctc_weight: 0.5")
    exp = str(tmp_path / "exp")
    cfg_path = str(tmp_path / "exp_cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    args = runner.parse_args(
        ["--config", cfg_path, "--train", "--result_path", exp,
         "--time_bucket", "1600"])
    runner.train_main(runner.merge_config(args), args)

    out = str(tmp_path / "align")
    align_cli.main(["--config", cfg_path, "--result_path", exp,
                    "--wav_scp", os.path.join(root, "test", "idx2wav"),
                    "--text", os.path.join(root, "test", "idx2text"),
                    "--output", out, "--batch", "2", "--scale", "2"])
    durs = dict(l.split(None, 1) for l in
                open(os.path.join(out, "idx2duration")).read()
                .strip().splitlines())
    scores = open(os.path.join(out, "idx2align_score")).read() \
        .strip().splitlines()
    assert len(durs) == 4 and len(scores) == 4
    for idx, row in durs.items():
        vals = [int(v) for v in row.split()]
        assert vals and all(v >= 0 for v in vals)
        assert sum(vals) > 0  # scaled encoder frames cover the utterance
