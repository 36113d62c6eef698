"""AOT serving export (infer/export.py): serialized StableHLO artifacts
must deserialize and reproduce the live executables exactly, and
cross-platform lowering must produce TPU-servable artifacts from this
CPU-only box."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_stream_tick_roundtrip(tmp_path):
    """Drive a full stream through DESERIALIZED start/step/finish and
    compare every emitted token against the live StreamingASR."""
    from tests.test_streaming import _causal_asr, _init

    from speechain_tpu.infer.export import export_stream_asr, load_serving
    from speechain_tpu.infer.streaming import StreamingASR

    net, cfg = _causal_asr(encoder_type="transformer")
    wave, wave_len, variables = _init(net, 3200)
    S = 800
    stream = StreamingASR(net, variables, chunk_samples=S, max_frames=256)
    out = str(tmp_path / "artifacts")
    paths = export_stream_asr(stream, out, batch_size=wave.shape[0])
    assert set(paths) == {"start", "step", "finish"}
    assert os.path.exists(os.path.join(out, "manifest.json"))

    exps = {m: load_serving(p) for m, p in paths.items()}
    zero = jnp.zeros((), jnp.int32)

    def run(call):
        state = stream.reset(wave.shape[0])
        toks = []
        st, ids, emit = call["start"](stream.exec_variables, state,
                                      wave[:, :S], zero)
        toks.append((np.asarray(ids), np.asarray(emit)))
        for c in range(1, 4):
            st, ids, emit = call["step"](stream.exec_variables, st,
                                         wave[:, c * S:(c + 1) * S], zero)
            toks.append((np.asarray(ids), np.asarray(emit)))
        st, ids, emit = call["finish"](stream.exec_variables, st,
                                       jnp.zeros((wave.shape[0], S)), zero)
        toks.append((np.asarray(ids), np.asarray(emit)))
        return toks

    live = run({"start": stream._start, "step": stream._step,
                "finish": stream._finish})
    aot = run({m: e.call for m, e in exps.items()})
    for (li, le), (ai, ae) in zip(live, aot):
        np.testing.assert_array_equal(li, ai)
        np.testing.assert_array_equal(le, ae)


def test_decoder_roundtrip(tmp_path):
    from tests.test_streaming import _causal_asr, _init

    from speechain_tpu.infer.asr import make_asr_decoder
    from speechain_tpu.infer.export import export_asr_decoder, load_serving

    net, cfg = _causal_asr(encoder_type="transformer")
    wave, wave_len, variables = _init(net, 2000)
    kw = dict(beam_size=3, max_len=12)
    path = export_asr_decoder(net, variables,
                              (wave.shape[0], wave.shape[1]),
                              str(tmp_path), **kw)
    exp = load_serving(path)
    feat = wave[..., None]
    live = make_asr_decoder(net, **kw)(variables, feat, wave_len)
    aot = exp.call(variables, feat, wave_len)
    live_l, aot_l = jax.tree_util.tree_leaves(live), \
        jax.tree_util.tree_leaves(aot)
    assert len(live_l) == len(aot_l)
    for a, b in zip(live_l, aot_l):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_vocoder_roundtrip_and_tpu_platform(tmp_path):
    """Vocoder window artifact reproduces the live apply, and a
    platforms=('cpu','tpu') export serializes (TPU-servable artifact
    lowered without TPU hardware) and still calls on cpu."""
    import json

    from speechain_tpu.infer.export import export_vocoder, load_serving
    from speechain_tpu.nn.vocoder_hifigan import HiFiGAN

    net = HiFiGAN(in_channels=8,
                  resblock_dilation_sizes=((1, 3), (1, 3)),
                  resblock_kernel_sizes=(3, 5),
                  upsample_kernel_sizes=(8, 4),
                  upsample_initial_channel=16,
                  upsample_factors=(4, 2))
    mel = jax.random.normal(jax.random.PRNGKey(0), (1, 24, 8))
    variables = net.init(jax.random.PRNGKey(1), mel)

    path = export_vocoder(net, variables, n_frames=24, out_dir=str(tmp_path),
                          platforms=("cpu", "tpu"))
    exp = load_serving(path)
    assert "tpu" in exp.platforms and "cpu" in exp.platforms
    np.testing.assert_allclose(np.asarray(exp.call(variables, mel)),
                               np.asarray(net.apply(variables, mel)),
                               atol=1e-6)
    manifest = json.load(open(os.path.join(str(tmp_path), "manifest.json")))
    assert manifest["vocoder"]["platforms"] == ["cpu", "tpu"]
    assert manifest["vocoder"]["in_avals"]


def test_export_cli_end_to_end(tmp_path):
    """Full user path: runner-train a causal ASR, speechain-export its
    stream + decode artifacts, reload them and run — the deployed stream
    tick must transcribe a wav to the same tokens as the live object."""
    import jax.numpy as jnp

    from tests.test_runner import CONFIG_TEMPLATE, make_dataset

    from speechain_tpu import runner
    from speechain_tpu.pyscripts import export_cli

    cfg_text = CONFIG_TEMPLATE.format(
        root=make_dataset(str(tmp_path / "data"), n_train=16, n_valid=8,
                          n_test=4),
        epochs=2,
    ).replace(
        "        label_smoothing: 0.0",
        "        label_smoothing: 0.0\n        ctc_weight: 0.5",
    ).replace(
        "          d_model: 48\n          num_heads: 4\n"
        "          num_layers: 2",
        "          uni_direction: true\n"
        "          d_model: 48\n          num_heads: 4\n"
        "          num_layers: 2",
    )
    exp = str(tmp_path / "exp")
    cfg_path = str(tmp_path / "exp_cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    args = runner.parse_args(
        ["--config", cfg_path, "--train", "--result_path", exp,
         "--time_bucket", "1600"])
    runner.train_main(runner.merge_config(args), args)

    out = str(tmp_path / "artifacts")
    export_cli.main(["--config", cfg_path, "--result_path", exp,
                     "--out", out, "--what", "stream", "decode",
                     "--chunk_ms", "200", "--max_frames", "512",
                     "--feat_seconds", "0.5", "--beam_size", "3",
                     "--max_len", "12"])
    manifest = os.path.join(out, "manifest.json")
    assert os.path.exists(manifest)
    for name in ("stream_start", "stream_step", "stream_finish",
                 "asr_decode"):
        assert os.path.exists(os.path.join(out, f"{name}.shlo")), name

    # reload + run the decode artifact on a real test wav
    from speechain_tpu.infer.export import load_serving
    from speechain_tpu.utils.fileio import (read_data_by_path,
                                            read_idx2data_file)
    idx2wav = read_idx2data_file(str(tmp_path / "data" / "test" /
                                     "idx2wav"))
    wav = np.asarray(read_data_by_path(next(iter(idx2wav.values()))),
                     np.float32).reshape(-1)
    T = int(0.5 * 8000)
    feat = np.zeros((1, T, 1), np.float32)
    n = min(T, len(wav))
    feat[0, :n, 0] = wav[:n]
    dec = load_serving(os.path.join(out, "asr_decode.shlo"))
    from speechain_tpu import runner as R
    import argparse as ap
    cfg = R.merge_config(ap.Namespace(
        config=cfg_path, result_path=exp, test_model=None,
        **{k: None for k in R.DEFAULTS}))
    from speechain_tpu.builders import build_model, build_tokenizer
    from speechain_tpu.train.checkpoint import CheckpointManager
    customize = cfg["train_cfg"]["model"]["model_conf"]["customize_conf"]
    tokenizer = build_tokenizer(customize.get("token_type", "char"),
                                customize.get("token_path"))
    net, _, _ = build_model(cfg["train_cfg"]["model"],
                            tokenizer.vocab_size)
    state, _ = CheckpointManager(exp).restore_train_state(None)
    variables = {"params": state["params"], **state["mutables"]}
    res = dec.call(variables, jnp.asarray(feat),
                   jnp.full((1,), n, jnp.int32))
    leaves = jax.tree_util.tree_leaves(res)
    assert leaves and all(np.isfinite(np.asarray(l)).all()
                          for l in leaves if np.asarray(l).dtype.kind == "f")
