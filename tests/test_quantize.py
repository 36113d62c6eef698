"""Weight-only int8 serving (infer/quantize.py): tree round-trip bounds,
identity on float trees, decode-score closeness, and the runner's
``infer_cfg: weight_quant`` surface."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

RNG = jax.random.PRNGKey(4)


def test_roundtrip_error_bound_and_selection():
    from speechain_tpu.infer.quantize import (MARKER, dequantize_variables,
                                              quantize_variables)

    k1, k2, k3 = jax.random.split(RNG, 3)
    tree = {"params": {
        "enc": {"kernel": jax.random.normal(k1, (128, 256)) * 0.1,
                "bias": jax.random.normal(k2, (256,))},
        "embedding": {"embedding":
                      jax.random.normal(k3, (500, 64)) * 2.0},
        "ln": {"scale": jnp.ones((256,))}},
        "norm_stats": {"frontend": {"mean": jnp.zeros((20,))}}}
    q = quantize_variables(tree, min_elems=1024)

    # selection: big 2-D float leaves quantized, the rest untouched
    assert MARKER in q["params"]["enc"]["kernel"]
    assert MARKER in q["params"]["embedding"]["embedding"]
    assert isinstance(q["params"]["enc"]["bias"], jnp.ndarray)
    assert isinstance(q["params"]["ln"]["scale"], jnp.ndarray)
    assert isinstance(q["norm_stats"]["frontend"]["mean"], jnp.ndarray)
    # embedding scales are per vocab ROW, kernel scales per out column
    assert q["params"]["embedding"]["embedding"]["scale"].shape == (500, 1)
    assert q["params"]["enc"]["kernel"]["scale"].shape == (1, 256)

    d = dequantize_variables(q)
    for path in (("params", "enc", "kernel"),
                 ("params", "embedding", "embedding")):
        orig = tree
        deq = d
        for p in path:
            orig, deq = orig[p], deq[p]
        scale = np.asarray(q["params"][path[1]][path[2]]["scale"])
        err = np.abs(np.asarray(orig) - np.asarray(deq))
        # symmetric rounding error bound: half a quantization step
        assert (err <= scale / 2 + 1e-7).all(), err.max()
    np.testing.assert_array_equal(np.asarray(d["params"]["enc"]["bias"]),
                                  np.asarray(tree["params"]["enc"]["bias"]))


def test_dequantize_is_identity_on_float_trees():
    from speechain_tpu.infer.quantize import dequantize_variables

    tree = {"params": {"a": jnp.ones((4, 4))}, "cache": {"k": jnp.zeros(3)}}
    out = dequantize_variables(tree)
    assert out["params"]["a"] is tree["params"]["a"]
    assert out["cache"]["k"] is tree["cache"]["k"]


def test_quantized_bytes_report():
    from speechain_tpu.infer.quantize import (quantize_variables,
                                              quantized_bytes)

    tree = {"params": {"kernel": jnp.zeros((256, 256), jnp.float32)}}
    q = quantize_variables(tree, min_elems=1024)
    now, deq = quantized_bytes(q)
    assert deq == 256 * 256 * 4
    assert now < deq / 3      # int8 + scales well under fp32/3


@pytest.mark.slow
def test_quantized_decode_scores_close():
    """Beam search over int8 weights: confidences within a small tolerance
    of the float model (random-init tiny ASR, beam 2)."""
    from tests.test_streaming import _causal_asr, _init

    from speechain_tpu.infer.asr import make_asr_decoder
    from speechain_tpu.infer.quantize import quantize_variables

    net, _ = _causal_asr()
    wave, wave_len, variables = _init(net, n_wave=2400)
    decode = make_asr_decoder(net, beam_size=2)
    feat = wave[..., None]
    out_fp = decode(variables, feat, wave_len)
    out_q8 = decode(quantize_variables(variables, min_elems=1024),
                    feat, wave_len)
    np.testing.assert_allclose(np.asarray(out_q8["hypo_text_confid"]),
                               np.asarray(out_fp["hypo_text_confid"]),
                               atol=0.05)


@pytest.mark.slow
def test_runner_weight_quant_surface(tmp_path):
    """infer_cfg named runs: a float run and a weight_quant: int8 run on
    the same trained checkpoint — the int8 WER must track the float WER."""
    from speechain_tpu import runner
    from tests.test_runner import CONFIG_TEMPLATE, make_dataset

    root = make_dataset(str(tmp_path / "data"), n_train=16, n_valid=8,
                        n_test=4)
    exp = str(tmp_path / "exp")
    cfg_path = str(tmp_path / "exp_cfg.yaml")
    cfg_text = CONFIG_TEMPLATE.format(root=root, epochs=8).replace(
        "infer_cfg:\n  beam_size: 2",
        "infer_cfg:\n  fp:\n    beam_size: 2\n"
        "  q8:\n    beam_size: 2\n    weight_quant: int8\n"
        "    weight_quant_min_elems: 256")  # tiny test kernels must quantize
    assert "weight_quant" in cfg_text
    with open(cfg_path, "w") as f:
        f.write(cfg_text)

    args = runner.parse_args(
        ["--config", cfg_path, "--train", "--result_path", exp,
         "--time_bucket", "1600"])
    runner.train_main(runner.merge_config(args), args)

    targs = runner.parse_args(
        ["--config", cfg_path, "--test", "--result_path", exp,
         "--test_model", "latest", "--time_bucket", "1600"])
    results = runner.test_main(runner.merge_config(targs), targs)
    assert "fp/test" in results and "q8/test" in results
    wer_fp = results["fp/test"]["wer"]
    wer_q8 = results["q8/test"]["wer"]
    assert abs(wer_q8 - wer_fp) <= 0.2, (wer_fp, wer_q8)
    assert os.path.exists(os.path.join(exp, "latest", "q8", "test",
                                       "overall_results.md"))
