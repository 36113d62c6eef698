"""HiFi-GAN checkpoint-remap golden tests (VERDICT r2 item 10).

The production loader (nn/vocoder_hifigan.py) is validated against an
INDEPENDENT torch execution of the same state dict
(pyscripts/vocoder_cli.torch_hifigan_forward): the two paths share only
the raw checkpoint, so a remap bug (key mapping, weight-norm fold, kernel
transpose, padding) shows up as a waveform mismatch.

Always runs on a synthetic weight-normed checkpoint written to disk via
torch.save (exercising the full load path); additionally runs on a REAL
checkpoint whenever SPEECHAIN_HIFIGAN_CKPT points at an existing file —
the env-blocked speechbrain/tts-hifigan validation closes itself the
first time the repo meets a network (reference contract:
/root/reference/speechain/module/vocoder/hifigan.py:234-303).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

SMALL_CFG = dict(
    in_channels=16,
    resblock_type="1",
    resblock_dilation_sizes=((1, 3), (1, 3)),
    resblock_kernel_sizes=(3, 5),
    upsample_kernel_sizes=(8, 8),
    upsample_initial_channel=32,
    upsample_factors=(4, 4),
)


def _wn(rs, shape):
    """weight_v plus a non-trivial weight_g so folding is actually
    exercised."""
    v = rs.standard_normal(shape).astype(np.float32) * 0.2
    g = (0.5 + rs.random((shape[0],) + (1,) * (len(shape) - 1))
         ).astype(np.float32)
    return {"weight_g": torch.as_tensor(g), "weight_v": torch.as_tensor(v)}


def make_synthetic_ckpt(path, cfg=SMALL_CFG, seed=0):
    rs = np.random.RandomState(seed)
    sd = {}

    def put(prefix, out_ch, in_ch, k):
        sd.update({f"{prefix}.{n}": t
                   for n, t in _wn(rs, (out_ch, in_ch, k)).items()})
        sd[f"{prefix}.bias"] = torch.as_tensor(
            rs.standard_normal(out_ch).astype(np.float32) * 0.01)

    c0 = cfg["upsample_initial_channel"]
    put("conv_pre", c0, cfg["in_channels"], 7)
    ch = c0
    num_kernels = len(cfg["resblock_kernel_sizes"])
    for i, (f, k) in enumerate(zip(cfg["upsample_factors"],
                                   cfg["upsample_kernel_sizes"])):
        out_ch = c0 // (2 ** (i + 1))
        # torch ConvTranspose1d weight layout: (in, out, k); weight-norm g
        # is per dim0 slice there too
        sd.update({f"ups.{i}.{n}": t
                   for n, t in _wn(rs, (ch, out_ch, k)).items()})
        sd[f"ups.{i}.bias"] = torch.as_tensor(
            rs.standard_normal(out_ch).astype(np.float32) * 0.01)
        ch = out_ch
        for j, rk in enumerate(cfg["resblock_kernel_sizes"]):
            r = i * num_kernels + j
            for di in range(len(cfg["resblock_dilation_sizes"][0])):
                put(f"resblocks.{r}.convs1.{di}", ch, ch, rk)
                put(f"resblocks.{r}.convs2.{di}", ch, ch, rk)
    put("conv_post", 1, ch, 7)
    torch.save(sd, path)
    return path


def test_synthetic_weightnormed_ckpt_roundtrip(tmp_path):
    from speechain_tpu.pyscripts.vocoder_cli import selftest

    ckpt = make_synthetic_ckpt(str(tmp_path / "hifigan_small.pt"))
    stats = selftest(ckpt, config=SMALL_CFG)
    assert stats["max_abs_err"] < 1e-3
    assert stats["n_samples"] == 32 * 4 * 4  # T * prod(upsample_factors)


def test_vocoder_cli_selftest_flag(tmp_path, capsys):
    """The --selftest CLI surface end-to-end on a full-size (default
    config) synthetic weight-normed checkpoint."""
    from speechain_tpu.nn.vocoder_hifigan import HIFIGAN_DEFAULT_CONFIG
    from speechain_tpu.pyscripts import vocoder_cli

    ckpt = make_synthetic_ckpt(str(tmp_path / "hifigan_full.pt"),
                               cfg=HIFIGAN_DEFAULT_CONFIG, seed=1)
    rc = vocoder_cli.main(["--ckpt", ckpt, "--selftest"])
    assert rc == 0
    assert "selftest OK" in capsys.readouterr().out


REAL_CKPT = os.environ.get("SPEECHAIN_HIFIGAN_CKPT", "")


@pytest.mark.skipif(not (REAL_CKPT and os.path.exists(REAL_CKPT)),
                    reason="set SPEECHAIN_HIFIGAN_CKPT to a local "
                           "speechbrain/tts-hifigan checkpoint to activate")
def test_real_checkpoint_selftest():
    from speechain_tpu.pyscripts.vocoder_cli import selftest

    stats = selftest(REAL_CKPT)
    assert stats["max_abs_err"] < 1e-3
    assert 0.0 < stats["rms"] < 1.0
