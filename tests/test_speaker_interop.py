"""Pretrained speaker-encoder interop (nn/speaker.py::load_torch_speaker).

A torch fixture replicates the reference EncoderClassifier's nn.Sequential
state-dict layout (reference speechain/module/encoder/speaker.py:46-95 —
the architecture its ``from_hparams`` ``encoder.pth`` checkpoints are saved
from). The remapped flax model must match the torch forward numerically,
including BatchNorm running statistics and the Res2Block's interleaved
concat. Mirrors the HiFi-GAN interop design (test_vocoder_golden.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from speechain_tpu.nn.speaker import (  # noqa: E402
    EncoderClassifier,
    load_torch_speaker,
)


class _TorchRes2Block(tnn.Module):
    """Reference Res2Block semantics (speaker.py:22-44): conv chain on the
    conv outputs, output = x + cat of the first `scale` entries of the
    interleaved [s0, c0, s1, c1, ...] list."""

    def __init__(self, channels, kernel_size=3, scale=8):
        super().__init__()
        self.scale = scale
        self.width = channels // scale
        self.convs = tnn.ModuleList(
            [tnn.Conv1d(self.width, self.width, kernel_size,
                        padding=kernel_size // 2)
             for _ in range(scale - 1)])

    def forward(self, x):
        splits = torch.split(x, self.width, dim=1)
        out = splits[0]
        outputs = [out]
        for conv, split in zip(self.convs, splits[1:]):
            out = conv(tF.relu(out))
            outputs.append(out)
            outputs.append(split)
        return x + torch.cat(outputs[: self.scale], dim=1)


class _TorchSE(tnn.Module):
    def __init__(self, channels, bottleneck=128):
        super().__init__()
        self.se = tnn.Sequential(
            tnn.AdaptiveAvgPool1d(1),
            tnn.Conv1d(channels, bottleneck, 1),
            tnn.ReLU(),
            tnn.Conv1d(bottleneck, channels, 1),
            tnn.Sigmoid())

    def forward(self, x):
        return x * self.se(x)


def _torch_model(model_type):
    if model_type == "ecapa":
        ch = 512
        model = tnn.Sequential(
            tnn.Conv1d(80, ch, 7, padding=3),
            tnn.BatchNorm1d(ch),
            tnn.ReLU(),
            tnn.Sequential(_TorchRes2Block(ch), _TorchSE(ch),
                           tnn.BatchNorm1d(ch)),
            tnn.AdaptiveAvgPool1d(1),
            tnn.Flatten(),
            tnn.Linear(ch, 192))
    else:
        model = tnn.Sequential(
            tnn.Conv1d(80, 512, 5, padding=2), tnn.BatchNorm1d(512),
            tnn.ReLU(),
            tnn.Conv1d(512, 512, 3, padding=1), tnn.BatchNorm1d(512),
            tnn.ReLU(),
            tnn.Conv1d(512, 512, 3, padding=1), tnn.BatchNorm1d(512),
            tnn.ReLU(),
            tnn.AdaptiveAvgPool1d(1), tnn.Flatten(),
            tnn.Linear(512, 512), tnn.ReLU(),
            tnn.Linear(512, 192))
    holder = tnn.Module()
    holder.model = model
    # non-trivial BN running stats so a stat-remap bug cannot hide
    g = torch.Generator().manual_seed(7)
    for m in holder.modules():
        if isinstance(m, tnn.BatchNorm1d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g)
                                 * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=g)
                                + 0.5)
            m.weight.data.copy_(torch.randn(m.num_features, generator=g)
                                * 0.2 + 1.0)
            m.bias.data.copy_(torch.randn(m.num_features, generator=g)
                              * 0.1)
    holder.eval()
    return holder


@pytest.mark.parametrize("model_type", ["ecapa", "xvector"])
def test_torch_remap_matches_torch_forward(model_type):
    holder = _torch_model(model_type)
    sd = {k: v for k, v in holder.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    variables = load_torch_speaker(sd, model_type)

    rng = np.random.default_rng(0)
    feat = rng.normal(size=(3, 60, 80)).astype(np.float32)
    with torch.no_grad():
        emb_t = holder.model(torch.from_numpy(feat).transpose(1, 2))
        emb_t = tF.normalize(emb_t, p=2, dim=1).numpy()

    model = EncoderClassifier(model_type=model_type)
    emb_j = np.asarray(model.apply(variables, jnp.asarray(feat)))
    np.testing.assert_allclose(emb_j, emb_t, rtol=2e-4, atol=2e-4)


def test_converter_cli_roundtrip(tmp_path):
    holder = _torch_model("ecapa")
    ckpt = tmp_path / "encoder.pth"
    torch.save(holder.state_dict(), ckpt)

    from speechain_tpu.pyscripts.spk_model_converter import main as convert
    out_dir = tmp_path / "orbax"
    convert(["--torch_ckpt", str(ckpt), "--model_type", "ecapa",
             "--save_path", str(out_dir)])

    from speechain_tpu.nn.speaker import restore_speaker_variables
    v_orbax = restore_speaker_variables(str(out_dir))
    v_torch = restore_speaker_variables(str(ckpt))
    for a, b in zip(jax.tree_util.tree_leaves(v_orbax),
                    jax.tree_util.tree_leaves(v_torch)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    feat = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 40, 80)), jnp.float32)
    model = EncoderClassifier(model_type="ecapa")
    emb = model.apply(v_orbax, feat)
    assert emb.shape == (2, 192)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)


def test_spk_sim_cli_with_torch_checkpoint(tmp_path):
    """spk_sim_evaluation end-to-end with a torch checkpoint: identical
    audio on both sides must score cosine similarity 1.0."""
    holder = _torch_model("ecapa")
    ckpt = tmp_path / "encoder.pth"
    torch.save(holder.state_dict(), ckpt)

    rng = np.random.default_rng(3)
    for i in range(2):
        np.save(tmp_path / f"utt{i}.npy",
                rng.normal(size=(4000,)).astype(np.float32) * 0.1)
    idx2wav = tmp_path / "idx2wav"
    idx2wav.write_text("".join(
        f"utt{i} {tmp_path}/utt{i}.npy\n" for i in range(2)))

    from speechain_tpu.pyscripts.spk_sim_evaluation import main as sim
    out = tmp_path / "results"
    sim(["--hypo_path", str(idx2wav), "--refer_path", str(idx2wav),
         "--spk_model", "ecapa", "--checkpoint", str(ckpt),
         "--result_path", str(out)])

    lines = (out / "idx2ecapa_spk_sim").read_text().strip().splitlines()
    assert len(lines) == 2
    for line in lines:
        assert abs(float(line.split()[1]) - 1.0) < 1e-3, line
    assert (out / "overall_results.md").exists()
