"""HiFi-GAN generator (inference vocoder), flax.

Rebuild of reference ``module/vocoder/hifigan.py:38-397`` (SpeechBrain-layout
generator: conv_pre -> [upsample ConvTranspose -> multi-receptive-field
fusion of ResBlock1/2] x N -> conv_post -> tanh). Weight-normalized torch
checkpoints load via :func:`load_torch_hifigan` which folds weight_norm
(g * v / ||v||) into plain kernels and remaps key names — equivalent to the
reference's ``remove_weight_norm`` + SpeechBrain key remapping
(hifigan.py:234-303).

All convolutions are channels-last. The model is inference-only (the
reference never trains it in-repo).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

HIFIGAN_DEFAULT_CONFIG = dict(
    in_channels=80,
    resblock_type="1",
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    resblock_kernel_sizes=(3, 7, 11),
    upsample_kernel_sizes=(16, 16, 4, 4),
    upsample_initial_channel=512,
    upsample_factors=(8, 8, 2, 2),
)

LRELU = 0.1


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU)
            xt = nn.Conv(self.channels, (self.kernel_size,),
                         kernel_dilation=(d,), padding="SAME",
                         name=f"convs1_{i}")(xt)
            xt = nn.leaky_relu(xt, LRELU)
            xt = nn.Conv(self.channels, (self.kernel_size,),
                         padding="SAME", name=f"convs2_{i}")(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, LRELU)
            xt = nn.Conv(self.channels, (self.kernel_size,),
                         kernel_dilation=(d,), padding="SAME",
                         name=f"convs_{i}")(xt)
            x = xt + x
        return x


class HiFiGAN(nn.Module):
    """Generator: (B, T, n_mels) log-mel -> (B, T * prod(factors)) wave."""

    in_channels: int = 80
    resblock_type: str = "1"
    resblock_dilation_sizes: Sequence = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    upsample_factors: Sequence[int] = (8, 8, 2, 2)

    @nn.compact
    def __call__(self, mel: Array) -> Array:
        x = nn.Conv(self.upsample_initial_channel, (7,), padding="SAME",
                    name="conv_pre")(mel)
        res_cls = ResBlock1 if self.resblock_type == "1" else ResBlock2
        num_kernels = len(self.resblock_kernel_sizes)
        for i, (f, k) in enumerate(zip(self.upsample_factors,
                                       self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU)
            # torch ConvTranspose1d(stride=f, kernel=k, padding=p) yields
            # (T-1)*f + k - 2p samples; flax explicit padding (a, b) yields
            # (T-1)*f + k - 2(k-1) + a + b, so torch p maps to a = b =
            # k - 1 - p (verified vs torch in tests/test_vocoder_golden.py)
            pad = k - 1 - (k - f) // 2
            x = nn.ConvTranspose(ch, (k,), strides=(f,),
                                 padding=[(pad, pad)],
                                 transpose_kernel=True,
                                 name=f"ups_{i}")(x)
            xs = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilation_sizes)):
                out = res_cls(channels=ch, kernel_size=rk,
                              dilation=tuple(rd),
                              name=f"resblocks_{i * num_kernels + j}")(x)
                xs = out if xs is None else xs + out
            x = xs / num_kernels
        x = nn.leaky_relu(x, LRELU)
        x = nn.Conv(1, (7,), padding="SAME", name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


def _fold_weight_norm(sd: Dict[str, "np.ndarray"], prefix: str):
    """weight_norm(g, v) -> kernel = g * v / ||v||_per-outchannel."""
    g = np.asarray(sd[prefix + ".weight_g"])
    v = np.asarray(sd[prefix + ".weight_v"])
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)),
                                keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def load_torch_hifigan(state_dict: Dict, config: Dict = None
                       ) -> Dict:
    """Convert a torch HiFi-GAN (SpeechBrain layout) state dict to flax
    params for :class:`HiFiGAN`. Accepts either raw or weight-normed keys.
    """
    config = {**HIFIGAN_DEFAULT_CONFIG, **(config or {})}
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def kernel(prefix, transpose=False):
        if prefix + ".weight_g" in sd:
            w = _fold_weight_norm(sd, prefix)
        else:
            w = sd[prefix + ".weight"]
        # torch conv1d (out, in, k) -> flax (k, in, out)
        # torch convT1d (in, out, k) -> flax transpose_kernel (k, out, in)
        if transpose:
            w = np.transpose(w, (2, 1, 0))  # (k, out, in)
            return w
        return np.transpose(w, (2, 1, 0))

    params: Dict = {}

    def put(name, prefix, transpose=False):
        params[name] = dict(kernel=jnp.asarray(kernel(prefix, transpose)),
                            bias=jnp.asarray(sd[prefix + ".bias"]))

    put("conv_pre", "conv_pre")
    put("conv_post", "conv_post")
    n_up = len(config["upsample_factors"])
    for i in range(n_up):
        put(f"ups_{i}", f"ups.{i}", transpose=True)
    num_kernels = len(config["resblock_kernel_sizes"])
    for r in range(n_up * num_kernels):
        block: Dict = {}
        if config["resblock_type"] == "1":
            for j in range(len(config["resblock_dilation_sizes"][0])):
                for which in ("convs1", "convs2"):
                    prefix = f"resblocks.{r}.{which}.{j}"
                    block[f"{which}_{j}"] = dict(
                        kernel=jnp.asarray(kernel(prefix)),
                        bias=jnp.asarray(sd[prefix + ".bias"]))
        else:
            for j in range(len(config["resblock_dilation_sizes"][0])):
                prefix = f"resblocks.{r}.convs.{j}"
                block[f"convs_{j}"] = dict(
                    kernel=jnp.asarray(kernel(prefix)),
                    bias=jnp.asarray(sd[prefix + ".bias"]))
        params[f"resblocks_{r}"] = block
    return {"params": params}


def load_hifigan_vocoder(checkpoint_path: str, config: Dict = None):
    """Load a local torch HiFi-GAN checkpoint (.pt/.pth/.ckpt).

    The reference downloads speechbrain/tts-hifigan-* from the HF hub
    (hifigan.py:234-303); this environment has no egress, so the checkpoint
    must be local. Returns (model, variables).
    """
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu",
                    weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    sd = {k.replace("generator.", ""): v.numpy() for k, v in sd.items()}
    config = {**HIFIGAN_DEFAULT_CONFIG, **(config or {})}
    model = HiFiGAN(**config)
    return model, load_torch_hifigan(sd, config)
