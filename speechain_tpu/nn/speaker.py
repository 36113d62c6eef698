"""Speaker encoders: ECAPA-TDNN and x-vector (192-d embeddings).

Rebuild of reference ``module/encoder/speaker.py:7-116`` in flax.
Inference-only: used for offline speaker-feature extraction
(utilbox/spk_util.py:18 driver) and speaker-similarity evaluation
(recipes/tts/spk_sim_evaluation.py:43). Input is (B, T, n_mels) log-mel;
output L2-normalized (B, 192).

All convs channels-last; BatchNorm in inference (running-average) mode —
local checkpoints supply the statistics; random init is only for shape
tests, exactly like the reference's in-repo copies.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class SEModule(nn.Module):
    """Squeeze-and-excitation over the channel axis (speaker.py:7-19)."""

    channels: int
    bottleneck: int = 128

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = jnp.mean(x, axis=1, keepdims=True)            # (B, 1, C)
        s = nn.Conv(self.bottleneck, (1,), name="se_fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Conv(self.channels, (1,), name="se_fc2")(s)
        return x * jax.nn.sigmoid(s)


class Res2Block(nn.Module):
    """Res2Net split-conv block (speaker.py:22-44).

    Faithful to the reference's exact (idiosyncratic) dataflow: the conv
    chain feeds each conv the previous CONV output (not conv+split), and
    the output concatenates the first ``scale`` entries of the INTERLEAVED
    list [s0, c0, s1, c1, ...] (speaker.py:38-43's double append + the
    ``outputs[:scale]`` truncation) — required for checkpoint-level parity
    with reference ``encoder.pth`` state dicts (see load_torch_speaker).
    """

    channels: int
    kernel_size: int = 3
    scale: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        width = self.channels // self.scale
        splits = [x[..., i * width:(i + 1) * width]
                  for i in range(self.scale)]
        out = splits[0]
        outputs = [out]
        for i in range(self.scale - 1):
            out = jax.nn.relu(out)
            out = nn.Conv(width, (self.kernel_size,), padding="SAME",
                          name=f"conv_{i}")(out)
            outputs.append(out)
            outputs.append(splits[i + 1])
        return x + jnp.concatenate(outputs[: self.scale], axis=-1)


class EncoderClassifier(nn.Module):
    """ECAPA / x-vector encoder (speaker.py:46-110)."""

    model_type: str = "ecapa"

    @nn.compact
    def __call__(self, feat: Array,
                 feat_len: Optional[Array] = None) -> Array:
        def masked_mean(x):
            if feat_len is None:
                return jnp.mean(x, axis=1)
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1], 1), 1)
            valid = (pos < feat_len[:, None, None]).astype(x.dtype)
            return (jnp.sum(x * valid, 1)
                    / jnp.maximum(jnp.sum(valid, 1), 1.0))

        bn = lambda name: nn.BatchNorm(use_running_average=True, name=name)
        if self.model_type == "ecapa":
            ch = 512
            x = nn.Conv(ch, (7,), padding="SAME", name="conv1")(feat)
            x = bn("bn1")(x)
            x = jax.nn.relu(x)
            x = Res2Block(channels=ch, name="res2block")(x)
            x = SEModule(channels=ch, name="se")(x)
            x = bn("bn2")(x)
            x = masked_mean(x)
            emb = nn.Dense(192, name="fc")(x)
        elif self.model_type == "xvector":
            x = feat
            for i, k in enumerate((5, 3, 3)):
                x = nn.Conv(512, (k,), padding="SAME", name=f"tdnn{i}")(x)
                x = bn(f"bn{i}")(x)
                x = jax.nn.relu(x)
            x = masked_mean(x)
            x = jax.nn.relu(nn.Dense(512, name="fc1")(x))
            emb = nn.Dense(192, name="fc2")(x)
        else:
            raise ValueError(self.model_type)
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)


def extract_spk_feat(model_type: str, variables, feat: Array,
                     feat_len: Optional[Array] = None) -> Array:
    """Batch speaker embedding extraction (utilbox/spk_util.py:18)."""
    model = EncoderClassifier(model_type=model_type)
    return model.apply(variables, feat, feat_len)


def speaker_cosine_similarity(emb_a: Array, emb_b: Array) -> Array:
    """Cosine similarity of L2-normalized embeddings
    (spk_sim_evaluation.py:43)."""
    return jnp.sum(emb_a * emb_b, axis=-1)


# --------------------------------------------------------------------------
# Pretrained-checkpoint interop: torch state dict -> flax variables.
# Mirrors nn/vocoder_hifigan.py::load_torch_hifigan. The reference loads
# ``encoder.pth`` state dicts saved from ITS OWN torch EncoderClassifier
# (speaker.py:97-116 from_hparams -> load_state_dict), whose nn.Sequential
# key layout ('model.0.weight', 'model.3.0.convs.{i}.weight', ...) is what
# these remaps consume.
# --------------------------------------------------------------------------

def load_torch_speaker(state_dict, model_type: str = "ecapa"):
    """Convert a torch EncoderClassifier state dict (reference
    speaker.py:46-95 nn.Sequential layout) to flax variables for
    :class:`EncoderClassifier`.

    torch Conv1d kernels are (out, in, k) -> flax (k, in, out); Linear
    weights (out, in) -> (in, out); BatchNorm1d weight/bias map to
    scale/bias in 'params' and running_mean/var to mean/var in
    'batch_stats'.
    """
    import numpy as np
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv(prefix):
        return dict(kernel=jnp.asarray(np.transpose(
            sd[prefix + ".weight"], (2, 1, 0))),
            bias=jnp.asarray(sd[prefix + ".bias"]))

    def linear(prefix):
        return dict(kernel=jnp.asarray(sd[prefix + ".weight"].T),
                    bias=jnp.asarray(sd[prefix + ".bias"]))

    def bn_params(prefix):
        return dict(scale=jnp.asarray(sd[prefix + ".weight"]),
                    bias=jnp.asarray(sd[prefix + ".bias"]))

    def bn_stats(prefix):
        return dict(mean=jnp.asarray(sd[prefix + ".running_mean"]),
                    var=jnp.asarray(sd[prefix + ".running_var"]))

    if model_type == "ecapa":
        n_convs = sum(1 for k in sd
                      if k.startswith("model.3.0.convs.")
                      and k.endswith(".weight"))
        params = {
            "conv1": conv("model.0"),
            "bn1": bn_params("model.1"),
            "res2block": {f"conv_{i}": conv(f"model.3.0.convs.{i}")
                          for i in range(n_convs)},
            "se": {"se_fc1": conv("model.3.1.se.1"),
                   "se_fc2": conv("model.3.1.se.3")},
            "bn2": bn_params("model.3.2"),
            "fc": linear("model.6"),
        }
        stats = {"bn1": bn_stats("model.1"), "bn2": bn_stats("model.3.2")}
    elif model_type == "xvector":
        params = {
            "tdnn0": conv("model.0"), "bn0": bn_params("model.1"),
            "tdnn1": conv("model.3"), "bn1": bn_params("model.4"),
            "tdnn2": conv("model.6"), "bn2": bn_params("model.7"),
            "fc1": linear("model.11"), "fc2": linear("model.13"),
        }
        stats = {"bn0": bn_stats("model.1"), "bn1": bn_stats("model.4"),
                 "bn2": bn_stats("model.7")}
    else:
        raise ValueError(model_type)
    return {"params": params, "batch_stats": stats}


def restore_speaker_variables(checkpoint: str, model_type: str = "ecapa"):
    """CLI-facing restore: accepts an orbax directory OR a torch
    .pt/.pth/.ckpt state dict (converted on the fly via
    :func:`load_torch_speaker`)."""
    import os
    if os.path.isfile(checkpoint) and checkpoint.endswith(
            (".pt", ".pth", ".ckpt")):
        return load_speaker_encoder(checkpoint, model_type)[1]
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer().restore(
        os.path.abspath(checkpoint), None)


def load_speaker_encoder(checkpoint_path: str, model_type: str = "ecapa"):
    """Load a local torch speaker-encoder checkpoint (.pt/.pth — the
    reference's ``encoder.pth``, speaker.py:108-113). Returns
    (model, variables). No-egress analog of the reference's from_hparams
    download path."""
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
          for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    model = EncoderClassifier(model_type=model_type)
    return model, load_torch_speaker(sd, model_type)
