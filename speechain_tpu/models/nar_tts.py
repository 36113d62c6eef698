"""FastSpeech2: non-autoregressive TTS with duration/pitch/energy variance
adaptors and length regulation.

Rebuild of reference ``speechain/model/nar_tts.py:29-1200`` +
``module/decoder/nar_tts.py:20-502``:

- TTSEncoder (shared with AR-TTS) -> speaker-embedding combination ->
  variance adaptors (Conv1dVarPredictor x3: duration in log domain with
  optional zero-gate, pitch, energy; nar_tts.py:316-436) -> length
  regulation -> Transformer-encoder-as-decoder over frames -> feat head +
  Conv1d postnet residual.
- mel/pitch/energy targets normalized by FeatureNormalization instances and
  reduction-grouped (decoder/nar_tts.py:250-305).
- teacher durations rescaled to sum to feat_len (decoder/nar_tts.py:328-333)
  then rounded/clamped by proc_duration (:206-232); frame-level pitch/energy
  averaged per-token by duration (:151-204).
- losses (model/nar_tts.py criterion_forward): L1 feat before/after, L2
  pitch/energy, L2 duration vs log(dur+1), optional gate BCE; duration-F1
  metric.

TPU deltas: length regulation is a static-shape gather — frame t of
utterance b reads token ``searchsorted(cumsum(dur[b]), t, 'right')``
(the reference's per-utterance ``repeat_interleave`` + pad loop,
decoder/nar_tts.py:438-472, is host-sequential); per-token averaging uses
segment sums from a cumsum instead of an O(L*T) mask-gather (:151-204).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechain_tpu.models.ar_tts import TTSEncoder
from speechain_tpu.nn.postnets import Conv1dPostnet
from speechain_tpu.nn.prenets import (
    Conv1dVarPredictor,
    ScalarEmbedConv,
    SpeakerEmbedPrenet,
)
from speechain_tpu.nn.transformer import TransformerEncoder
from speechain_tpu.ops._feat_norm_module import FeatNormModule
from speechain_tpu.ops.feat_norm import FeatNormConfig
from speechain_tpu.ops.frontend import (
    FrontendConfig,
    _frontend_impl,
    dft_filterbank,
    hann_window,
    to_float_wave,
    mel_filterbank,
)
from speechain_tpu.train import criteria
from speechain_tpu.utils.masks import make_mask_from_len

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class FastSpeech2Config:
    vocab_size: int
    frontend: FrontendConfig = FrontendConfig(
        n_mels=80, win_length=0.05, hop_length=0.0125, fmin=125.0,
        fmax=7600.0, return_energy=True)
    feat_norm: Optional[FeatNormConfig] = None
    pitch_norm: Optional[FeatNormConfig] = None
    energy_norm: Optional[FeatNormConfig] = None
    reduction_factor: int = 1
    enc_emb: Dict[str, Any] = dataclasses.field(default_factory=dict)
    enc_prenet: Dict[str, Any] = dataclasses.field(default_factory=dict)
    encoder: Dict[str, Any] = dataclasses.field(default_factory=dict)
    duration_predictor: Dict[str, Any] = dataclasses.field(default_factory=dict)
    pitch_predictor: Dict[str, Any] = dataclasses.field(default_factory=dict)
    energy_predictor: Dict[str, Any] = dataclasses.field(default_factory=dict)
    decoder: Dict[str, Any] = dataclasses.field(default_factory=dict)
    postnet: Dict[str, Any] = dataclasses.field(default_factory=dict)
    spk_emb: Optional[Dict[str, Any]] = None
    feat_loss_type: str = "L1"
    max_frame_len: int = 2048       # static length-regulation output cap
    dtype: Any = jnp.float32


def average_scalar_by_duration(frame_scalar: Array, duration: Array
                               ) -> Array:
    """Per-token mean of a frame-level scalar (decoder/nar_tts.py:151-204).

    frame_scalar (B, T); duration (B, L) int frames per token ->
    token_scalar (B, L).
    """
    csum = jnp.cumsum(
        jnp.pad(frame_scalar, ((0, 0), (1, 0))), axis=1)        # (B, T+1)
    ends = jnp.cumsum(duration, axis=1).astype(jnp.int32)       # (B, L)
    starts = jnp.pad(ends, ((0, 0), (1, 0)))[:, :-1]
    T = frame_scalar.shape[1]
    ends_c = jnp.clip(ends, 0, T)
    starts_c = jnp.clip(starts, 0, T)
    seg_sum = (jnp.take_along_axis(csum, ends_c, 1)
               - jnp.take_along_axis(csum, starts_c, 1))
    cnt = (ends_c - starts_c).astype(frame_scalar.dtype)
    return seg_sum / (cnt + 1e-10)


def length_regulate(enc_text: Array, duration: Array, max_frames: int
                    ) -> Tuple[Array, Array]:
    """Expand token encodings by integer durations with a static output cap.

    The reference repeat_interleaves per utterance then pads/cuts
    (decoder/nar_tts.py:438-472); here frame t gathers token
    searchsorted(cumsum(dur), t, 'right'), frames beyond the total are
    zeroed. Returns (frames (B, max_frames, D), frame_len (B,)).
    """
    ends = jnp.cumsum(duration, axis=1)                          # (B, L)
    total = ends[:, -1].astype(jnp.int32)

    def one(utt_enc, utt_ends):
        t = jnp.arange(max_frames)
        tok = jnp.searchsorted(utt_ends, t, side="right")
        tok = jnp.clip(tok, 0, utt_enc.shape[0] - 1)
        return utt_enc[tok]

    frames = jax.vmap(one)(enc_text, ends)                       # (B, F, D)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, max_frames, 1), 1)
    frame_len = jnp.minimum(total, max_frames)
    frames = jnp.where(pos < frame_len[:, None, None], frames, 0.0)
    return frames, frame_len


def proc_duration(duration: Array, reduction_factor: int = 1,
                  min_frame_num: int = 0,
                  max_frame_num: Optional[int] = None,
                  duration_alpha: Optional[Array] = None,
                  train: bool = True) -> Array:
    """Round/clamp a real-valued duration sequence
    (decoder/nar_tts.py:206-232): exact zeros stay zero, others clamp to
    [min_frame_num/r, max_frame_num/r]."""
    if not train and duration_alpha is not None:
        duration = duration * duration_alpha
    duration = jnp.clip(jnp.round(duration), min=0)
    zero = duration == 0
    lo = round(min_frame_num / reduction_factor)
    hi = (None if max_frame_num is None
          else round(max_frame_num / reduction_factor))
    duration = jnp.clip(duration, min=lo, max=hi)
    return jnp.where(zero, 0.0, duration)


class FastSpeech2Net(nn.Module):
    cfg: FastSpeech2Config
    bn_axis_name: Optional[str] = None

    def setup(self):
        c = self.cfg
        self.encoder_mod = TTSEncoder(
            vocab_size=c.vocab_size, emb=c.enc_emb,
            prenet=c.enc_prenet or None, encoder=c.encoder, dtype=c.dtype,
            bn_axis_name=self.bn_axis_name, name="encoder")
        if c.spk_emb is not None:
            d_model = c.encoder.get("d_model", 512)
            self.spk_emb_mod = SpeakerEmbedPrenet(
                d_model=d_model, dtype=c.dtype, name="spk_emb", **c.spk_emb)
        self.duration_predictor = Conv1dVarPredictor(
            dtype=c.dtype, name="duration_predictor", **c.duration_predictor)
        self.pitch_predictor = Conv1dVarPredictor(
            dtype=c.dtype, name="pitch_predictor", **c.pitch_predictor)
        self.energy_predictor = Conv1dVarPredictor(
            dtype=c.dtype, name="energy_predictor", **c.energy_predictor)
        d_model = c.encoder.get("d_model", 512)
        self.pitch_embed = ScalarEmbedConv(out_dim=d_model, dtype=c.dtype,
                                           name="pitch_embed")
        self.energy_embed = ScalarEmbedConv(out_dim=d_model, dtype=c.dtype,
                                            name="energy_embed")
        self.decoder = TransformerEncoder(dtype=c.dtype, name="decoder",
                                          **c.decoder)
        self.feat_dim = c.frontend.n_mels * c.reduction_factor
        self.feat_pred = nn.Dense(self.feat_dim, dtype=c.dtype,
                                  name="feat_pred")
        self.postnet = Conv1dPostnet(feat_dim=self.feat_dim, dtype=c.dtype,
                                     bn_axis_name=self.bn_axis_name,
                                     name="postnet", **c.postnet)
        if c.feat_norm is not None:
            self.feat_norm_mod = FeatNormModule(cfg=c.feat_norm,
                                                name="feat_norm")
        if c.pitch_norm is not None:
            self.pitch_norm_mod = FeatNormModule(cfg=c.pitch_norm,
                                                 name="pitch_norm")
        if c.energy_norm is not None:
            self.energy_norm_mod = FeatNormModule(cfg=c.energy_norm,
                                                  name="energy_norm")

    def _reduce_group(self, x: Array, x_len: Array, mean: bool):
        r = self.cfg.reduction_factor
        if r <= 1:
            return x, x_len
        B = x.shape[0]
        T_r = (x.shape[1] // r) * r
        if x.ndim == 3:
            x = x[:, :T_r].reshape(B, T_r // r, x.shape[-1] * r)
        else:
            x = x[:, :T_r].reshape(B, T_r // r, r)
            x = x.mean(-1) if mean else x
        return x, x_len // r

    def prepare_targets(self, feat, feat_len, pitch, pitch_len, *,
                        train=False, epoch=None, group_ids=None,
                        axis_name=None):
        """waveform -> normalized mel + energy; normalize pitch; group by
        reduction factor (decoder/nar_tts.py:250-305)."""
        c = self.cfg
        energy = energy_len = None
        if feat is not None and feat.ndim == 3 and feat.shape[-1] == 1:
            f = c.frontend
            basis = jnp.asarray(dft_filterbank(
                f.fft, hann_window(f.win), f.onesided, f.normalized))
            mel_fb = jnp.asarray(mel_filterbank(
                f.n_freqs, f.n_mels, f.sr, f.fmin, f.fmax, f.mel_scale,
                f.mel_norm))
            feat, feat_len, energy, energy_len = _frontend_impl(
                to_float_wave(feat[..., 0]), feat_len, basis, mel_fb, f)
        if feat is not None and c.feat_norm is not None:
            feat, feat_len = self.feat_norm_mod(
                feat, feat_len, train=train, epoch=epoch,
                group_ids=group_ids, axis_name=axis_name)
        if pitch is not None and c.pitch_norm is not None:
            pitch, pitch_len = self.pitch_norm_mod(
                pitch, pitch_len, train=train, epoch=epoch,
                group_ids=group_ids, axis_name=axis_name)
        if energy is not None and c.energy_norm is not None:
            energy, energy_len = self.energy_norm_mod(
                energy, energy_len, train=train, epoch=epoch,
                group_ids=group_ids, axis_name=axis_name)
        if feat is not None:
            feat, feat_len = self._reduce_group(feat, feat_len, mean=False)
        if pitch is not None:
            pitch, pitch_len = self._reduce_group(pitch, pitch_len, mean=True)
        if energy is not None:
            energy, energy_len = self._reduce_group(energy, energy_len,
                                                    mean=True)
        return feat, feat_len, pitch, pitch_len, energy, energy_len

    def __call__(self, text: Array, text_len: Array,
                 feat: Optional[Array] = None,
                 feat_len: Optional[Array] = None,
                 pitch: Optional[Array] = None,
                 pitch_len: Optional[Array] = None,
                 duration: Optional[Array] = None,
                 duration_len: Optional[Array] = None,
                 spk_feat: Optional[Array] = None,
                 spk_ids: Optional[Array] = None, *,
                 train: bool = False, epoch: Optional[Array] = None,
                 axis_name: Optional[str] = None,
                 min_frame_num: int = 0,
                 max_frame_num: Optional[int] = None,
                 duration_alpha: Optional[Array] = None,
                 pitch_alpha: Optional[Array] = None,
                 energy_alpha: Optional[Array] = None,
                 max_frames: Optional[int] = None) -> Dict[str, Array]:
        c = self.cfg
        enc_text, enc_len, enc_mask, _ = self.encoder_mod(
            text, text_len, train=train)
        if c.spk_emb is not None:
            embs = self.spk_emb_mod.embed(spk_ids=spk_ids, spk_feat=spk_feat)
            enc_text = self.spk_emb_mod.combine(enc_text, embs, where="enc")

        feat, feat_len, pitch, pitch_len, energy, energy_len = \
            self.prepare_targets(feat, feat_len, pitch, pitch_len,
                                 train=train, epoch=epoch,
                                 group_ids=spk_ids, axis_name=axis_name)

        pred_duration, pred_gate, _ = self.duration_predictor(
            enc_text, enc_len, train=train)
        if duration is not None:
            # rescale teacher durations to sum to feat_len (:328-333)
            dsum = jnp.sum(duration, -1, keepdims=True)
            scaled = duration / jnp.maximum(dsum, 1e-10) \
                * feat_len[:, None].astype(duration.dtype)
            used_duration = proc_duration(
                scaled, c.reduction_factor, min_frame_num, max_frame_num,
                duration_alpha, train=train)
        else:
            pd = pred_duration
            if pred_gate is not None:
                pd = jnp.where(pred_gate > 0, -jnp.inf, pd)
            used_duration = proc_duration(
                jnp.exp(pd) - 1.0, c.reduction_factor, min_frame_num,
                max_frame_num, duration_alpha, train=False)
            tok_mask = make_mask_from_len(enc_len, enc_text.shape[1])[:, 0]
            used_duration = jnp.where(tok_mask, used_duration, 0.0)

        pred_pitch, _, _ = self.pitch_predictor(enc_text, enc_len,
                                                train=train)
        if pitch is not None:
            pitch = average_scalar_by_duration(pitch, used_duration)
        used_pitch = pitch if train else pred_pitch
        if not train and pitch_alpha is not None:
            used_pitch = used_pitch * pitch_alpha
        emb_pitch = self.pitch_embed(used_pitch)

        pred_energy, _, _ = self.energy_predictor(enc_text, enc_len,
                                                  train=train)
        if energy is not None:
            energy = average_scalar_by_duration(energy, used_duration)
        used_energy = energy if train else pred_energy
        if not train and energy_alpha is not None:
            used_energy = used_energy * energy_alpha
        emb_energy = self.energy_embed(used_energy)

        enc_text = enc_text + emb_pitch + emb_energy

        F = max_frames or (feat.shape[1] if feat is not None
                           else c.max_frame_len)
        frames, frame_len = length_regulate(enc_text, used_duration, F)
        if feat_len is not None:
            frame_len = feat_len
        frame_mask = make_mask_from_len(frame_len, F)
        dec_feat, _, _, _ = self.decoder(frames, frame_mask, train=train)
        pred_before = self.feat_pred(dec_feat)
        pred_after = pred_before + self.postnet(pred_before, train=train)

        return dict(
            pred_before=pred_before, pred_after=pred_after,
            pred_feat_len=frame_len, tgt_feat=feat, tgt_feat_len=feat_len,
            pred_pitch=pred_pitch, tgt_pitch=pitch, tgt_pitch_len=enc_len,
            pred_energy=pred_energy, tgt_energy=energy,
            tgt_energy_len=enc_len, pred_duration=pred_duration,
            pred_duration_gate=pred_gate, used_duration=used_duration,
            tgt_duration_len=enc_len)

    def recover_feat(self, feat: Array, group_ids: Optional[Array] = None,
                     ungroup: bool = True) -> Array:
        """FastSpeech2 predictions stay in the grouped layout, so the
        default unfolds before denormalizing."""
        c = self.cfg
        if ungroup and c.reduction_factor > 1:
            B, T, D = feat.shape
            feat = feat.reshape(B, T * c.reduction_factor,
                                D // c.reduction_factor)
        if c.feat_norm is not None:
            feat = self.feat_norm_mod.recover(feat, group_ids=group_ids)
        return feat


def generate_ctrl_alpha(key, batch_size: int, token_len: int, *,
                        alpha: Optional[float] = None,
                        alpha_min: float = 0.8, alpha_max: float = 1.2,
                        granularity: str = "utterance") -> Array:
    """Controllable-TTS alpha generation (model/nar_tts.py:706-785).

    Returns a (B, L) multiplier for duration/pitch/energy: a fixed value,
    or random per-utterance / per-token draws in [alpha_min, alpha_max].
    """
    if alpha is not None:
        return jnp.full((batch_size, token_len), float(alpha))
    if granularity == "utterance":
        a = jax.random.uniform(key, (batch_size, 1),
                               minval=alpha_min, maxval=alpha_max)
        return jnp.broadcast_to(a, (batch_size, token_len))
    if granularity == "token":
        return jax.random.uniform(key, (batch_size, token_len),
                                  minval=alpha_min, maxval=alpha_max)
    raise ValueError(granularity)


def fastspeech2_loss(outputs: Dict[str, Array], tgt_duration: Array,
                     cfg: FastSpeech2Config,
                     reduction_factor: Optional[int] = None
                     ) -> Tuple[Array, Dict[str, Array]]:
    """criterion_forward (model/nar_tts.py:472-580)."""
    r = reduction_factor or cfg.reduction_factor
    fl, flen = outputs["tgt_feat"], outputs["tgt_feat_len"]
    fb = criteria.least_error(outputs["pred_before"], fl, flen,
                              loss_type=cfg.feat_loss_type)
    fa = criteria.least_error(outputs["pred_after"], fl, flen,
                              loss_type=cfg.feat_loss_type)
    pl = criteria.least_error(outputs["pred_pitch"], outputs["tgt_pitch"],
                              outputs["tgt_pitch_len"], loss_type="L2")
    el = criteria.least_error(outputs["pred_energy"], outputs["tgt_energy"],
                              outputs["tgt_energy_len"], loss_type="L2")
    dl = criteria.least_error(
        outputs["pred_duration"],
        jnp.log(tgt_duration.astype(jnp.float32) + 1.0),
        outputs["tgt_duration_len"], loss_type="L2")
    loss = fb + fa + pl + el + dl
    metrics = dict(feat_loss_before=fb, feat_loss_after=fa, pitch_loss=pl,
                   energy_loss=el, duration_loss=dl)
    gate_tgt = (tgt_duration == 0).astype(jnp.int32)
    pred_zero = (proc_duration(jnp.exp(outputs["pred_duration"]) - 1.0, r)
                 == 0).astype(jnp.int32)
    metrics["duration_f1"] = criteria.fbeta_score(
        pred_zero, gate_tgt, outputs["tgt_duration_len"], beta=1.0)
    if outputs.get("pred_duration_gate") is not None:
        gl = criteria.bce_logits(outputs["pred_duration_gate"],
                                 gate_tgt.astype(jnp.float32),
                                 outputs["tgt_duration_len"], pos_weight=1.0)
        loss = loss + gl
        metrics["duration_gate_loss"] = gl
    metrics["loss"] = loss
    return loss, metrics
