"""Autoregressive Transformer-TTS: text encoder + mel decoder with stop
prediction and Tacotron2-style postnet.

Rebuild of reference ``speechain/model/ar_tts.py:36-976`` +
``module/encoder/tts.py:20-87`` + ``module/decoder/ar_tts.py:24-213``:

- TTSEncoder: token embedding -> (Conv1d) prenet -> Transformer encoder.
- ARTTSDecoder: fp32 mel frontend + feature normalization (speaker-grouped
  stats supported) -> reduction-factor grouping (time/r, dim*r,
  ar_tts.py:134-149) -> shift-right with a zero frame (:151-155) -> Linear
  prenet (dropout stays ON at inference, :202-213) -> speaker-embedding
  combination -> Transformer decoder (cross-attending the text encoding) ->
  feat_pred + stop_pred Linears -> Conv1d postnet residual (:184-189).
- losses (ar_tts.py:449-550): LeastError on before+after-postnet features,
  pos-weighted BCE stop loss, optional attention guidance; metrics
  stop-accuracy and F2.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechain_tpu.nn.postnets import Conv1dPostnet
from speechain_tpu.nn.prenets import (
    Conv1dPrenet,
    EmbedPrenet,
    LinearPrenet,
    SpeakerEmbedPrenet,
)
from speechain_tpu.nn.transformer import TransformerDecoder, TransformerEncoder
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
class ARTTSConfig:
    vocab_size: int
    frontend: FrontendConfig = FrontendConfig(
        n_mels=80, win_length=0.05, hop_length=0.0125, fmin=125.0,
        fmax=7600.0)
    feat_norm: Optional[FeatNormConfig] = None
    reduction_factor: int = 1
    enc_emb: Dict[str, Any] = dataclasses.field(default_factory=dict)
    enc_prenet: Dict[str, Any] = dataclasses.field(default_factory=dict)
    encoder: Dict[str, Any] = dataclasses.field(default_factory=dict)
    dec_prenet: Dict[str, Any] = dataclasses.field(
        default_factory=lambda: dict(lnr_dims=[256, 256], lnr_dropout=0.5))
    decoder: Dict[str, Any] = dataclasses.field(default_factory=dict)
    postnet: Dict[str, Any] = dataclasses.field(default_factory=dict)
    spk_emb: Optional[Dict[str, Any]] = None
    stop_pos_weight: float = 5.0
    feat_loss_type: str = "L2"
    att_guid_sigma: float = 0.0
    dtype: Any = jnp.float32


class TTSEncoder(nn.Module):
    """Token embedding -> optional Conv1d prenet -> transformer encoder
    (encoder/tts.py:20-87). Shared by AR-TTS and FastSpeech2."""

    vocab_size: int
    emb: Dict[str, Any]
    prenet: Optional[Dict[str, Any]]
    encoder: Dict[str, Any]
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, text: Array, text_len: Array, *, train: bool = False,
                 return_attmat: bool = False):
        x = EmbedPrenet(vocab_size=self.vocab_size, dtype=self.dtype,
                        name="embedding", **self.emb)(text)
        if self.prenet is not None:
            x, text_len = Conv1dPrenet(
                dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                name="prenet", **self.prenet)(x, text_len, train=train)
        mask = make_mask_from_len(text_len, x.shape[1])
        out, mask, attmats, _ = TransformerEncoder(
            dtype=self.dtype, name="encoder", **self.encoder)(
            x, mask, train=train, return_attmat=return_attmat)
        return out, text_len, mask, attmats


class ARTTSNet(nn.Module):
    """The jit-compiled AR-TTS network."""

    cfg: ARTTSConfig
    bn_axis_name: Optional[str] = None

    def setup(self):
        c = self.cfg
        self.encoder_mod = TTSEncoder(
            vocab_size=c.vocab_size, emb=c.enc_emb,
            prenet=c.enc_prenet or None, encoder=c.encoder,
            dtype=c.dtype, bn_axis_name=self.bn_axis_name, name="encoder")
        if c.feat_norm is not None:
            self.feat_norm_mod = FeatNormModule(cfg=c.feat_norm,
                                                name="feat_norm")
        self.dec_prenet = LinearPrenet(dtype=c.dtype, name="dec_prenet",
                                       **c.dec_prenet)
        # the reference decoder's width is dictated by its INPUT, not its
        # conf d_model (transformer/decoder.py:247-249 overrides d_model with
        # input_size = prenet output) — Transformer-TTS runs the decoder at
        # the prenet width even when conf says otherwise
        prenet_out = LinearPrenet.output_size(c.dec_prenet["lnr_dims"])
        dec_conf = dict(c.decoder)
        dec_conf["d_model"] = prenet_out
        if c.spk_emb is not None:
            self.spk_emb_mod = SpeakerEmbedPrenet(
                d_model=prenet_out, dtype=c.dtype, name="spk_emb",
                **c.spk_emb)
        self.decoder = TransformerDecoder(dtype=c.dtype, name="decoder",
                                          **dec_conf)
        self.feat_dim = c.frontend.n_mels * c.reduction_factor
        self.feat_pred = nn.Dense(self.feat_dim, dtype=c.dtype,
                                  name="feat_pred")
        self.stop_pred = nn.Dense(1, dtype=c.dtype, name="stop_pred")
        self.postnet = Conv1dPostnet(feat_dim=self.feat_dim, dtype=c.dtype,
                                     bn_axis_name=self.bn_axis_name,
                                     name="postnet", **c.postnet)

    # ---------------- feature target preparation ------------------------
    def prepare_targets(self, feat: Array, feat_len: Array, *,
                        train: bool = False, epoch: Optional[Array] = None,
                        group_ids: Optional[Array] = None,
                        axis_name: Optional[str] = None):
        """waveform/mel -> normalized, reduction-grouped target features."""
        c = self.cfg
        if feat.ndim == 3 and feat.shape[-1] == 1:
            cfgf = c.frontend
            basis = jnp.asarray(dft_filterbank(
                cfgf.fft, hann_window(cfgf.win), cfgf.onesided,
                cfgf.normalized))
            mel_fb = jnp.asarray(mel_filterbank(
                cfgf.n_freqs, cfgf.n_mels, cfgf.sr, cfgf.fmin, cfgf.fmax,
                cfgf.mel_scale, cfgf.mel_norm))
            feat, feat_len, _, _ = _frontend_impl(
                to_float_wave(feat[..., 0]), feat_len, basis, mel_fb,
                cfgf)
        if c.feat_norm is not None:
            feat, feat_len = self.feat_norm_mod(
                feat, feat_len, train=train, epoch=epoch,
                group_ids=group_ids, axis_name=axis_name)
        r = c.reduction_factor
        if r > 1:
            B, T, D = feat.shape
            T_r = (T // r) * r
            feat = feat[:, :T_r].reshape(B, T_r // r, D * r)
            feat_len = feat_len // r
        return feat, feat_len

    def decode(self, enc_text: Array, enc_mask: Array, feat: Array,
               feat_len: Array, *, spk_feat: Optional[Array] = None,
               spk_ids: Optional[Array] = None, train: bool = False,
               return_attmat: bool = False):
        """Teacher-forced decoder pass over already-grouped features.

        feat here is the shift-right INPUT (zero first frame prepended by
        the caller or by :meth:`__call__`).
        """
        c = self.cfg
        # decoder prenet dropout stays on even at inference
        # (decoder/ar_tts.py:202-213 turn_on_dropout)
        x, _ = self.dec_prenet(feat, feat_len, train=True)
        if c.spk_emb is not None:
            embs = self.spk_emb_mod.embed(spk_ids=spk_ids, spk_feat=spk_feat)
            enc_text = self.spk_emb_mod.combine(enc_text, embs, where="enc")
            if self.spk_emb_mod.use_dec_comb:
                x = self.spk_emb_mod.combine(x, embs, where="dec")
        feat_mask = make_mask_from_len(feat_len, x.shape[1])
        dec_feat, self_att, cross_att, _ = self.decoder(
            x, enc_text, feat_mask, enc_mask, train=train,
            return_attmat=return_attmat or c.att_guid_sigma > 0.0)
        pred_stop = self.stop_pred(dec_feat)[..., 0]
        pred_before = self.feat_pred(dec_feat)
        pred_after = pred_before + self.postnet(pred_before, train=train)
        return pred_stop, pred_before, pred_after, self_att, cross_att

    def __call__(self, text: Array, text_len: Array, feat: Array,
                 feat_len: Array, *, spk_feat: Optional[Array] = None,
                 spk_ids: Optional[Array] = None, train: bool = False,
                 epoch: Optional[Array] = None,
                 axis_name: Optional[str] = None,
                 return_att: bool = False) -> Dict[str, Array]:
        enc_text, _, enc_mask, _ = self.encoder_mod(
            text, text_len, train=train)
        tgt_feat, tgt_len = self.prepare_targets(
            feat, feat_len, train=train, epoch=epoch, group_ids=spk_ids,
            axis_name=axis_name)
        # shift-right: zero frame first (decoder/ar_tts.py:151-155)
        dec_in = jnp.pad(tgt_feat, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        pred_stop, pred_before, pred_after, self_att, cross_att = self.decode(
            enc_text, enc_mask, dec_in, tgt_len, spk_feat=spk_feat,
            spk_ids=spk_ids, train=train, return_attmat=return_att)
        out = dict(pred_stop=pred_stop, pred_before=pred_before,
                   pred_after=pred_after, tgt_feat=tgt_feat,
                   tgt_feat_len=tgt_len, text_len=text_len)
        if cross_att:
            out["cross_att"] = cross_att[0]
        if return_att:
            # full per-layer lists for validation visualization (the
            # reference returns every decoder layer's matrices from its
            # model_forward, model/ar_tts.py:430-447)
            out["dec_self_att"] = self_att
            out["dec_cross_att"] = cross_att
        return out

    def encode_text(self, text: Array, text_len: Array, *,
                    spk_feat: Optional[Array] = None,
                    spk_ids: Optional[Array] = None):
        """Encoder pass + speaker combination, for the inference driver."""
        enc_text, _, enc_mask, _ = self.encoder_mod(text, text_len,
                                                    train=False)
        if self.cfg.spk_emb is not None:
            embs = self.spk_emb_mod.embed(spk_ids=spk_ids, spk_feat=spk_feat)
            enc_text = self.spk_emb_mod.combine(enc_text, embs, where="enc")
        return enc_text, enc_mask

    def decode_step(self, feat_frame: Array, enc_text: Array,
                    enc_mask: Array, *, spk_feat: Optional[Array] = None,
                    spk_ids: Optional[Array] = None, prime: bool = False,
                    cache_capacity: Optional[int] = None):
        """Single-step KV-cached AR mel decoding. feat_frame (B, 1, D*r).

        enc_text must already include the speaker combination
        (:meth:`encode_text`); the dec-side combination happens here.
        Returns (stop_logit (B, 1), feat_before (B, 1, D*r)).
        """
        c = self.cfg
        x, _ = self.dec_prenet(feat_frame, None, train=True)
        if c.spk_emb is not None and self.spk_emb_mod.use_dec_comb:
            embs = self.spk_emb_mod.embed(spk_ids=spk_ids, spk_feat=spk_feat)
            x = self.spk_emb_mod.combine(x, embs, where="dec")
        dec_feat, *_ = self.decoder(x, enc_text, None, enc_mask, decode=True,
                                    prime=prime,
                                    cache_capacity=cache_capacity)
        return (self.stop_pred(dec_feat)[..., 0],
                self.feat_pred(dec_feat))

    def apply_postnet(self, pred_before: Array) -> Array:
        """Postnet residual over a (possibly partial) sequence."""
        return pred_before + self.postnet(pred_before, train=False)

    def recover_feat(self, feat: Array, group_ids: Optional[Array] = None,
                     ungroup: bool = False) -> Array:
        """Denormalize predicted features for vocoding (ar_tts.py:888-890).

        ungroup=True additionally unfolds the reduction-factor grouping —
        only for features still in the grouped (T/r, D*r) layout;
        ``tts_auto_regression`` outputs are already unfolded
        (tts_decoding.py:119-126)."""
        c = self.cfg
        if ungroup and c.reduction_factor > 1:
            B, T, D = feat.shape
            feat = feat.reshape(B, T * c.reduction_factor,
                                D // c.reduction_factor)
        if c.feat_norm is not None:
            feat = self.feat_norm_mod.recover(feat, group_ids=group_ids)
        return feat


def artts_loss(outputs: Dict[str, Array], cfg: ARTTSConfig
               ) -> Tuple[Array, Dict[str, Array]]:
    """criterion_forward (ar_tts.py:449-550)."""
    tgt, tgt_len = outputs["tgt_feat"], outputs["tgt_feat_len"]
    fb = criteria.least_error(outputs["pred_before"], tgt, tgt_len,
                              loss_type=cfg.feat_loss_type)
    fa = criteria.least_error(outputs["pred_after"], tgt, tgt_len,
                              loss_type=cfg.feat_loss_type)
    # stop flags: 1 at the last valid frame of each utterance
    T = tgt.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    stop_tgt = (pos == (tgt_len - 1)[:, None]).astype(jnp.float32)
    stop = criteria.bce_logits(outputs["pred_stop"], stop_tgt, tgt_len,
                               pos_weight=cfg.stop_pos_weight)
    loss = fb + fa + stop
    metrics = dict(feat_loss_before=fb, feat_loss_after=fa, stop_loss=stop)
    if cfg.att_guid_sigma > 0.0 and "cross_att" in outputs:
        ag = criteria.attention_guidance(
            outputs["cross_att"], tgt_len, outputs["text_len"],
            sigma=cfg.att_guid_sigma)
        loss = loss + ag
        metrics["att_guid_loss"] = ag
    pred_bin = (jax.nn.sigmoid(
        outputs["pred_stop"].astype(jnp.float32)) > 0.5).astype(jnp.int32)
    metrics["stop_accuracy"] = criteria.stop_accuracy(
        outputs["pred_stop"], stop_tgt, tgt_len)
    metrics["stop_f2"] = criteria.fbeta_score(
        pred_bin, stop_tgt.astype(jnp.int32), tgt_len, beta=2.0)
    metrics["loss"] = loss
    return loss, metrics
