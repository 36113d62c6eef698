"""Autoregressive attention ASR: (Conformer|Transformer) encoder +
Transformer decoder, with optional CTC head and internal-LM branch.

Rebuild of reference ``speechain/model/ar_asr.py:37-1041`` +
``module/encoder/asr.py`` + ``module/decoder/ar_asr.py``:

- ASREncoder pipeline (encoder/asr.py:83-130): waveform detection by
  trailing dim == 1, fp32 frontend (torch runs it under autocast(False);
  here the frontend math is fp32 with HIGHEST-precision matmuls), feature
  normalization (running stats in the 'norm_stats' collection), SpecAugment
  (training only, PRNG-keyed), Conv2d prenet, encoder stack.
- ARASRDecoder (decoder/ar_asr.py:17-78): embedding -> Transformer decoder
  -> token postnet.
- optional CTC head on encoder output (model/ar_asr.py:221-228, 453-458);
- optional internal-LM branch = decoder over zeroed encoder features
  (model/ar_asr.py:419-450);
- criterion_forward: label-smoothed CE + weighted CTC + ILM CE + attention
  guidance; metrics accuracy (model/ar_asr.py:517-600).

TPU deltas: everything is one jitted function over static-shape buckets; the
train step mutates 'norm_stats'/'batch_stats' collections; decoding uses the
KV-cached decoder (see infer/beam_search.py) instead of full-prefix
recomputation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechain_tpu.nn.conformer import ConformerEncoder
from speechain_tpu.nn.postnets import TokenPostnet
from speechain_tpu.nn.prenets import Conv2dPrenet, EmbedPrenet
from speechain_tpu.nn.transformer import TransformerDecoder, TransformerEncoder
from speechain_tpu.ops.feat_norm import (
    FeatNormConfig,
    apply_feat_norm,
    init_stats,
)
from speechain_tpu.ops.frontend import FrontendConfig, compute_logmel, to_float_wave
from speechain_tpu.ops.specaug import SpecAugmentConfig, spec_augment
from speechain_tpu.train import criteria
from speechain_tpu.utils.masks import make_mask_from_len

Array = jnp.ndarray


class ASRFrontend(nn.Module):
    """fp32 log-Mel frontend + feature normalization + SpecAugment.

    Wraps the pure kernels with flax state: running norm stats live in the
    'norm_stats' collection, SpecAugment keys come from the 'specaug' rng.
    """

    frontend: FrontendConfig
    feat_norm: Optional[FeatNormConfig] = None
    specaug: Optional[SpecAugmentConfig] = None

    @nn.compact
    def __call__(self, feat: Array, feat_len: Array, *, train: bool = False,
                 epoch: Optional[Array] = None,
                 group_ids: Optional[Array] = None,
                 axis_name: Optional[str] = None):
        cfg = self.frontend
        if feat.ndim == 3 and feat.shape[-1] == 1:
            # raw waveform -> log-Mel (encoder/asr.py:102-109); fused Pallas
            # kernel on TPU, XLA pipeline elsewhere
            wave = to_float_wave(feat[..., 0])
            feat, feat_len, _, _ = compute_logmel(wave, feat_len, cfg)
        if self.feat_norm is not None:
            stats = self.variable("norm_stats", "stats",
                                  lambda: init_stats(self.feat_norm))
            feat, feat_len, new_stats = apply_feat_norm(
                stats.value, feat, feat_len, self.feat_norm, train=train,
                epoch=epoch, group_ids=group_ids, axis_name=axis_name)
            if train and not self.is_initializing():
                stats.value = new_stats
        if train and self.specaug is not None:
            key = self.make_rng("specaug")
            feat = spec_augment(key, feat, feat_len, self.specaug)
        return feat, feat_len


# encoder/decoder types resolvable from module_conf 'type' strings
ENCODERS = {"transformer": TransformerEncoder, "conformer": ConformerEncoder}


@dataclasses.dataclass(frozen=True)
class ARASRConfig:
    vocab_size: int
    frontend: FrontendConfig = FrontendConfig()
    feat_norm: Optional[FeatNormConfig] = None
    specaug: Optional[SpecAugmentConfig] = None
    enc_prenet: Dict[str, Any] = dataclasses.field(default_factory=dict)
    encoder_type: str = "transformer"
    encoder: Dict[str, Any] = dataclasses.field(default_factory=dict)
    dec_emb: Dict[str, Any] = dataclasses.field(default_factory=dict)
    decoder: Dict[str, Any] = dataclasses.field(default_factory=dict)
    ctc_weight: float = 0.0
    ilm_weight: float = 0.0
    label_smoothing: float = 0.1
    att_guid_sigma: float = 0.0
    dtype: Any = jnp.float32

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _freeze(d: Optional[Dict]) -> Tuple:
    """Dict -> hashable tuple for flax module attributes."""
    if not d:
        return ()
    return tuple(sorted((k, (_freeze(v) if isinstance(v, dict) else
                             tuple(v) if isinstance(v, list) else v))
                        for k, v in d.items()))


def _thaw(t: Tuple) -> Dict:
    return {k: (dict(_thaw(v)) if v and isinstance(v, tuple)
                and all(isinstance(e, tuple) and len(e) == 2 for e in v)
                else (list(v) if isinstance(v, tuple) else v))
            for k, v in t}


class ARASRNet(nn.Module):
    """The jit-compiled ASR network."""

    cfg: ARASRConfig
    bn_axis_name: Optional[str] = None

    def setup(self):
        c = self.cfg
        self.frontend_mod = ASRFrontend(frontend=c.frontend,
                                        feat_norm=c.feat_norm,
                                        specaug=c.specaug,
                                        name="frontend")
        self.enc_prenet = Conv2dPrenet(
            dtype=c.dtype, bn_axis_name=self.bn_axis_name,
            name="enc_prenet", **c.enc_prenet)
        enc_cls = ENCODERS[c.encoder_type]
        enc_kwargs = dict(c.encoder)
        if c.encoder_type == "conformer":
            enc_kwargs["bn_axis_name"] = self.bn_axis_name
        self.encoder = enc_cls(dtype=c.dtype, name="encoder", **enc_kwargs)
        self.dec_emb = EmbedPrenet(vocab_size=c.vocab_size, dtype=c.dtype,
                                   name="dec_emb", **c.dec_emb)
        self.decoder = TransformerDecoder(dtype=c.dtype, name="decoder",
                                          **c.decoder)
        self.postnet = TokenPostnet(vocab_size=c.vocab_size, dtype=c.dtype,
                                    name="postnet")
        if c.ctc_weight > 0.0:
            self.ctc_head = TokenPostnet(vocab_size=c.vocab_size,
                                         dtype=c.dtype, name="ctc_head")

    def encode(self, feat: Array, feat_len: Array, *, train: bool = False,
               epoch: Optional[Array] = None,
               group_ids: Optional[Array] = None,
               axis_name: Optional[str] = None,
               return_attmat: bool = False):
        feat, feat_len = self.frontend_mod(feat, feat_len, train=train,
                                           epoch=epoch, group_ids=group_ids,
                                           axis_name=axis_name)
        feat = feat.astype(self.cfg.dtype)
        feat, feat_len = self.enc_prenet(feat, feat_len, train=train)
        mask = make_mask_from_len(feat_len, feat.shape[1])
        enc_feat, enc_mask, attmats, _ = self.encoder(
            feat, mask, train=train, return_attmat=return_attmat)
        return enc_feat, feat_len, mask, attmats

    def decode(self, enc_feat: Array, enc_mask: Array, text: Array,
               text_len: Array, *, train: bool = False,
               return_attmat: bool = False):
        """Teacher-forced decoder pass: text includes <sos/eos> at both ends;
        input is text[:, :-1], targets are text[:, 1:]
        (model/ar_asr.py:386-388)."""
        tgt_in = text[:, :-1]
        emb = self.dec_emb(tgt_in)
        tgt_mask = make_mask_from_len(
            jnp.maximum(text_len - 1, 0), tgt_in.shape[1])
        out, self_att, cross_att, _ = self.decoder(
            emb, enc_feat, tgt_mask, enc_mask, train=train,
            return_attmat=return_attmat)
        return self.postnet(out), self_att, cross_att

    def decode_step(self, token: Array, enc_feat, enc_mask, *,
                    prime: bool = False, cache_capacity: Optional[int] = None,
                    decode_position: Optional[Array] = None):
        """Single-step KV-cached decode for beam search. token (B, 1) int."""
        emb = self.dec_emb(token)
        out, *_ = self.decoder(emb, enc_feat, None, enc_mask, decode=True,
                               prime=prime, cache_capacity=cache_capacity,
                               decode_position=decode_position)
        return self.postnet(out)

    def ctc_logits(self, enc_feat: Array) -> Array:
        return self.ctc_head(enc_feat)

    def ilm_decode(self, text: Array, text_len: Array, enc_feat_shape):
        """Internal LM estimation: decoder over zeroed encoder features
        (model/ar_asr.py:419-450)."""
        zeros = jnp.zeros(enc_feat_shape, self.cfg.dtype)
        logits, *_ = self.decode(zeros,
                                 jnp.ones((enc_feat_shape[0], 1,
                                           enc_feat_shape[1]), bool),
                                 text, text_len)
        return logits

    def __call__(self, feat: Array, feat_len: Array, text: Array,
                 text_len: Array, *, train: bool = False,
                 epoch: Optional[Array] = None,
                 group_ids: Optional[Array] = None,
                 axis_name: Optional[str] = None,
                 return_att: bool = False) -> Dict[str, Array]:
        c = self.cfg
        enc_feat, enc_feat_len, enc_mask, enc_att = self.encode(
            feat, feat_len, train=train, epoch=epoch, group_ids=group_ids,
            axis_name=axis_name, return_attmat=return_att)
        logits, self_att, cross_att = self.decode(
            enc_feat, enc_mask, text, text_len, train=train,
            return_attmat=return_att or c.att_guid_sigma > 0.0)
        out = dict(logits=logits, enc_feat_len=enc_feat_len)
        if c.ctc_weight > 0.0:
            out["ctc_logits"] = self.ctc_logits(enc_feat)
        if c.ilm_weight > 0.0:
            out["ilm_logits"] = self.ilm_decode(
                text, text_len, enc_feat.shape)
        if c.att_guid_sigma > 0.0 and cross_att:
            # first-layer cross attention drives the guidance loss
            out["cross_att"] = cross_att[0]
        if return_att:
            out["enc_att"] = enc_att
            out["dec_self_att"] = self_att
            out["dec_cross_att"] = cross_att
        return out


def arasr_loss(outputs: Dict[str, Array], text: Array, text_len: Array,
               cfg: ARASRConfig) -> Tuple[Array, Dict[str, Array]]:
    """criterion_forward (model/ar_asr.py:517-600): CE + ctc_weight * CTC +
    ilm_weight * ILM-CE + attention guidance; metrics: accuracy."""
    logits = outputs["logits"]
    ce = criteria.cross_entropy(logits, text, text_len,
                                label_smoothing=cfg.label_smoothing)
    loss = ce
    metrics = dict(ce_loss=ce,
                   accuracy=criteria.accuracy(logits, text, text_len))
    if cfg.ctc_weight > 0.0:
        # CTC targets: strip sos/eos (model/ar_asr.py:453-458)
        ctc_text = text[:, 1:]
        ctc_len = jnp.maximum(text_len - 2, 0)
        ctc = criteria.ctc_loss(outputs["ctc_logits"],
                                outputs["enc_feat_len"], ctc_text, ctc_len)
        loss = (1.0 - cfg.ctc_weight) * loss + cfg.ctc_weight * ctc
        metrics["ctc_loss"] = ctc
    if cfg.ilm_weight > 0.0:
        ilm = criteria.cross_entropy(outputs["ilm_logits"], text, text_len,
                                     label_smoothing=cfg.label_smoothing)
        loss = loss + cfg.ilm_weight * ilm
        metrics["ilm_loss"] = ilm
    if cfg.att_guid_sigma > 0.0 and "cross_att" in outputs:
        att_guid = criteria.attention_guidance(
            outputs["cross_att"], jnp.maximum(text_len - 1, 0),
            outputs["enc_feat_len"], sigma=cfg.att_guid_sigma)
        loss = loss + att_guid
        metrics["att_guid_loss"] = att_guid
    metrics["loss"] = loss
    return loss, metrics
