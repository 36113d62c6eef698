"""Validation-time deep visualization: per-sample metric-history curves,
input-audio / real-text snapshots, hypothesis-text history accumulated
across epochs, and per-layer/head attention grids with ``.npz`` dumps.

Rebuild of the reference's per-sample ``model.visualize()`` pipeline:

- ``speechain/model/ar_asr.py:602-727`` — ASR branch: CER/WER/accuracy/
  confidence curves per sample, input audio + real text at the first
  snapshot interval, teacher-forcing and CTC hypothesis-text history, and
  every encoder/decoder attention matrix;
- ``speechain/model/ar_tts.py:552-670`` and ``model/nar_tts.py`` — TTS
  branches: loss/stop-accuracy curves, real vs predicted mel matrices;
- ``speechain/model/abs.py:690-760`` — ``attention_reshape`` /
  ``matrix_snapshot`` (negative layer indices, one key per head);
- ``speechain/monitor.py:741-771`` — ``ValidMonitor.model_snapshot``: the
  per-sample ``epoch_records`` dict that grows across epochs (and must
  survive resume);
- ``speechain/snapshooter.py:380-800`` — the figure/.npz/.txt/.wav
  writers; our equivalents live in ``train/monitor.py`` (SnapShooter).

TPU-first notes: the teacher-forced B=1 visualization forward runs OUTSIDE
the jitted hot steps, once per ``visual_snapshot_interval`` epochs, so the
train/valid executables keep their static shapes and donated buffers.
Under multi-host SPMD every process executes the same forward on the same
host-0 sample (two-phase ``broadcast_one_to_all``: shapes first, then
data, so differently-bucketed host-local batches cannot desync the global
program); only process 0 enqueues artifact writes.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import numpy as np

# batch keys that may feed the visualization forward, per family (a subset
# of runner.FAMILY_BATCH_KEYS plus the host-side extras we snapshot)
_FAMILY_KEYS = {
    "asr": ("feat", "feat_len", "text", "text_len"),
    "lm": ("text", "text_len"),
    "artts": ("text", "text_len", "feat", "feat_len", "spk_feat",
              "spk_ids"),
    "fastspeech2": ("text", "text_len", "feat", "feat_len", "pitch",
                    "pitch_len", "duration", "duration_len", "spk_feat",
                    "spk_ids"),
}


def _to_np(x) -> np.ndarray:
    """Fetch a (possibly global, replicated) jax.Array to host numpy."""
    try:
        return np.asarray(x)
    except Exception:
        return np.asarray(x.addressable_shards[0].data)


def _log_softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=axis, keepdims=True))


def _ctc_collapse(ids: np.ndarray, blank: int = 0) -> List[int]:
    """Greedy CTC path -> label sequence: merge repeats, drop blanks
    (the reference's ctc_text decode, model/ar_asr.py:462-476)."""
    out, prev = [], blank
    for t in ids.tolist():
        if t != prev and t != blank:
            out.append(t)
        prev = t
    return out


class ValidVisualizer:
    """Drives per-sample validation snapshots every N epochs.

    One instance per training run; ``maybe_select`` pins the first
    ``snapshot_number`` utterances of the first validation batch (the
    reference's ``visual_iterator`` with ``batches_per_epoch =
    visual_snapshot_number``, runner.py:977-1015), ``snapshot`` runs the
    teacher-forced forward and emits artifacts through the SnapShooter.
    """

    def __init__(self, family: str, shooter, tokenizer=None, net_cfg=None,
                 snapshot_number: int = 3, snapshot_interval: int = 5,
                 sample_rate: int = 16000,
                 logger: Optional[logging.Logger] = None):
        self.family = family
        self.shooter = shooter
        self.tokenizer = tokenizer
        self.net_cfg = net_cfg
        self.n = int(snapshot_number or 0)
        self.interval = int(snapshot_interval or 0)
        self.sample_rate = int(sample_rate)
        self.logger = logger or logging.getLogger(__name__)
        self.samples: List[Dict[str, Any]] = []
        # sample_name -> metric -> [values per snapshot] (the reference's
        # ValidMonitor.epoch_records, monitor.py:755-770)
        self.records: Dict[str, Dict[str, List[float]]] = {}
        # sample_name -> field -> [strings per snapshot]
        self.texts: Dict[str, Dict[str, List[str]]] = {}

    # ---- persistence (resume keeps histories growing) -------------------
    def state_dict(self) -> Dict[str, Any]:
        return dict(records=self.records, texts=self.texts)

    def load_state_dict(self, d: Dict[str, Any]):
        self.records = {k: {m: list(v) for m, v in recs.items()}
                        for k, recs in d.get("records", {}).items()}
        self.texts = {k: {m: list(v) for m, v in recs.items()}
                      for k, recs in d.get("texts", {}).items()}

    # ---- sample pinning --------------------------------------------------
    def maybe_select(self, batch: Dict[str, Any]):
        """Pin up to ``snapshot_number`` B=1 samples from a raw (host-side
        numpy) validation batch. Idempotent after the first call."""
        if self.samples or self.n <= 0 or self.interval <= 0:
            return
        names = batch.get("indices") or []
        keys = _FAMILY_KEYS.get(self.family, ())
        raw_text = batch.get("raw_text")
        for row in range(min(self.n, len(names))):
            data = {}
            for k in keys:
                v = batch.get(k)
                if v is not None:
                    data[k] = np.asarray(v[row:row + 1])
            self.samples.append(dict(
                name=str(names[row]), data=data,
                raw_text=(raw_text[row] if raw_text else None)))
        self._broadcast_samples()

    def _broadcast_samples(self):
        """Multi-host: replace every host's pinned samples with host 0's so
        all controllers run identical visualization programs. Two-phase:
        array shapes first (host-local batches bucket differently), then
        the data padded to the broadcast shapes."""
        import jax
        if jax.process_count() <= 1 or not self.samples:
            return
        from jax.experimental import multihost_utils as mhu
        for s in self.samples:
            keys = sorted(s["data"])
            shapes = np.zeros((len(keys), 4), np.int32)
            for i, k in enumerate(keys):
                sh = s["data"][k].shape
                shapes[i, :len(sh)] = sh
                shapes[i, 3] = len(sh)
            shapes = _to_np(mhu.broadcast_one_to_all(shapes))
            for i, k in enumerate(keys):
                tgt = tuple(int(x) for x in shapes[i, :shapes[i, 3]])
                src = s["data"][k]
                buf = np.zeros(tgt, src.dtype)
                sl = tuple(slice(0, min(a, b))
                           for a, b in zip(src.shape, tgt))
                buf[sl] = src[sl]
                s["data"][k] = _to_np(mhu.broadcast_one_to_all(buf))

    # ---- per-epoch driver ------------------------------------------------
    def due(self, epoch: int) -> bool:
        return bool(self.samples) and self.interval > 0 \
            and epoch % self.interval == 0

    def snapshot(self, epoch: int, net, variables: Dict, rng):
        """Run the teacher-forced forward for every pinned sample and emit
        curve/text/audio/attention artifacts. All hosts compute (SPMD-safe
        with global params); only process 0 writes."""
        if not self.due(epoch):
            return
        first = (epoch // self.interval) == 1
        for s in self.samples:
            try:
                self._snap_one(epoch, s, net, variables, rng, first)
            except Exception:
                self.logger.exception(
                    "visualization snapshot failed for %s", s["name"])

    # ---- internals --------------------------------------------------------
    def _writes(self) -> bool:
        import jax
        return jax.process_index() == 0

    def _curves(self, name: str, epoch: int, metrics: Dict[str, float]):
        recs = self.records.setdefault(name, {})
        for m, v in metrics.items():
            recs.setdefault(m, []).append(float(v))
        if self._writes():
            for m in metrics:
                self.shooter.snapshot({m: recs[m]}, epoch, "curve",
                                      subfolder=name,
                                      x_stride=self.interval)

    def _text(self, name: str, epoch: int, field: str, value: str,
              append: bool = True):
        recs = self.texts.setdefault(name, {})
        hist = recs.setdefault(field, [])
        if append:
            hist.append(value)
        if self._writes():
            self.shooter.snapshot({field: list(hist)}, epoch, "text",
                                  subfolder=name, x_stride=self.interval)

    def _att_grids(self, name: str, epoch: int, groups: Dict[str, Any]):
        """groups: group_name -> (list_per_layer of (1,H,Tq,Tk), q_len,
        k_len). Keys follow the reference's attention_reshape naming —
        negative layer index, head suffix (model/abs.py:726-760)."""
        if not self._writes():
            return
        for gname, (mats, q, k) in groups.items():
            if not mats:
                continue
            L = len(mats)
            materials = {}
            for li, att in enumerate(mats):
                a = _to_np(att)[0]  # (H, Tq, Tk)
                for h in range(a.shape[0]):
                    materials[f"{li - L}.{h}"] = a[h, :q, :k]
            self.shooter.snapshot(materials, epoch, "matrix_grid",
                                  subfolder=f"{name}/{gname}")

    def _first_snapshot(self, s: Dict, epoch: int, real_text: str):
        """Input audio (or feature matrix) + real text, once
        (model/ar_asr.py:672-700, ar_tts.py:610-640)."""
        name = s["name"]
        feat = s["data"].get("feat")
        if feat is not None and self._writes():
            flen = int(s["data"]["feat_len"][0])
            if feat.shape[-1] == 1:  # raw waveform input
                self.shooter.snapshot(
                    {"input_audio": feat[0, :flen, 0]}, epoch, "audio",
                    subfolder=name, sample_rate=self.sample_rate)
            else:  # precomputed feature input
                self.shooter.snapshot(
                    {"real_feat": feat[0, :flen].T}, epoch, "matrix",
                    subfolder=name)
        if real_text is not None:
            self._text(name, epoch, "real_text", real_text)

    def _real_text(self, s: Dict) -> Optional[str]:
        if s.get("raw_text") is not None:
            return str(s["raw_text"])
        if self.tokenizer is not None and "text" in s["data"]:
            tl = int(s["data"]["text_len"][0])
            return self.tokenizer.tensor2text(s["data"]["text"][0, :tl])
        return None

    def _snap_one(self, epoch: int, s: Dict, net, variables, rng,
                  first: bool):
        import jax.numpy as jnp
        d = {k: jnp.asarray(v) for k, v in s["data"].items()}
        rngs = {"dropout": rng, "specaug": rng}
        fam, name = self.family, s["name"]

        if fam == "asr":
            out = net.apply(variables, d["feat"], d["feat_len"], d["text"],
                            d["text_len"], train=False, return_att=True,
                            rngs=rngs)
            from speechain_tpu.models.ar_asr import arasr_loss
            loss, m = arasr_loss(out, d["text"], d["text_len"],
                                 self.net_cfg)
            metrics = {"loss": float(_to_np(loss)),
                       "accuracy": float(_to_np(m["accuracy"]))}
            text_np = s["data"]["text"]
            tl = int(s["data"]["text_len"][0])
            logits = _to_np(out["logits"])[0, :max(tl - 1, 1)]
            logp = _log_softmax(logits.astype(np.float64))
            hypo_ids = logits.argmax(-1)
            metrics["text_confid"] = float(
                logp[np.arange(len(hypo_ids)), hypo_ids].mean())
            real = self._real_text(s)
            hypo = (self.tokenizer.tensor2text(hypo_ids)
                    if self.tokenizer else "")
            if real is not None:
                from speechain_tpu.utils.metrics import cer, wer
                metrics["cer"] = cer(hypo, real)
                metrics["wer"] = wer(hypo, real)
            if "ctc_logits" in out:
                enc_len = int(_to_np(out["enc_feat_len"])[0])
                ctc_ids = _to_np(out["ctc_logits"])[0, :enc_len].argmax(-1)
                ctc_hypo = (self.tokenizer.tensor2text(
                    np.asarray(_ctc_collapse(ctc_ids), np.int32))
                    if self.tokenizer else "")
                if real is not None:
                    from speechain_tpu.utils.metrics import cer, wer
                    metrics["ctc_cer"] = cer(ctc_hypo, real)
                    metrics["ctc_wer"] = wer(ctc_hypo, real)
                self._text(name, epoch, "hypo_ctc_text", ctc_hypo)
            if "ilm_logits" in out:
                il = _to_np(out["ilm_logits"])[0, :max(tl - 1, 1)]
                tgt = text_np[0, 1:tl]
                ilp = _log_softmax(il.astype(np.float64))
                metrics["ilm_text_ppl"] = float(np.exp(
                    -ilp[np.arange(len(tgt)), tgt].mean()))
            self._curves(name, epoch, metrics)
            self._text(name, epoch, "hypo_text", hypo)
            if first:
                self._first_snapshot(s, epoch, real)
            enc_len = int(_to_np(out["enc_feat_len"])[0])
            self._att_grids(name, epoch, {
                "enc_att": (out.get("enc_att") or [], enc_len, enc_len),
                "dec_self_att": (out.get("dec_self_att") or [],
                                 tl - 1, tl - 1),
                "dec_cross_att": (out.get("dec_cross_att") or [],
                                  tl - 1, enc_len),
            })

        elif fam == "artts":
            kw = {}
            for k in ("spk_feat", "spk_ids"):
                if k in d:
                    kw[k] = d[k]
            out = net.apply(variables, d["text"], d["text_len"], d["feat"],
                            d["feat_len"], train=False, return_att=True,
                            rngs=rngs, **kw)
            from speechain_tpu.models.ar_tts import artts_loss
            loss, m = artts_loss(out, self.net_cfg)
            metrics = {"loss": float(_to_np(loss))}
            for k in ("stop_accuracy", "stop_f2", "feat_loss_before",
                      "feat_loss_after", "stop_loss"):
                if k in m:
                    metrics[k] = float(_to_np(m[k]))
            self._curves(name, epoch, metrics)
            real = self._real_text(s)
            if first:
                self._first_snapshot(s, epoch, real)
            T_v = int(_to_np(out["tgt_feat_len"])[0])
            if self._writes():
                self.shooter.snapshot(
                    {"pred_feat": _to_np(out["pred_after"])[0, :T_v].T},
                    epoch, "matrix", subfolder=name)
            tl = int(s["data"]["text_len"][0])
            self._att_grids(name, epoch, {
                "dec_self_att": (out.get("dec_self_att") or [], T_v, T_v),
                "dec_cross_att": (out.get("dec_cross_att") or [], T_v, tl),
            })

        elif fam == "fastspeech2":
            kw = {}
            for k in ("spk_feat", "spk_ids"):
                if k in d:
                    kw[k] = d[k]
            pitch_len = d.get("pitch_len", d["feat_len"])
            out = net.apply(variables, d["text"], d["text_len"], d["feat"],
                            d["feat_len"], d["pitch"], pitch_len,
                            d["duration"], d["duration_len"], train=False,
                            rngs=rngs, **kw)
            from speechain_tpu.models.nar_tts import fastspeech2_loss
            loss, m = fastspeech2_loss(out, d["duration"], self.net_cfg)
            metrics = {"loss": float(_to_np(loss))}
            for k, v in m.items():
                arr = _to_np(v)
                if arr.ndim == 0:
                    metrics[k] = float(arr)
            self._curves(name, epoch, metrics)
            real = self._real_text(s)
            if first:
                self._first_snapshot(s, epoch, real)
            T_v = int(_to_np(out["tgt_feat_len"])[0])
            if self._writes():
                self.shooter.snapshot(
                    {"pred_feat": _to_np(out["pred_after"])[0, :T_v].T},
                    epoch, "matrix", subfolder=name)

        elif fam == "lm":
            logits, _, attmats = net.apply(
                variables, d["text"], d["text_len"], train=False,
                return_attmat=True, rngs=rngs)
            from speechain_tpu.models.lm import lm_loss
            loss, m = lm_loss(logits, d["text"], d["text_len"])
            ce = float(_to_np(loss))
            metrics = {"loss": ce, "text_ppl": float(np.exp(min(ce, 30.0)))}
            self._curves(name, epoch, metrics)
            tl = int(s["data"]["text_len"][0])
            hypo_ids = _to_np(logits)[0, :max(tl - 1, 1)].argmax(-1)
            if self.tokenizer is not None:
                self._text(name, epoch, "hypo_text",
                           self.tokenizer.tensor2text(hypo_ids))
            if first:
                real = self._real_text(s)
                if real is not None:
                    self._text(name, epoch, "real_text", real)
            self._att_grids(name, epoch, {
                "self_att": (attmats or [], tl, tl)})
