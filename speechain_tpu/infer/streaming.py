"""Streaming (online) ASR inference — beyond-parity serving path.

The reference has no streaming mode (its beam search re-forwards full
utterances, ``infer_func/beam_search.py:299-474``). This module streams a
**causal** ARASR model (``encoder_type: transformer`` with
``uni_direction: true`` and a CTC head) exactly: fixed-size waveform chunks
go in, CTC-greedy tokens come out, and the emitted tokens are bit-identical
to running the same model offline on the concatenated waveform.

TPU-native design: the entire chunk pipeline — pre-emphasis, log-Mel
frames, feature normalization, Conv2d prenet, causal encoder with KV
caches, CTC head, greedy collapse — is ONE jitted function with fully
static shapes, called repeatedly with a donated state pytree. Three
executables exist per stream config (`start` / `step` / `finish`), traced
once each; serving latency per chunk is one device dispatch.

How each stage streams exactly:

- **frontend** (ops/frontend.py:225-295 contract): pre-emphasis carries one
  sample across chunks; `center=True` reflect padding is materialized once
  on the left in `start` and once on the right in `finish`; mid-stream
  frames are computed from a carried `n_fft`-sample tail, so every frame's
  window is identical to the offline conv-framing. With a chunk of
  ``m * hop`` samples, `start` emits ``m - ceil(n_fft/2/hop) + 1`` frames
  and every `step` emits exactly ``m`` — all static.
- **feat-norm**: eval-mode global/group normalization is a per-frame affine
  from the running stats (ops/feat_norm.py), so it streams exactly;
  'utterance'/'batch' eval normalization needs the whole utterance and is
  rejected at build time.
- **Conv2d prenet**: valid (padding=0) time convolutions have a finite
  receptive field R with effective stride S_eff; output j consumes input
  frames [S_eff*j, S_eff*j + R). A small mel ring buffer anchored at
  ``S_eff * emitted`` recomputes nothing and emits each prenet frame once.
- **encoder**: the causal TransformerEncoder's KV-cache decode mode,
  generalized to CHUNKS (nn/attention.py per-row `pos <= index + row`
  mask): one cache write per chunk, intra-chunk causality in-mask,
  positions driven externally so partially-valid chunks advance by their
  true frame count.
- **CTC greedy**: collapse-repeats-then-drop-blanks carries one token id
  across chunks (blank = 0, train/criteria.py:102).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speechain_tpu.ops.feat_norm import apply_feat_norm, coerce_stats
from speechain_tpu.ops.frontend import (
    _precision,
    dft_filterbank,
    hann_window,
    mel_filterbank,
    to_float_wave,
)

Array = jnp.ndarray


class StreamState(NamedTuple):
    """Device-resident stream state (one pytree, donated every step)."""

    preemph_carry: Array   # (B, 1) last raw sample of the previous chunk
    wave_tail: Array       # (B, n_fft) last pre-emphasized samples
    mel_buf: Array         # (B, MELBUF, n_mels) anchored at S_eff * J
    mel_cnt: Array         # () frames currently valid in mel_buf
    mel_total: Array       # () total mel frames produced so far
    enc_frames: Array      # () prenet/encoder frames emitted so far (= J)
    enc_cache: Any         # flax 'cache' collection of the causal encoder
    ctc_prev: Array        # (B,) last argmax id (greedy collapse carry)
    beam: Any = None       # PrefixBeamState when beam_size > 0
    enc_buf: Any = None    # (B, cap, D) encoder outputs when rescore=True


def _conv_time_geometry(prenet_conf: Dict[str, Any]) -> Tuple[int, int, int]:
    """(n_layers, effective_stride, receptive_field) of the prenet's time
    axis. Mirrors Conv2dPrenet.out_len (nn/prenets.py:222-231)."""
    dims = prenet_conf.get("conv_dims", (64, 64))
    n = len(dims) if isinstance(dims, (list, tuple)) else 1
    k = prenet_conf.get("conv_kernel", 3)
    kt = k[0] if isinstance(k, (list, tuple)) else k
    s = prenet_conf.get("conv_stride", 2)
    st = s[0] if isinstance(s, (list, tuple)) else s
    pad = prenet_conf.get("conv_padding", 0)
    pt = pad[0] if isinstance(pad, (list, tuple)) else pad
    if pt != 0:
        raise ValueError("streaming needs padding=0 (valid) prenet convs")
    R, S_eff = 1, 1
    for _ in range(n):
        R = R + (kt - 1) * S_eff
        S_eff *= st
    return n, S_eff, R


class _StreamBase:
    """Shared geometry/validation/helpers of the streaming recognizers:
    the lockstep `StreamingASR` and the continuous-batching `StreamPool`
    (infer/stream_pool.py)."""

    def __init__(self, net, variables: Dict[str, Any], *,
                 chunk_samples: int, max_frames: int = 4096,
                 weight_quant: Optional[str] = None,
                 wq_min_elems: int = 8192,
                 beam_size: int = 0, beam_prune: int = 8,
                 max_text_len: int = 128, rescore: bool = False,
                 rescore_weight: float = 0.3,
                 sos_eos: Optional[int] = None):
        cfg = net.cfg
        fe = cfg.frontend
        if rescore and beam_size <= 0:
            raise ValueError("rescore=True needs beam_size > 0 (the "
                             "attention pass rescores the CTC n-best)")
        if cfg.encoder_type not in ("transformer", "conformer") or \
                not cfg.encoder.get("uni_direction", False):
            raise ValueError(
                "streaming needs encoder_type 'transformer' or 'conformer' "
                "with uni_direction=true (a causal encoder); a globally-"
                "attending encoder cannot be streamed exactly")
        if cfg.ctc_weight <= 0.0:
            raise ValueError("streaming decodes the CTC head; train the "
                             "model with ctc_weight > 0")
        if not fe.center:
            raise ValueError("streaming implements center=True framing")
        if fe.pre_stft_norm is not None:
            raise ValueError("pre_stft_norm normalizes over the whole "
                             "utterance and cannot stream")
        if cfg.feat_norm is not None and \
                cfg.feat_norm.norm_type not in ("global", "group"):
            raise ValueError(
                "streaming feat-norm needs per-frame eval stats "
                "(norm_type 'global' or 'group'); got "
                f"{cfg.feat_norm.norm_type!r}")
        n_fft, hop = fe.fft, fe.hop
        if chunk_samples % hop != 0:
            raise ValueError(f"chunk_samples must be a multiple of "
                             f"hop={hop}")
        if chunk_samples < n_fft:
            raise ValueError(f"chunk_samples must be >= n_fft={n_fft}")
        if 2 * hop > n_fft:
            raise ValueError("streaming framing assumes hop <= n_fft/2")

        self.net, self.variables, self.cfg = net, variables, cfg
        self.S = chunk_samples
        self.m = chunk_samples // hop                 # frames per steady step
        p = n_fft // 2
        self.n0 = self.m - math.ceil(p / hop) + 1     # frames from `start`
        self.maxf = self.m + math.ceil(p / hop)       # frame cap in `finish`
        _, self.s_eff, self.recept = _conv_time_geometry(cfg.enc_prenet)
        # prenet outputs available after t mel frames:
        #   J(t) = max(0, (t - R) // S_eff + 1)
        self.mout = self.maxf // self.s_eff + 2       # prenet outs per call
        self.pw = self.s_eff * (self.mout - 1) + self.recept
        self.melbuf = max(self.pw, self.maxf + self.recept + self.s_eff)
        self.cap = max_frames                         # encoder KV capacity
        self.n_mels = fe.n_mels
        # first-pass prefix beam + optional second-pass attention rescoring
        self.beam_size = int(beam_size)
        self.beam_prune = int(beam_prune)
        self.max_text_len = int(max_text_len)
        self.rescore = bool(rescore)
        self.rescore_weight = float(rescore_weight)
        self.sos_eos = (cfg.vocab_size - 1) if sos_eos is None else int(
            sos_eos)
        self._rescore_fn = None                       # lazily jitted
        self._lm_score_fn = None                      # lazily jitted

        window = hann_window(fe.win)
        self._basis = jnp.asarray(dft_filterbank(
            n_fft, window, fe.onesided, fe.normalized))
        self._melfb = jnp.asarray(mel_filterbank(
            fe.n_freqs, fe.n_mels, fe.sr, fe.fmin, fe.fmax, fe.mel_scale,
            fe.mel_norm))
        stats_tree = variables.get("norm_stats", {})
        # checkpoint restores may hold numpy leaves; device-put them so the
        # stats index cleanly under jit (eval group selection gathers)
        self._norm_stats = (jax.tree_util.tree_map(
            jnp.asarray, coerce_stats(stats_tree["frontend"]["stats"]))
            if stats_tree else None)

        # weight-only int8 serving (infer/quantize.py): the chunk
        # executables receive the (possibly quantized) tree as an ARGUMENT
        # — a closed-over tree would constant-fold the dequantize away —
        # and dequantize in-executable. `offline_variables` is the float
        # tree the stream is exact against (== `variables` unquantized).
        if weight_quant:
            assert str(weight_quant).lower() == "int8", \
                f"weight_quant must be 'int8', got {weight_quant!r}"
            from speechain_tpu.infer.quantize import (dequantize_variables,
                                                      quantize_variables)
            self.exec_variables = quantize_variables(
                variables, min_elems=wq_min_elems)
            self.offline_variables = dequantize_variables(
                self.exec_variables)
        else:
            self.exec_variables = variables
            self.offline_variables = variables

    # ------------------------------------------------------------ plumbing

    def _prime_cache(self, B: int) -> Any:
        dummy = jnp.zeros(
            (B, self.mout, self._prenet_out_dim()), self.cfg.dtype)
        _, prime_vars = self.net.apply(
            self.variables, dummy,
            method=lambda m, x: m.encoder(
                x, None, decode=True, prime=True, cache_capacity=self.cap),
            mutable=["cache"])
        return prime_vars["cache"]

    def _prenet_out_dim(self) -> int:
        conf = self.cfg.enc_prenet
        lnr = conf.get("lnr_dims")
        if lnr is not None:
            dims = lnr if isinstance(lnr, (list, tuple)) else [lnr]
            return dims[-1]
        dims = conf.get("conv_dims", (64, 64))
        dims = dims if isinstance(dims, (list, tuple)) else [dims]
        fdim = self.n_mels
        k = conf.get("conv_kernel", 3)
        kf = k[1] if isinstance(k, (list, tuple)) else k
        s = conf.get("conv_stride", 2)
        sf = s[1] if isinstance(s, (list, tuple)) else s
        for _ in range(len(dims)):
            fdim = (fdim - kf) // sf + 1
        return fdim * dims[-1]

    def _rel0(self) -> int:
        """Static offset of the next frame's window inside
        [wave_tail | chunk]. After c chunks the stream has emitted
        F_c = n0 + (c-1)*m frames; the next frame F_c has window start
        F_c*hop - p (real coordinates; the left reflect pad is virtual
        negative indices), and the concat begins at real sample
        c*S - n_fft. S % hop == 0 makes the difference constant in c."""
        fe = self.cfg.frontend
        n_fft, hop, p = fe.fft, fe.hop, fe.fft // 2
        return self.n0 * hop - p - (self.S - n_fft)

    def _frames_of(self, cat: Array, n_frames: int) -> Array:
        """Static strided framing: (B, L) -> (B, n_frames, n_fft), frame j
        covering cat[:, j*hop : j*hop + n_fft] — the same windows the
        offline strided conv consumes (frontend.py:252-266)."""
        fe = self.cfg.frontend
        idx = (jnp.arange(n_frames) * fe.hop)[:, None] + \
            jnp.arange(fe.fft)[None, :]
        return cat[:, idx]

    def _logmel(self, frames: Array) -> Array:
        """Windowed-DFT matmul + power + mel + log on pre-cut frames —
        identical math to _frontend_impl steps 3-5 (frontend.py:252-293),
        with the same fp32 HIGHEST-precision contractions."""
        fe = self.cfg.frontend
        prec = _precision(fe)
        spec = jnp.einsum("btn,fn->btf", frames, self._basis,
                          preferred_element_type=jnp.float32,
                          precision=prec)
        nf = fe.n_freqs
        re, im = spec[..., :nf], spec[..., nf:]
        power = re * re + im * im
        if fe.mag_spec:
            power = jnp.sqrt(power)
        feat = jnp.einsum("btf,fm->btm", power, self._melfb,
                          preferred_element_type=jnp.float32,
                          precision=prec)
        if fe.logging:
            feat = jnp.log(jnp.clip(feat, min=fe.clamp))
            if fe.log_base is not None:
                feat = feat / math.log(fe.log_base)
        return feat

    # ------------------------------------------ n-best / two-pass scoring

    def _nbest_impl(self, beam, enc_buf, enc_len,
                    rescore: Optional[bool] = None,
                    lm_net=None, lm_variables: Optional[Dict] = None,
                    lm_weight: float = 0.0) -> Dict[str, np.ndarray]:
        """Shared n-best extraction + second-pass scoring over a beam
        pytree (lockstep full-state or a pool row slice); see
        StreamingASR.final_nbest for the contract."""
        if self.beam_size <= 0:
            raise ValueError("build the stream with beam_size > 0 to use "
                             "the n-best surface")
        from speechain_tpu.infer.ctc_prefix_beam import prefix_beam_scores
        do_rescore = self.rescore if rescore is None else bool(rescore)
        if do_rescore and not self.rescore:
            raise ValueError("rescore needs the stream built with "
                             "rescore=True (it accumulates encoder output)")
        tokens = np.asarray(beam.tokens)
        lengths = np.asarray(beam.length)
        ctc = np.asarray(prefix_beam_scores(beam))
        out = dict(tokens=tokens, lengths=lengths, ctc_score=ctc)
        score = ctc.copy()
        if do_rescore:
            if self._rescore_fn is None:
                self._rescore_fn = self._build_rescore_fn()
            att = np.asarray(self._rescore_fn(
                self.exec_variables, enc_buf, enc_len,
                beam.tokens, beam.length))
            w = self.rescore_weight
            score = w * ctc + (1.0 - w) * att
            out["att_score"] = att
        if lm_net is not None and lm_weight != 0.0:
            if self._lm_score_fn is None:
                self._lm_score_fn = self._build_lm_score_fn(lm_net)
            lm = np.asarray(self._lm_score_fn(
                lm_variables, beam.tokens, beam.length))
            score = score + lm_weight * lm
            out["lm_score"] = lm
        out["score"] = score
        order = np.argsort(-score, axis=1)
        bi = np.arange(score.shape[0])[:, None]
        return {k: v[bi, order] for k, v in out.items()}

    def _build_rescore_fn(self):
        """Second-pass attention scoring: teacher-forced decoder log-probs
        of each hypothesis over the accumulated encoder output."""
        from speechain_tpu.infer.quantize import dequantize_variables
        from speechain_tpu.utils.masks import make_mask_from_len
        sos = self.sos_eos

        @jax.jit
        def fn(variables, enc_buf, enc_len, tokens, length):
            variables = dequantize_variables(variables)
            base = {k: v for k, v in variables.items() if k != "cache"}
            B, W, Lm = tokens.shape
            BW = B * W
            tt = tokens.reshape(BW, Lm)
            ll = length.reshape(BW)
            # [sos, prefix..., eos, 0...] — teacher-forced scoring format
            # (models/ar_asr.py decode: input text[:, :-1], tgt text[:, 1:])
            text = jnp.zeros((BW, Lm + 2), jnp.int32).at[:, 0].set(sos)
            text = text.at[:, 1:Lm + 1].set(tt)
            pos = jnp.arange(Lm + 2)[None, :]
            text = jnp.where(pos == (ll + 1)[:, None], sos, text)
            text = jnp.where(pos > (ll + 1)[:, None], 0, text)
            text_len = ll + 2
            enc = jnp.repeat(enc_buf.astype(self.cfg.dtype), W, axis=0)
            enc_mask = make_mask_from_len(
                jnp.repeat(jnp.broadcast_to(
                    jnp.asarray(enc_len, jnp.int32), (B,)), W),
                enc.shape[1])
            logits, *_ = self.net.apply(base, enc, enc_mask, text, text_len,
                                        method=self.net.decode)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            tgt = text[:, 1:]
            lp = jnp.take_along_axis(logp[:, :tgt.shape[1]], tgt[..., None],
                                     -1)[..., 0]
            m = jnp.arange(tgt.shape[1])[None, :] < (text_len - 1)[:, None]
            att = jnp.sum(jnp.where(m, lp, 0.0), -1)
            return att.reshape(B, W)

        return fn

    def _build_lm_score_fn(self, lm_net):
        """External-LM n-best scoring: one full (uncached) LM forward over
        the W short hypotheses per row — log P_lm([sos, prefix, eos])."""
        sos = self.sos_eos

        @jax.jit
        def fn(lm_variables, tokens, length):
            B, W, Lm = tokens.shape
            BW = B * W
            tt = tokens.reshape(BW, Lm)
            ll = length.reshape(BW)
            text = jnp.zeros((BW, Lm + 2), jnp.int32).at[:, 0].set(sos)
            text = text.at[:, 1:Lm + 1].set(tt)
            pos = jnp.arange(Lm + 2)[None, :]
            text = jnp.where(pos == (ll + 1)[:, None], sos, text)
            text = jnp.where(pos > (ll + 1)[:, None], 0, text)
            text_len = ll + 2
            logits, *_ = lm_net.apply(lm_variables, text, text_len)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            tgt = text[:, 1:]
            lp = jnp.take_along_axis(logp[:, :-1], tgt[..., None],
                                     -1)[..., 0]
            m = jnp.arange(tgt.shape[1])[None, :] < (text_len - 1)[:, None]
            return jnp.sum(jnp.where(m, lp, 0.0), -1).reshape(B, W)

        return fn


class StreamingASR(_StreamBase):
    """Exact streaming CTC-greedy recognizer over a causal ARASR model.

    Usage::

        stream = StreamingASR(net, variables, chunk_samples=4000,
                              max_frames=2048)
        state = stream.reset(batch_size)
        state, toks, emit = stream.start(state, first_chunk)   # (B, S) wave
        state, toks, emit = stream.step(state, next_chunk)     # ... repeat
        state, toks, emit = stream.finish(state, tail, tail_len)

    Each call returns ``toks (B, K) int32`` and ``emit (B, K) bool``; the
    emitted tokens (in order, where ``emit`` is True) are exactly the CTC
    greedy collapse of the offline model on the concatenated waveform.
    All rows of a batch advance in lockstep (same chunk cadence, started
    and finished together); for slot-multiplexed serving of concurrent
    independent streams use infer/stream_pool.py.
    """

    def __init__(self, net, variables: Dict[str, Any], *,
                 chunk_samples: int, max_frames: int = 4096, **kwargs):
        super().__init__(net, variables, chunk_samples=chunk_samples,
                         max_frames=max_frames, **kwargs)
        # one executable per call type; state is donated every call and
        # the (possibly int8) variable tree rides along as an argument
        self._start = jax.jit(partial(self._call, mode="start"),
                              donate_argnums=(1,))
        self._step = jax.jit(partial(self._call, mode="step"),
                             donate_argnums=(1,))
        self._finish = jax.jit(partial(self._call, mode="finish"),
                               donate_argnums=(1,))

    # ---------------------------------------------------------- public API

    def reset(self, batch_size: int) -> StreamState:
        B, D = batch_size, self.n_mels
        cache = self._prime_cache(B)
        beam = enc_buf = None
        if self.beam_size > 0:
            from speechain_tpu.infer.ctc_prefix_beam import prefix_beam_init
            beam = prefix_beam_init(B, self.beam_size, self.max_text_len)
        if self.rescore:
            d_enc = self.cfg.encoder["d_model"]
            enc_buf = jnp.zeros((B, self.cap + self.mout, d_enc),
                                jnp.float32)
        return StreamState(
            preemph_carry=jnp.zeros((B, 1), jnp.float32),
            wave_tail=jnp.zeros((B, self.cfg.frontend.fft), jnp.float32),
            mel_buf=jnp.zeros((B, self.melbuf, D), jnp.float32),
            mel_cnt=jnp.zeros((), jnp.int32),
            mel_total=jnp.zeros((), jnp.int32),
            enc_frames=jnp.zeros((), jnp.int32),
            enc_cache=cache,
            ctc_prev=jnp.zeros((batch_size,), jnp.int32),
            beam=beam,
            enc_buf=enc_buf,
        )

    def start(self, state: StreamState, chunk: Array):
        """First chunk of the stream (materializes the left reflect pad)."""
        return self._start(self.exec_variables, state, chunk,
                           jnp.zeros((), jnp.int32))

    def step(self, state: StreamState, chunk: Array):
        """A steady mid-stream chunk of exactly ``chunk_samples``."""
        return self._step(self.exec_variables, state, chunk,
                          jnp.zeros((), jnp.int32))

    def finish(self, state: StreamState, tail: Array, tail_len: Array):
        """Final (ragged) samples; ``tail`` is zero-padded to
        ``chunk_samples`` and ``tail_len`` (scalar int) gives the real
        count (0 is fine). Materializes the right reflect pad."""
        return self._finish(self.exec_variables, state, tail,
                            jnp.asarray(tail_len, jnp.int32))

    def final_nbest(self, state: StreamState,
                    rescore: Optional[bool] = None,
                    lm_net=None, lm_variables: Optional[Dict] = None,
                    lm_weight: float = 0.0) -> Dict[str, np.ndarray]:
        """N-best of the first-pass prefix beam (``beam_size > 0``),
        optionally rescored by the attention decoder over the accumulated
        encoder output (``rescore=True`` at build time) and/or an external
        LM — the two-pass (streaming CTC partials -> rescored final)
        serving recipe. ``score = w*ctc + (1-w)*att + lm_weight*lm`` (the
        att term drops out when not rescoring).

        Read-only on ``state``; callable mid-stream or after ``finish``.
        Returns numpy ``tokens (B, W, Lmax)``, ``lengths (B, W)``,
        ``ctc_score``, ``score`` (plus ``att_score``/``lm_score`` when
        active), each row sorted best-first by ``score``.
        """
        return self._nbest_impl(state.beam, state.enc_buf, state.enc_frames,
                                rescore=rescore, lm_net=lm_net,
                                lm_variables=lm_variables,
                                lm_weight=lm_weight)

    # ------------------------------------------------------- the chunk fn

    def _call(self, variables: Dict[str, Any], state: StreamState,
              chunk: Array, tail_len: Array, *, mode: str):
        from speechain_tpu.infer.quantize import dequantize_variables
        variables = dequantize_variables(variables)
        fe = self.cfg.frontend
        n_fft, hop, p = fe.fft, fe.hop, fe.fft // 2
        chunk = to_float_wave(chunk)
        B = chunk.shape[0]

        # --- pre-emphasis with cross-chunk carry (frontend.py:236-241;
        # y[0] = x[0] at stream start since the carry starts at 0)
        if fe.preemphasis is not None:
            prev = jnp.concatenate([state.preemph_carry, chunk[:, :-1]], 1)
            y = chunk - fe.preemphasis * prev
        else:
            y = chunk
        carry = chunk[:, -1:]

        # --- framing: identical windows to the offline strided conv
        if mode == "start":
            left = y[:, 1:p + 1][:, ::-1]            # reflect pad (left)
            cat = jnp.concatenate([left, y], 1)
            n_frames, n_valid_f = self.n0, None
        elif mode == "step":
            cat = jnp.concatenate([state.wave_tail, y], 1)[:, self._rel0():]
            n_frames, n_valid_f = self.m, None
        else:  # finish: right reflect pad around the true last sample
            ycat = jnp.concatenate([state.wave_tail, y], 1)
            L = ycat.shape[1]
            e = n_fft + tail_len - 1                 # index of last real
            idx = jnp.arange(L + p)
            idx = jnp.where(idx <= e, idx, 2 * e - idx)
            idx = jnp.clip(idx, 0, L - 1)
            cat = jnp.take(ycat, idx, axis=1)[:, self._rel0():]
            n_frames, n_valid_f = self.maxf, None    # computed below

        frames = self._frames_of(cat, n_frames)
        mel = self._logmel(frames)                   # (B, n_frames, n_mels)

        if mode == "finish":
            # frames remaining = F_total - mel_total, where F_total follows
            # the offline formula on the cumulative sample count. The
            # cumulative count is (steps so far) * S + tail_len; steps*S =
            # (mel_total - n0)*hop + n0*hop + (p - ...): easier exactly:
            # F_c so far satisfies mel_total = floor((cS - p)/hop) + 1
            # => cS = (mel_total - 1)*hop + p ... + r with 0 <= r < hop;
            # S % hop == 0 makes r = (p % hop ? hop - p % hop : 0) constant.
            r = (hop - p % hop) % hop
            cum = (state.mel_total - 1) * hop + p + r
            f_total = (cum + tail_len + 2 * p - n_fft) // hop + 1
            n_valid_f = jnp.maximum(f_total - state.mel_total, 0)
        elif mode == "start":
            n_valid_f = jnp.full((), self.n0, jnp.int32)
        else:
            n_valid_f = jnp.full((), self.m, jnp.int32)

        # --- eval-mode feature normalization (per-frame affine from the
        # running stats; ops/feat_norm.py global/group eval path)
        if self.cfg.feat_norm is not None:
            flen = jnp.full((B,), mel.shape[1], jnp.int32)
            mel, _, _ = apply_feat_norm(self._norm_stats, mel, flen,
                                        self.cfg.feat_norm, train=False)
        mel = mel.astype(self.cfg.dtype)

        # --- mel ring buffer anchored at S_eff * enc_frames
        buf = jax.lax.dynamic_update_slice(
            state.mel_buf, mel.astype(jnp.float32),
            (0, state.mel_cnt, 0))
        # mask garbage frames past the valid count (finish may emit < maxf)
        total = state.mel_total + n_valid_f
        cnt = state.mel_cnt + n_valid_f
        posn = jnp.arange(self.melbuf)[None, :, None]
        buf = jnp.where(posn < cnt, buf, 0.0)

        # --- prenet over the anchored static window
        j_new = jnp.maximum((total - self.recept) // self.s_eff + 1, 0)
        n_new = j_new - state.enc_frames             # <= self.mout
        window = buf[:, :self.pw].astype(self.cfg.dtype)
        wlen = jnp.full((B,), self.pw, jnp.int32)
        pre, _ = self.net.apply(
            variables, window, wlen,
            method=lambda m, f, fl: m.enc_prenet(f, fl, train=False))
        pre = pre[:, :self.mout]

        # shift the buffer so it stays anchored at S_eff * j_new
        sh = self.s_eff * n_new
        buf2 = jnp.concatenate([buf, jnp.zeros_like(buf)], 1)
        new_mel_buf = jax.lax.dynamic_slice(
            buf2, (0, sh, 0), (B, self.melbuf, self.n_mels))

        # --- causal encoder chunk via the KV-cache decode path
        enc_out, cache_vars = self.net.apply(
            {**variables, "cache": state.enc_cache}, pre,
            state.enc_frames, n_new,
            method=lambda m, x, pos, adv: m.encoder(
                x, None, decode=True, cache_capacity=self.cap,
                decode_position=pos, decode_advance=adv),
            mutable=["cache"])
        enc_feat = enc_out[0]                        # (B, mout, D)

        # --- CTC head + greedy collapse (blank=0), masked to n_new rows
        logits = self.net.apply(variables, enc_feat,
                                method=lambda m, x: m.ctc_logits(x))
        ids = jnp.argmax(logits, -1).astype(jnp.int32)     # (B, mout)
        valid = (jnp.arange(self.mout)[None, :] <
                 n_new)                                     # (B?, mout)
        prevs = jnp.concatenate([state.ctc_prev[:, None], ids[:, :-1]], 1)
        emit = (ids != 0) & (ids != prevs) & valid
        # carry = last VALID frame's id (valid frames form a prefix)
        last_idx = jnp.maximum(n_new - 1, 0)
        new_prev = jnp.where(n_new > 0, ids[:, last_idx], state.ctc_prev)

        # --- first-pass prefix beam over this chunk's valid frames
        new_beam = state.beam
        if self.beam_size > 0:
            from speechain_tpu.infer.ctc_prefix_beam import \
                prefix_beam_update
            logp = jax.nn.log_softmax(
                logits.astype(jnp.float32).at[..., self.sos_eos].set(
                    -1e30), -1)

            def bbody(bs, t):
                ok = jnp.broadcast_to(t < n_new, (B,))
                return prefix_beam_update(bs, logp[:, t], valid=ok,
                                          prune=self.beam_prune), None

            new_beam, _ = jax.lax.scan(bbody, state.beam,
                                       jnp.arange(self.mout))

        # --- accumulate encoder output for second-pass rescoring
        new_enc_buf = state.enc_buf
        if self.rescore:
            # garbage rows past n_new are overwritten by the next chunk's
            # write (it starts at j_new); the rescorer masks past j_final
            new_enc_buf = jax.lax.dynamic_update_slice(
                state.enc_buf, enc_feat.astype(jnp.float32),
                (0, state.enc_frames, 0))

        new_state = StreamState(
            preemph_carry=carry,
            wave_tail=jnp.concatenate([state.wave_tail, y], 1)[:, -n_fft:],
            mel_buf=new_mel_buf,
            mel_cnt=cnt - sh,
            mel_total=total,
            enc_frames=j_new,
            enc_cache=cache_vars["cache"],
            ctc_prev=new_prev,
            beam=new_beam,
            enc_buf=new_enc_buf,
        )
        return new_state, ids, emit


def ctc_greedy_offline(net, variables: Dict[str, Any], feat: Array,
                       feat_len: Array) -> Tuple[np.ndarray, np.ndarray]:
    """Reference collapse for tests/serving checks: run the model offline
    and CTC-greedy-decode the encoder (blank=0). Returns (ids, emit) with
    the same semantics as the streaming calls, as numpy."""
    enc_feat, enc_len, _, _ = net.apply(
        variables, feat, feat_len, train=False,
        method=lambda m, f, fl, train: m.encode(f, fl, train=train))
    logits = net.apply(variables, enc_feat,
                       method=lambda m, x: m.ctc_logits(x))
    ids = np.asarray(jnp.argmax(logits, -1), dtype=np.int32)
    enc_len = np.asarray(enc_len)
    B, T = ids.shape
    emit = np.zeros((B, T), bool)
    for b in range(B):
        prev = 0
        for t in range(int(enc_len[b])):
            if ids[b, t] != 0 and ids[b, t] != prev:
                emit[b, t] = True
            prev = ids[b, t]
    return ids, emit
