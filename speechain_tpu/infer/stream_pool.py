"""Continuous-batching streaming ASR: many concurrent streams, one chip.

`StreamingASR` (infer/streaming.py) advances all batch rows in lockstep —
fine for batch transcription, wrong for serving, where streams attach,
advance, idle and finish independently. `StreamPool` generalizes every
per-stream quantity to a per-row vector and fuses the three lockstep
executables (start/step/finish) into ONE `tick` whose per-row behavior is
selected by a mode vector:

    MODE_IDLE    slot inactive this tick (no audio ready / free slot)
    MODE_START   first chunk of a new stream (row state resets in-kernel)
    MODE_STEP    steady mid-stream chunk
    MODE_FINISH  last (ragged, zero-padded) chunk
    MODE_ONESHOT start+finish in one chunk (stream shorter than one chunk)

so a single device dispatch serves B slots in arbitrary phases — the
classic TPU continuous-batching pattern. Emitted tokens per stream remain
EXACTLY the offline model's CTC-greedy output on that stream's waveform
(tests/test_stream_pool.py), the same guarantee the lockstep path makes.

TPU-native details (all static shapes, one donated state pytree):

- **Unified framing as a gather.** start materializes a left reflect pad,
  step slides a steady window, finish materializes a right reflect pad —
  three different concat geometries in the lockstep path. Here each row
  builds (maxf, n_fft) gather indices into [wave_tail | chunk] from its
  mode: a per-row base offset, then `u < n_fft -> 2*n_fft - u` (left
  reflect, start rows) and `u > e -> 2*e - u` (right reflect about the
  per-row last real sample, finish rows). One `vmap`ped gather replaces
  all three paths.
- **Per-row KV-cache positions.** The causal encoder's chunked decode
  (nn/attention.py) accepts a (B,) `decode_position`: each row writes its
  K/V rows at its OWN cache offset (vmapped dynamic_update_slice) and
  masks attention at `pos <= index[b] + row`; the sinusoid posenc gathers
  per-row rows (nn/posenc.py). Slot REUSE needs no cache clearing: a
  restarted row only ever attends positions `<= index + row`, all of
  which it has itself (re)written — stale K/V above the row's position is
  unreachable, stale K/V below it is overwritten before it can be read.
- **Idle rows are free-running.** Inactive slots process garbage zeros
  whose effects are provably unread: emitted frames are masked by a
  per-row valid count, mel-buffer garbage is masked by the per-row frame
  count, and garbage K/V rows land at `index`, exactly where the stream's
  next real chunk rewrites. Only `preemph_carry`/`wave_tail` need an
  explicit per-row hold.

The reference has no streaming mode at all (its beam search re-forwards
full utterances, ``infer_func/beam_search.py:299-474``); this module is
beyond-parity serving infrastructure.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from speechain_tpu.ops.feat_norm import apply_feat_norm
from speechain_tpu.ops.frontend import to_float_wave
from speechain_tpu.infer.streaming import _StreamBase

Array = jnp.ndarray

MODE_IDLE, MODE_START, MODE_STEP, MODE_FINISH, MODE_ONESHOT = range(5)


class PoolState(NamedTuple):
    """Device-resident pool state: every stream quantity is per-row."""

    preemph_carry: Array   # (B, 1) last raw sample of the row's last chunk
    wave_tail: Array       # (B, n_fft) row's last pre-emphasized samples
    mel_buf: Array         # (B, MELBUF, n_mels) anchored at S_eff * J[b]
    mel_cnt: Array         # (B,) frames currently valid in mel_buf
    mel_total: Array       # (B,) total mel frames the row has produced
    enc_frames: Array      # (B,) prenet/encoder frames emitted (= J[b])
    enc_cache: Any         # flax 'cache' of the causal encoder
    ctc_prev: Array        # (B,) last argmax id (greedy collapse carry)
    blank_run: Array       # (B,) trailing all-blank encoder frames (the
    #                        CTC endpointing signal; StreamServer reads it)
    beam: Any = None       # per-row PrefixBeamState when beam_size > 0
    enc_buf: Any = None    # (B, cap, D) encoder outputs when rescore=True


class StreamPool(_StreamBase):
    """Slot-multiplexed exact streaming recognizer (continuous batching).

    Usage::

        pool = StreamPool(net, variables, slots=16, chunk_samples=4000,
                          max_frames=2048)
        state = pool.reset()
        state, ids, emit = pool.tick(state, chunks, modes, tail_lens)

    ``chunks (B, S) float``, ``modes (B,) int32`` (MODE_*), ``tail_lens
    (B,) int32`` (real samples in FINISH/ONESHOT rows; ignored elsewhere).
    Returns per-row ``ids (B, K)`` / ``emit (B, K)`` like the lockstep
    calls. Constraints beyond the lockstep ones: every stream must be
    longer than ``n_fft // 2`` samples (the offline reflect-pad validity
    bound), and no stream may exceed ``max_frames`` encoder frames.
    Most callers want the host-side `StreamServer` wrapper below.
    """

    def __init__(self, net, variables: Dict[str, Any], *, slots: int,
                 chunk_samples: int, max_frames: int = 4096, **kwargs):
        super().__init__(net, variables, chunk_samples=chunk_samples,
                         max_frames=max_frames, **kwargs)
        self.slots = slots
        self._tick = jax.jit(self._tick_impl, donate_argnums=(1,))

    def reset(self) -> PoolState:
        B, D = self.slots, self.n_mels
        beam = enc_buf = None
        if self.beam_size > 0:
            from speechain_tpu.infer.ctc_prefix_beam import prefix_beam_init
            beam = prefix_beam_init(B, self.beam_size, self.max_text_len)
        if self.rescore:
            d_enc = self.cfg.encoder["d_model"]
            enc_buf = jnp.zeros((B, self.cap + self.mout, d_enc),
                                jnp.float32)
        return PoolState(
            preemph_carry=jnp.zeros((B, 1), jnp.float32),
            wave_tail=jnp.zeros((B, self.cfg.frontend.fft), jnp.float32),
            mel_buf=jnp.zeros((B, self.melbuf, D), jnp.float32),
            mel_cnt=jnp.zeros((B,), jnp.int32),
            mel_total=jnp.zeros((B,), jnp.int32),
            enc_frames=jnp.zeros((B,), jnp.int32),
            enc_cache=self._prime_cache(B),
            ctc_prev=jnp.zeros((B,), jnp.int32),
            blank_run=jnp.zeros((B,), jnp.int32),
            beam=beam,
            enc_buf=enc_buf,
        )

    def final_nbest_row(self, state: PoolState, row: int,
                        **kwargs) -> Dict[str, np.ndarray]:
        """N-best (and optional second-pass rescoring) of ONE slot row —
        see StreamingASR.final_nbest; call at the row's finish tick,
        before the slot is reused (a restarting row resets its beam).
        Returns arrays with a leading batch dim of 1."""
        beam = jax.tree_util.tree_map(lambda x: x[row:row + 1], state.beam)
        enc_buf = (state.enc_buf[row:row + 1]
                   if state.enc_buf is not None else None)
        return self._nbest_impl(beam, enc_buf, state.enc_frames[row],
                                **kwargs)

    def tick(self, state: PoolState, chunks: Array, modes,
             tail_lens) -> Tuple[PoolState, Array, Array]:
        return self._tick(self.exec_variables, state, chunks,
                          jnp.asarray(modes, jnp.int32),
                          jnp.asarray(tail_lens, jnp.int32))

    # --------------------------------------------------- the tick function

    def _tick_impl(self, variables: Dict[str, Any], state: PoolState,
                   chunk: Array, modes: Array, tail_len: Array):
        from speechain_tpu.infer.quantize import dequantize_variables
        variables = dequantize_variables(variables)
        fe = self.cfg.frontend
        n_fft, hop, p = fe.fft, fe.hop, fe.fft // 2
        chunk = to_float_wave(chunk)
        B = chunk.shape[0]

        is_start = (modes == MODE_START) | (modes == MODE_ONESHOT)
        is_fin = (modes == MODE_FINISH) | (modes == MODE_ONESHOT)
        active = modes != MODE_IDLE

        # --- per-row in-kernel reset of (re)starting rows
        carry_in = jnp.where(is_start[:, None], 0.0, state.preemph_carry)
        mel_cnt = jnp.where(is_start, 0, state.mel_cnt)
        mel_total = jnp.where(is_start, 0, state.mel_total)
        enc_frames = jnp.where(is_start, 0, state.enc_frames)
        ctc_prev = jnp.where(is_start, 0, state.ctc_prev)
        blank_run = jnp.where(is_start, 0, state.blank_run)

        # --- pre-emphasis with per-row carry (frontend.py:236-241)
        if fe.preemphasis is not None:
            prev = jnp.concatenate([carry_in, chunk[:, :-1]], 1)
            y = chunk - fe.preemphasis * prev
        else:
            y = chunk
        ycat = jnp.concatenate([state.wave_tail, y], 1)   # (B, n_fft + S)
        L = ycat.shape[1]

        # --- unified per-row framing gather. Frame j, in-window sample t:
        #   start rows:       u = n_fft + j*hop - p + t   (y starts at n_fft)
        #   step/finish rows: u = rel0 + j*hop + t        (steady invariant)
        # then reflect: left about y[0] for start rows, right about the
        # per-row last real sample e for finish rows. Single application
        # of each is exact because streams are > p samples long (the same
        # bound offline reflect-padding needs).
        base = jnp.where(is_start, n_fft - p, self._rel0())       # (B,)
        grid = (jnp.arange(self.maxf) * hop)[:, None] + \
            jnp.arange(n_fft)[None, :]                  # (maxf, n_fft)
        u = base[:, None, None] + grid[None]
        u = jnp.where(is_start[:, None, None] & (u < n_fft),
                      2 * n_fft - u, u)
        e = (n_fft + tail_len - 1)[:, None, None]
        u = jnp.where(is_fin[:, None, None] & (u > e), 2 * e - u, u)
        u = jnp.clip(u, 0, L - 1)
        frames = jax.vmap(lambda yc, uu: yc[uu])(ycat, u)
        mel = self._logmel(frames)                  # (B, maxf, n_mels)

        # --- per-row valid frame counts. finish/oneshot rows: the offline
        # total F = floor((cum_samples + 2p - n_fft)/hop) + 1 minus what the
        # row already produced; cum so far = (mel_total-1)*hop + p + r with
        # the constant residue r (S % hop == 0), see streaming.py `finish`.
        r = (hop - p % hop) % hop
        cum_prev = jnp.where(mel_total > 0,
                             (mel_total - 1) * hop + p + r, 0)
        f_total = (cum_prev + tail_len + 2 * p - n_fft) // hop + 1
        n_valid_f = jnp.where(
            modes == MODE_START, self.n0,
            jnp.where(modes == MODE_STEP, self.m,
                      jnp.where(active,
                                jnp.maximum(f_total - mel_total, 0), 0)))

        # --- eval-mode feature normalization (per-frame affine)
        if self.cfg.feat_norm is not None:
            flen = jnp.full((B,), mel.shape[1], jnp.int32)
            mel, _, _ = apply_feat_norm(self._norm_stats, mel, flen,
                                        self.cfg.feat_norm, train=False)

        # --- mel ring buffer, per-row anchored at S_eff * enc_frames
        buf = jax.vmap(lambda b_, m_, c_: jax.lax.dynamic_update_slice(
            b_, m_, (c_, 0)))(state.mel_buf, mel.astype(jnp.float32),
                              mel_cnt)
        total = mel_total + n_valid_f
        cnt = mel_cnt + n_valid_f
        posn = jnp.arange(self.melbuf)[None, :, None]
        buf = jnp.where(posn < cnt[:, None, None], buf, 0.0)

        # --- prenet over the per-row-anchored static window
        j_new = jnp.maximum((total - self.recept) // self.s_eff + 1, 0)
        n_new = j_new - enc_frames                       # (B,) <= mout
        window = buf[:, :self.pw].astype(self.cfg.dtype)
        wlen = jnp.full((B,), self.pw, jnp.int32)
        pre, _ = self.net.apply(
            variables, window, wlen,
            method=lambda m, f, fl: m.enc_prenet(f, fl, train=False))
        pre = pre[:, :self.mout]

        # shift each row so its buffer stays anchored at S_eff * j_new[b]
        sh = self.s_eff * n_new
        buf2 = jnp.concatenate([buf, jnp.zeros_like(buf)], 1)
        new_mel_buf = jax.vmap(lambda b_, s_: jax.lax.dynamic_slice(
            b_, (s_, 0), (self.melbuf, self.n_mels)))(buf2, sh)

        # --- causal encoder chunk, per-row KV-cache positions
        enc_out, cache_vars = self.net.apply(
            {**variables, "cache": state.enc_cache}, pre, enc_frames, n_new,
            is_start,
            method=lambda m, x, pos, adv, rst: m.encoder(
                x, None, decode=True, cache_capacity=self.cap,
                decode_position=pos, decode_advance=adv, decode_reset=rst),
            mutable=["cache"])
        enc_feat = enc_out[0]                            # (B, mout, D)

        # --- CTC head + per-row greedy collapse (blank=0)
        logits = self.net.apply(variables, enc_feat,
                                method=lambda m, x: m.ctc_logits(x))
        ids = jnp.argmax(logits, -1).astype(jnp.int32)   # (B, mout)
        valid = jnp.arange(self.mout)[None, :] < n_new[:, None]
        prevs = jnp.concatenate([ctc_prev[:, None], ids[:, :-1]], 1)
        emit = (ids != 0) & (ids != prevs) & valid
        last_idx = jnp.maximum(n_new - 1, 0)
        last_ids = jnp.take_along_axis(ids, last_idx[:, None], 1)[:, 0]
        new_prev = jnp.where(n_new > 0, last_ids, ctc_prev)

        # trailing all-blank encoder-frame run (CTC endpointing signal):
        # extend across ticks when every valid frame is blank, else count
        # from the last non-blank valid frame. Idle rows add n_new = 0.
        pos_idx = jnp.arange(self.mout)[None, :]
        nonblank = (ids != 0) & valid
        any_nb = nonblank.any(1)
        last_nb = jnp.max(jnp.where(nonblank, pos_idx, -1), 1)
        new_run = jnp.where(any_nb, n_new - 1 - last_nb,
                            blank_run + n_new)

        # --- per-row first-pass prefix beam (restarting rows reset to the
        # empty-prefix init in-kernel; idle rows hold bit-identically via
        # the per-row valid mask)
        new_beam = state.beam
        if self.beam_size > 0:
            from speechain_tpu.infer.ctc_prefix_beam import (
                prefix_beam_init, prefix_beam_update)
            init_b = prefix_beam_init(B, self.beam_size, self.max_text_len)

            def rsel(i, s):
                k = is_start.reshape((B,) + (1,) * (s.ndim - 1))
                return jnp.where(k, i, s)

            beam = jax.tree_util.tree_map(rsel, init_b, state.beam)
            logp = jax.nn.log_softmax(
                logits.astype(jnp.float32).at[..., self.sos_eos].set(
                    -1e30), -1)

            def bbody(bs, t):
                ok = active & (t < n_new)
                return prefix_beam_update(bs, logp[:, t], valid=ok,
                                          prune=self.beam_prune), None

            new_beam, _ = jax.lax.scan(bbody, beam, jnp.arange(self.mout))

        # --- per-row encoder-output accumulation for second-pass rescoring.
        # Idle/garbage writes land at the row's own position j and are
        # always overwritten by the row's next REAL chunk (which starts at
        # the same j) before enc_frames advances past them — the same
        # argument that makes the KV cache safe under slot reuse.
        new_enc_buf = state.enc_buf
        if self.rescore:
            new_enc_buf = jax.vmap(
                lambda b_, e_, c_: jax.lax.dynamic_update_slice(
                    b_, e_, (c_, 0)))(state.enc_buf,
                                      enc_feat.astype(jnp.float32),
                                      enc_frames)

        act2 = active[:, None]
        new_state = PoolState(
            preemph_carry=jnp.where(act2, chunk[:, -1:],
                                    state.preemph_carry),
            wave_tail=jnp.where(act2, ycat[:, -n_fft:], state.wave_tail),
            mel_buf=new_mel_buf,
            mel_cnt=cnt - sh,
            mel_total=total,
            enc_frames=j_new,
            enc_cache=cache_vars["cache"],
            ctc_prev=new_prev,
            blank_run=new_run,
            beam=new_beam,
            enc_buf=new_enc_buf,
        )
        return new_state, ids, emit


class StreamServer:
    """Host-side continuous-batching front desk over a `StreamPool`.

    Sessions attach to free slots, feed raw samples at their own pace, and
    are packed into one pool tick per `step()` call::

        server = StreamServer(pool)
        server.open("alice"); server.open("bob")
        server.feed("alice", samples)              # any amount, any time
        fresh = server.step()                      # {"alice": [tok, ...]}
        server.end("bob")                          # end-of-stream marker
        done = server.step()                       # flushes finished rows
        server.result("bob")                       # full token list

    `step()` runs exactly ONE device dispatch regardless of how many
    sessions are in which phase. Slots recycle the moment a stream
    finishes; opening more sessions than slots raises.
    """

    def __init__(self, pool: StreamPool,
                 endpoint_blank_ms: Optional[float] = None,
                 lm_net=None, lm_variables: Optional[Dict] = None,
                 lm_weight: float = 0.0):
        """``endpoint_blank_ms``: if set, a live stream whose trailing
        run of all-blank encoder frames covers at least this many
        milliseconds is flagged by :meth:`endpointed` — the standard CTC
        endpointing signal. The server only SIGNALS; the application
        decides when to ``end()`` the stream.

        ``lm_net``/``lm_variables``/``lm_weight``: external LM n-best
        rescoring applied inside :meth:`nbest` capture (pools built with
        ``beam_size > 0``)."""
        self.pool = pool
        self._lm = (lm_net, lm_variables, lm_weight)
        self._nbest: Dict[str, Dict[str, np.ndarray]] = {}
        self.state = pool.reset()
        S = pool.S
        fe = pool.cfg.frontend
        self._ep_frames = None
        if endpoint_blank_ms is not None:
            frame_ms = pool.s_eff * fe.hop / fe.sr * 1000.0
            self._ep_frames = max(int(endpoint_blank_ms / frame_ms), 1)
        self._endpointed: Dict[str, bool] = {}
        self._free: List[int] = list(range(pool.slots))[::-1]
        self._slot: Dict[str, int] = {}
        self._fifo: Dict[str, np.ndarray] = {}
        self._started: Dict[str, bool] = {}
        self._ended: Dict[str, bool] = {}
        self._frames: Dict[str, int] = {}
        self._tokens: Dict[str, List[int]] = {}
        self._done: Dict[str, List[int]] = {}
        self._encf: Dict[str, int] = {}
        self._tok_frames: Dict[str, List[int]] = {}
        self._done_frames: Dict[str, List[int]] = {}
        self._S = S
        self._min_samples = pool.cfg.frontend.fft // 2 + 1

    @property
    def frame_seconds(self) -> float:
        """Duration of one encoder output frame in seconds (token
        timestamps are frame indices times this)."""
        fe = self.pool.cfg.frontend
        return self.pool.s_eff * fe.hop / fe.sr

    def open(self, uid: str) -> None:
        if uid in self._slot or uid in self._done:
            raise ValueError(f"stream {uid!r} already exists")
        if not self._free:
            raise RuntimeError("no free slots")
        self._slot[uid] = self._free.pop()
        self._fifo[uid] = np.zeros((0,), np.float32)
        self._endpointed[uid] = False
        self._started[uid] = False
        self._ended[uid] = False
        self._frames[uid] = 0
        self._tokens[uid] = []
        self._encf[uid] = 0
        self._tok_frames[uid] = []

    def feed(self, uid: str, samples) -> None:
        if self._ended[uid]:
            raise ValueError(f"stream {uid!r} already ended")
        self._fifo[uid] = np.concatenate(
            [self._fifo[uid], np.asarray(samples, np.float32).reshape(-1)])

    def end(self, uid: str) -> None:
        if self._ended[uid]:
            return
        total_known = len(self._fifo[uid])
        if not self._started[uid] and total_known < self._min_samples:
            raise ValueError(
                f"stream {uid!r} is {total_known} samples; streams must "
                f"be > n_fft/2 = {self._min_samples - 1} samples (offline "
                "reflect-pad validity)")
        self._ended[uid] = True

    def buffered(self, uid: str) -> int:
        """Samples fed but not yet consumed by a tick."""
        return len(self._fifo[uid])

    def cutoff(self, uid: str) -> int:
        """The endpointing ACTION: discard every buffered-but-unprocessed
        sample and end the stream where it stands, so the final flush
        covers exactly the audio ticked so far. Returns the number of
        samples discarded. Only meaningful on a started stream (an
        endpoint can only fire after frames were processed)."""
        if not self._started[uid]:
            raise ValueError(f"stream {uid!r} has not started")
        n = len(self._fifo[uid])
        self._fifo[uid] = self._fifo[uid][:0]
        self._ended[uid] = True
        return n

    def result(self, uid: str) -> Optional[List[int]]:
        """Final token list once the stream has fully flushed, else None."""
        return self._done.get(uid)

    def nbest(self, uid: str) -> Optional[Dict[str, np.ndarray]]:
        """Two-pass final for a finished stream: the first-pass prefix-beam
        n-best captured at its finish tick, rescored per the pool/server
        config (attention pass when the pool has ``rescore=True``, external
        LM when the server got one). Arrays carry a leading dim of 1;
        ``nbest(uid)['tokens'][0, 0, :nbest(uid)['lengths'][0, 0]]`` is the
        best hypothesis. None until the stream flushes (or no beam)."""
        return self._nbest.get(uid)

    def result_frames(self, uid: str) -> Optional[List[int]]:
        """Per-token emission timestamps, parallel to :meth:`result`: the
        global encoder-frame index where CTC emitted each token (seconds =
        index * :attr:`frame_seconds`). None until the stream flushes."""
        return self._done_frames.get(uid)

    @property
    def active(self) -> int:
        """Number of sessions currently holding a slot."""
        return len(self._slot)

    def endpointed(self, uid: str) -> bool:
        """True once the stream's trailing blank run crossed
        ``endpoint_blank_ms`` (sticky until the stream finishes)."""
        return self._endpointed.get(uid, False)

    def step(self) -> Dict[str, List[int]]:
        """Pack every ready slot into one tick; returns the NEW tokens each
        live stream emitted this tick (finished streams flush into
        `result`)."""
        pool, S = self.pool, self._S
        B = pool.slots
        chunks = np.zeros((B, S), np.float32)
        modes = np.zeros((B,), np.int32)
        tails = np.zeros((B,), np.int32)
        finishing: List[str] = []

        for uid, b in self._slot.items():
            fifo = self._fifo[uid]
            if len(fifo) >= S:
                # capacity guard: the encoder KV cache holds pool.cap
                # frames; j mel frames yield at most j//s_eff + 1 of them,
                # and each tick WRITES mout rows from the row's position
                # (dynamic_update_slice clamps — an out-of-bounds write
                # would silently corrupt, so leave mout slack)
                nxt = self._frames[uid] + self.pool.m
                if (nxt + self.pool.maxf - self.pool.m) // self.pool.s_eff \
                        + 1 + self.pool.mout > self.pool.cap:
                    raise RuntimeError(
                        f"stream {uid!r} exceeds the pool's max_frames="
                        f"{self.pool.cap} encoder-frame capacity")
                chunks[b] = fifo[:S]
                self._fifo[uid] = fifo[S:]
                modes[b] = MODE_STEP if self._started[uid] else MODE_START
                self._started[uid] = True
                self._frames[uid] = nxt
            elif self._ended[uid]:
                chunks[b, :len(fifo)] = fifo
                tails[b] = len(fifo)
                self._fifo[uid] = fifo[:0]
                modes[b] = (MODE_FINISH if self._started[uid]
                            else MODE_ONESHOT)
                finishing.append(uid)
            # else: idle — not enough audio buffered yet

        self.state, ids, emit = pool.tick(self.state, jnp.asarray(chunks),
                                          modes, tails)
        ids, emit = np.asarray(ids), np.asarray(emit)
        j_after = np.asarray(self.state.enc_frames)
        runs = (np.asarray(self.state.blank_run)
                if self._ep_frames is not None else None)

        fresh: Dict[str, List[int]] = {}
        for uid, b in list(self._slot.items()):
            if modes[b] == MODE_IDLE:
                continue
            pos = np.nonzero(emit[b])[0]
            new = ids[b][pos].tolist()
            self._tokens[uid].extend(new)
            # emission timestamps: tick-local positions are offsets from
            # the stream's encoder frame count BEFORE this tick (START/
            # ONESHOT rows reset to 0, matching open()'s init)
            self._tok_frames[uid].extend((self._encf[uid] + pos).tolist())
            self._encf[uid] = int(j_after[b])
            if new:
                fresh[uid] = new
            if runs is not None and self._started[uid] and \
                    runs[b] >= self._ep_frames:
                self._endpointed[uid] = True
            if uid in finishing:
                if self.pool.beam_size > 0:
                    # capture the row's n-best NOW — the beam resets when
                    # the recycled slot starts its next stream
                    lm_net, lm_vars, lm_w = self._lm
                    self._nbest[uid] = self.pool.final_nbest_row(
                        self.state, b, lm_net=lm_net, lm_variables=lm_vars,
                        lm_weight=lm_w)
                self._done[uid] = self._tokens.pop(uid)
                self._done_frames[uid] = self._tok_frames.pop(uid)
                self._free.append(self._slot.pop(uid))
                for d in (self._fifo, self._started, self._ended,
                          self._frames, self._endpointed, self._encf):
                    d.pop(uid)
        return fresh

    def drain(self) -> None:
        """Tick until every ended stream has flushed."""
        while any(self._ended.get(u) for u in self._slot):
            self.step()
