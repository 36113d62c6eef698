"""Autoregressive TTS mel generation.

Rebuild of reference ``infer_func/tts_decoding.py:13-132`` with KV-cached
stepping under ``lax.while_loop``:

- the reference recomputes the full mel prefix through the decoder every
  frame (tts_decoding.py:78-87); here the decoder steps through its KV cache.
- the frame fed back is the post-postnet frame (``use_before=False``); since
  the Tacotron2 postnet is a non-causal conv stack, it is re-applied over
  the full (masked) prefix buffer each step and the current frame is taken —
  numerically identical to the reference's full-prefix call.
- stop law (tts_decoding.py:89-111): a frame's stop fires when
  sigmoid(stop) > threshold; generation continues ``continual_steps`` more
  frames; hard cap at text_len * maxlen_ratio / reduction_factor.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def make_tts_synthesizer(net, **decode_kwargs):
    """Return a JITTED ``fn(variables, text, text_len, spk_feat=None,
    spk_ids=None) -> results`` — compiles the AR while_loop into one
    executable (an eager lax.while_loop dispatches per-op per-frame, which
    is catastrophic on a remote TPU)."""
    import jax as _jax

    from speechain_tpu.infer.quantize import dequantize_variables

    @_jax.jit
    def synthesize(variables, text, text_len, spk_feat=None, spk_ids=None):
        # identity on float trees (infer/quantize.py weight_quant path)
        variables = dequantize_variables(variables)
        return tts_auto_regression(net, variables, text, text_len,
                                   spk_feat=spk_feat, spk_ids=spk_ids,
                                   **decode_kwargs)

    return synthesize


def tts_auto_regression(
    net,
    variables: Dict[str, Any],
    text: Array,
    text_len: Array,
    *,
    spk_feat: Optional[Array] = None,
    spk_ids: Optional[Array] = None,
    stop_threshold: float = 0.5,
    maxlen_ratio: float = 10.0,
    continual_steps: int = 0,
    use_before: bool = False,
    max_frames: Optional[int] = None,
    rng: Optional[jax.Array] = None,
) -> Dict[str, Array]:
    """Generate mel features for a batch of token sequences.

    rng drives the decoder-prenet dropout, which the reference deliberately
    keeps ON at inference (decoder/ar_tts.py:202-213 turn_on_dropout).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    c = net.cfg
    r = c.reduction_factor
    feat_dim = c.frontend.n_mels * r
    B = text.shape[0]
    base = {k: v for k, v in variables.items() if k != "cache"}
    logits_threshold = -math.log(1.0 / stop_threshold - 1.0)

    enc_text, enc_mask = net.apply(base, text, text_len, spk_feat=spk_feat,
                                   spk_ids=spk_ids, method=net.encode_text)
    # static frame capacity; per-utterance cap enforced inside the loop
    F = max_frames if max_frames is not None else max(
        2, int(text.shape[1] * maxlen_ratio / r) + 1)
    per_utt_cap = (text_len.astype(jnp.float32) * maxlen_ratio / r + 1)

    zero_frame = jnp.zeros((B, 1, feat_dim), jnp.float32)
    _, primed = net.apply(
        base, zero_frame, enc_text, enc_mask, spk_feat=spk_feat,
        spk_ids=spk_ids, prime=True, cache_capacity=F,
        method=net.decode_step, mutable=["cache"],
        rngs={"dropout": rng})

    def postnet_fn(before_buf):
        return net.apply(base, before_buf, method=net.apply_postnet)

    def step_fn(cache, frame, step):
        (stop, before), upd = net.apply(
            {**base, "cache": cache}, frame, enc_text, enc_mask,
            spk_feat=spk_feat, spk_ids=spk_ids, method=net.decode_step,
            mutable=["cache"],
            rngs={"dropout": jax.random.fold_in(rng, step)})
        return stop, before, upd["cache"]

    init = (jnp.zeros((), jnp.int32),            # step
            primed["cache"],
            jnp.zeros((B, F, feat_dim)),         # before buffer
            jnp.zeros((B, F, feat_dim)),         # emitted frames (after/bef)
            zero_frame,                          # last input frame
            jnp.zeros((B,), jnp.int32),          # stop_points
            jnp.zeros((B,), bool),               # stop_flags
            jnp.zeros((B,), jnp.int32))          # hypo_len

    def cond(s):
        step, _, _, _, _, _, flags, _ = s
        return (step < F) & ~jnp.all(flags)

    def body(s):
        step, cache, before_buf, out_buf, last, stop_points, flags, hlen = s
        stop, before, cache = step_fn(cache, last, step)
        before_buf = jax.lax.dynamic_update_slice(
            before_buf, before, (0, step, 0))
        if use_before:
            frame = before
        else:
            after_buf = postnet_fn(before_buf)
            frame = jax.lax.dynamic_slice(
                after_buf, (0, step, 0), (B, 1, feat_dim))
        frame = jnp.where(flags[:, None, None], 0.0, frame)
        out_buf = jax.lax.dynamic_update_slice(out_buf, frame, (0, step, 0))
        hlen = jnp.where(flags, hlen, hlen + 1)
        curr = step + 2  # reference counts the leading zero frame
        fired = stop[:, -1] > logits_threshold
        stop_points = jnp.where(fired & (stop_points == 0), curr,
                                stop_points)
        flags = ((stop_points != 0) & (curr >= stop_points + continual_steps)
                 ) | (hlen.astype(jnp.float32) >= per_utt_cap - 1)
        return (step + 1, cache, before_buf, out_buf, frame, stop_points,
                flags, hlen)

    (_, _, _, out_buf, _, _, _, hypo_len) = jax.lax.while_loop(
        cond, body, init)

    if r > 1:
        out_buf = out_buf.reshape(B, F * r, feat_dim // r)
        hypo_len = hypo_len * r
    return dict(
        hypo_feat=out_buf,
        hypo_feat_len=hypo_len,
        feat_token_len_ratio=hypo_len.astype(jnp.float32)
        / (text_len.astype(jnp.float32) + 1e-10),
    )
