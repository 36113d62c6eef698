"""SpecAugment: time warp + frequency/time masking, PRNG-keyed and
static-shaped.

Rebuild of reference ``module/augment/specaug.py:8-228``. Behavior parity:

- time warp picks a random center in [window+1, min_len-window) and a random
  target in [center-window, center+window), then stretches the two segments
  (specaug.py:88-127). The reference uses bicubic interpolation on dynamic
  segment sizes; on TPU this becomes a single piecewise-linear gather with a
  static output length — same distortion family, jit-compatible. Skipped when
  min_len <= 2*window + 1 (same guard).
- frequency masking: ``num`` random [pos, pos+len) bands per utterance with
  len ~ U[w0, w1], pos ~ U[0, max(1, D - max_len)) (specaug.py:133-163).
- time masking: widths absolute or relative to the batch min length, capped
  by min_len; same positional law (specaug.py:166-199).
- masked positions filled with 0.0 when ``feat_norm`` else the batch mean
  (specaug.py:201-204).

TPU notes: the reference draws mask positions bounded by the sampled max
mask length (`.item()` sync); here positions are drawn per-utterance with the
same bound computed from the traced max — no host sync, identical law.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    time_warp: bool = True
    time_warp_window: int = 5
    freq_mask: bool = True
    freq_mask_width: Union[int, Tuple[int, int]] = 30
    freq_mask_num: int = 2
    time_mask: bool = True
    time_mask_width: Union[int, float, Tuple] = 0.05
    time_mask_num: int = 2
    feat_norm: bool = True

    @property
    def freq_width_range(self) -> Tuple[int, int]:
        w = self.freq_mask_width
        return (0, int(w)) if isinstance(w, (int, float)) else (int(w[0]), int(w[1]))

    @property
    def time_width_range(self):
        w = self.time_mask_width
        return (0, w) if isinstance(w, (int, float)) else (w[0], w[1])


def _randint(key, shape, low, high):
    """Uniform ints in [low, high) with possibly-traced bounds (high > low)."""
    u = jax.random.uniform(key, shape)
    span = jnp.maximum(high - low, 1)
    return (low + (u * span).astype(jnp.int32)).astype(jnp.int32)


def warp_segments(feat: Array, center, target, min_len) -> Array:
    """Stretch feat[:, :center] to ``target`` frames and
    feat[:, center:min_len] to ``min_len - target`` frames, exactly
    torch.nn.functional.interpolate(mode='bilinear', align_corners=True)
    per segment (specaug.py:110-126): an output row t of a segment with
    S source and O output rows samples source position
    t * (S - 1) / (O - 1) (source position 0 when O == 1, torch's
    align-corners degenerate case). Frames at t >= min_len pass through.
    Exposed separately from the sampling so the law is golden-testable
    against torch (tests/test_torch_parity_conformer.py)."""
    B, T, D = feat.shape
    t = jax.lax.broadcasted_iota(jnp.float32, (T, 1), 0)[:, 0]
    centerf = jnp.asarray(center).astype(jnp.float32)
    targetf = jnp.asarray(target).astype(jnp.float32)
    minf = jnp.asarray(min_len).astype(jnp.float32)
    left = t * (centerf - 1.0) / jnp.maximum(targetf - 1.0, 1.0)
    left = jnp.where(targetf > 1.0, left, 0.0)
    right_out = minf - targetf
    right = centerf + (t - targetf) * (minf - centerf - 1.0) / jnp.maximum(
        right_out - 1.0, 1.0)
    right = jnp.where(right_out > 1.0, right, centerf)
    src = jnp.where(t < targetf, left, right)
    src = jnp.where(t >= minf, t, src)
    src = jnp.clip(src, 0.0, T - 1.0)

    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    w = (src - lo.astype(jnp.float32))[None, :, None]
    return (1.0 - w) * feat[:, lo] + w * feat[:, hi]


def _time_warp(key, feat: Array, min_len: Array, window: int) -> Array:
    """Piecewise-linear time warp within [0, min_len) (specaug.py:88-127)."""
    k1, k2 = jax.random.split(key)
    center = _randint(k1, (), window + 1, min_len - window)
    target = _randint(k2, (), center - window, center + window)
    gathered = warp_segments(feat, center, target, min_len)
    do_warp = min_len > 2 * window + 1
    return jnp.where(do_warp, gathered, feat)


@partial(jax.jit, static_argnames=("cfg",))
def spec_augment(key: jax.Array, feat: Array, feat_len: Array,
                 cfg: SpecAugmentConfig = SpecAugmentConfig()) -> Array:
    """feat (B, T, D) -> augmented feat; feat_len unchanged."""
    B, T, D = feat.shape
    min_len = jnp.min(feat_len).astype(jnp.int32)
    k_warp, k_flen, k_fpos, k_tlen, k_tpos = jax.random.split(key, 5)

    if cfg.time_warp:
        feat = _time_warp(k_warp, feat, min_len, cfg.time_warp_window)

    mask = jnp.zeros((B, T, D), bool)
    if cfg.freq_mask:
        w0, w1 = cfg.freq_width_range
        mlen = _randint(k_flen, (B, cfg.freq_mask_num), w0, w1 + 1)  # (B, N)
        mpos = _randint(k_fpos, (B, cfg.freq_mask_num), 0,
                        jnp.maximum(1, D - jnp.max(mlen)))
        ax = jax.lax.broadcasted_iota(jnp.int32, (1, 1, D), 2)
        fm = (mpos[..., None] <= ax) & (ax < (mpos + mlen)[..., None])
        mask = mask | jnp.any(fm, axis=1)[:, None, :]

    if cfg.time_mask:
        t0, t1 = cfg.time_width_range
        lo = (jnp.floor(t0 * min_len).astype(jnp.int32)
              if isinstance(t0, float) else jnp.asarray(int(t0)))
        hi = (jnp.floor(t1 * min_len).astype(jnp.int32)
              if isinstance(t1, float) else jnp.asarray(int(t1)))
        hi = jnp.minimum(hi, min_len)
        mlen = _randint(k_tlen, (B, cfg.time_mask_num), lo, hi + 1)
        mpos = _randint(k_tpos, (B, cfg.time_mask_num), 0,
                        jnp.maximum(1, min_len - jnp.max(mlen)))
        ax = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
        tm = (mpos[..., None] <= ax) & (ax < (mpos + mlen)[..., None])
        mask = mask | jnp.any(tm, axis=1)[:, :, None]

    fill = jnp.asarray(0.0, feat.dtype) if cfg.feat_norm else jnp.mean(feat)
    return jnp.where(mask, fill, feat)
