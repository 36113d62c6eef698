"""Feature normalization with running statistics.

Rebuild of reference ``module/norm/feat_norm.py:12-635``: four granularities
(utterance / batch / group / global), running mean/std kept as a moving
average over the first ``max_epoch_num`` epochs, synchronized across the data
mesh, and invertible at inference (``recover``).

TPU-native re-design (feat_norm.py's lazily-registered buffers + all_gather
protocol become):
- an explicit stats **pytree** carried in the train state: per-group running
  ``mean``/``std``/``batch`` count plus the all-group average ``aver_mean``/
  ``aver_std`` fallback (feat_norm.py:510-531). 'global' is the special case
  of a single group. Groups are a declared, fixed-size vocabulary
  (``num_groups``) instead of dynamically materialized buffers — required
  for static shapes, and covers every recipe in the reference (speaker /
  domain vocabularies are known up front).
- cross-replica sync via ``psum`` of (sum-of-means, count) inside the jitted
  step (mathematically identical to the reference's gather-then-average,
  cheaper on ICI) instead of ``all_gather`` of padded per-rank matrices
  (feat_norm.py:340-425).

Note the reference's statistics law, preserved exactly: the running "std" is
the running average of *per-utterance stds* (not a pooled std), each
utterance weighted equally regardless of length; per-utterance std uses the
unbiased (n-1) estimator (torch.Tensor.std default).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class FeatNormConfig:
    norm_type: str = "global"          # utterance | batch | group | global
    mean_norm: bool = True
    std_norm: bool = True
    clamp: float = 1e-10
    max_epoch_num: int = 4
    num_groups: int = 1                # declared group vocabulary size
    feat_dim: int = 80


class NormStats(NamedTuple):
    """Running statistics pytree. Shapes: (G, D), (G, D), (G,), (G,), (D,), (D,)."""

    mean: Array
    std: Array
    batch: Array       # per-group update counts (float for math convenience)
    seen: Array        # bool: group has received at least one update
    aver_mean: Array   # average over seen groups (fallback for unseen ids)
    aver_std: Array


def init_stats(cfg: FeatNormConfig) -> NormStats:
    G, D = cfg.num_groups, cfg.feat_dim
    return NormStats(
        mean=jnp.zeros((G, D), jnp.float32),
        std=jnp.ones((G, D), jnp.float32),
        batch=jnp.zeros((G,), jnp.float32),
        seen=jnp.zeros((G,), bool),
        aver_mean=jnp.zeros((D,), jnp.float32),
        aver_std=jnp.ones((D,), jnp.float32),
    )


def _per_utt_stats(feat: Array, feat_len: Array, clamp: float):
    """Per-utterance mean/std over valid frames. feat (B, T, D)."""
    B, T, D = feat.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)
    valid = (pos < feat_len[:, None, None]).astype(jnp.float32)
    n = jnp.maximum(feat_len.astype(jnp.float32), 1.0)[:, None]
    mean = jnp.sum(feat * valid, axis=1) / n                     # (B, D)
    sq = jnp.sum((feat - mean[:, None, :]) ** 2 * valid, axis=1)
    std = jnp.sqrt(sq / jnp.maximum(n - 1.0, 1.0))               # unbiased
    return mean, jnp.clip(std, min=clamp)


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def coerce_stats(stats) -> Optional[NormStats]:
    """Accept a NormStats or a plain dict (orbax restores NamedTuples as
    dicts when no template pytree is supplied)."""
    if stats is None or isinstance(stats, NormStats):
        return stats
    if isinstance(stats, dict):
        return NormStats(**stats)
    return NormStats(*stats)


def apply_feat_norm(
    stats: Optional[NormStats],
    feat: Array,
    feat_len: Array,
    cfg: FeatNormConfig,
    *,
    train: bool = False,
    epoch: Optional[Array] = None,
    group_ids: Optional[Array] = None,
    axis_name: Optional[str] = None,
) -> Tuple[Array, Array, Optional[NormStats]]:
    """Normalize ``feat`` and (in training) update the running stats.

    group_ids: (B,) int32 indices into the declared group vocabulary, or None
        (treated as group 0 — the 'global'/single-group case, including the
        reference's scalar-group_ids batches).
    Returns (feat, feat_len, new_stats).
    """
    stats = coerce_stats(stats)
    squeeze = feat.ndim == 2
    if squeeze:
        feat = feat[..., None]
    mean_b, std_b = _per_utt_stats(feat, feat_len, cfg.clamp)

    if cfg.norm_type == "utterance":
        out = feat
        if cfg.mean_norm:
            out = out - mean_b[:, None, :]
        if cfg.std_norm:
            out = out / std_b[:, None, :]
        return (out[..., 0] if squeeze else out), feat_len, stats

    # zero-length rows are batch-bucket padding: exclude them from every
    # statistic (the reference only ever sees real utterances)
    validf = (feat_len > 0).astype(jnp.float32)

    if cfg.norm_type == "batch":
        if train:
            bsz = jnp.maximum(_psum(jnp.sum(validf), axis_name), 1.0)
            bm = _psum(jnp.sum(mean_b * validf[:, None], 0), axis_name) / bsz
            bs = _psum(jnp.sum(std_b * validf[:, None], 0), axis_name) / bsz
            out = feat
            if cfg.mean_norm:
                out = out - bm
            if cfg.std_norm:
                out = out / bs
        else:
            out = feat
            if cfg.mean_norm:
                out = out - mean_b[:, None, :]
            if cfg.std_norm:
                out = out / std_b[:, None, :]
        return (out[..., 0] if squeeze else out), feat_len, stats

    assert cfg.norm_type in ("global", "group"), cfg.norm_type
    assert stats is not None, "global/group norm requires a NormStats state"
    G = cfg.num_groups
    if group_ids is None:
        group_ids = jnp.zeros((feat.shape[0],), jnp.int32)

    new_stats = stats
    if train:
        do_update = (jnp.asarray(True) if epoch is None
                     else (epoch <= cfg.max_epoch_num))
        onehot = jax.nn.one_hot(group_ids, G, dtype=jnp.float32)     # (B, G)
        onehot = onehot * validf[:, None]      # drop zero-length padding rows
        cnt = _psum(jnp.sum(onehot, 0), axis_name)                   # (G,)
        gsum_mean = _psum(onehot.T @ mean_b, axis_name)              # (G, D)
        gsum_std = _psum(onehot.T @ std_b, axis_name)
        has_data = cnt > 0
        g_mean = gsum_mean / jnp.maximum(cnt, 1.0)[:, None]
        g_std = gsum_std / jnp.maximum(cnt, 1.0)[:, None]

        new_batch = jnp.where(do_update & has_data,
                              stats.batch + 1.0, stats.batch)
        w = jnp.where(new_batch > 0, 1.0 / jnp.maximum(new_batch, 1.0), 1.0)
        upd = (do_update & has_data)[:, None]
        # first update for a group replaces; later ones moving-average
        first = (~stats.seen)[:, None]
        mixed_mean = jnp.where(
            first, g_mean,
            w[:, None] * g_mean + (1.0 - w[:, None]) * stats.mean)
        mixed_std = jnp.where(
            first, g_std,
            w[:, None] * g_std + (1.0 - w[:, None]) * stats.std)
        new_mean = jnp.where(upd, mixed_mean, stats.mean)
        new_std = jnp.where(upd, mixed_std, stats.std)
        new_seen = stats.seen | (do_update & has_data)

        n_seen = jnp.maximum(jnp.sum(new_seen.astype(jnp.float32)), 1.0)
        seen_f = new_seen.astype(jnp.float32)[:, None]
        aver_mean = jnp.sum(new_mean * seen_f, 0) / n_seen
        aver_std = jnp.sum(new_std * seen_f, 0) / n_seen
        aver_mean = jnp.where(do_update, aver_mean, stats.aver_mean)
        aver_std = jnp.where(do_update, aver_std, stats.aver_std)
        new_stats = NormStats(new_mean, new_std, new_batch, new_seen,
                              aver_mean, aver_std)

    # normalize with (possibly just-updated) per-group stats; unseen groups
    # fall back to the all-group average (feat_norm.py:510-531)
    seen_sel = new_stats.seen[group_ids][:, None]                    # (B, 1)
    use_mean = jnp.where(seen_sel, new_stats.mean[group_ids],
                         new_stats.aver_mean[None, :])
    use_std = jnp.where(seen_sel, new_stats.std[group_ids],
                        new_stats.aver_std[None, :])
    out = feat
    if cfg.mean_norm:
        out = out - use_mean[:, None, :]
    if cfg.std_norm:
        out = out / use_std[:, None, :]
    return (out[..., 0] if squeeze else out), feat_len, new_stats


def recover_feat_norm(stats: NormStats, feat: Array, cfg: FeatNormConfig,
                      group_ids: Optional[Array] = None) -> Array:
    """Inverse transform for inference outputs (feat_norm.py:533-607)."""
    assert cfg.norm_type in ("global", "group"), (
        "utterance/batch-normalized features cannot be recovered")
    stats = coerce_stats(stats)
    if group_ids is None:
        group_ids = jnp.zeros((feat.shape[0],), jnp.int32)
    seen_sel = stats.seen[group_ids][:, None]
    use_mean = jnp.where(seen_sel, stats.mean[group_ids],
                         stats.aver_mean[None, :])
    use_std = jnp.where(seen_sel, stats.std[group_ids],
                        stats.aver_std[None, :])
    out = feat
    if cfg.std_norm:
        out = out * use_std[:, None, :]
    if cfg.mean_norm:
        out = out + use_mean[:, None, :]
    return out
