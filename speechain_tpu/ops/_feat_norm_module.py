"""Flax wrapper for the feature-normalization running stats."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from speechain_tpu.ops.feat_norm import (
    FeatNormConfig,
    apply_feat_norm,
    init_stats,
    recover_feat_norm,
)


class FeatNormModule(nn.Module):
    """Owns the NormStats pytree in the 'norm_stats' variable collection."""

    cfg: FeatNormConfig

    @nn.compact
    def __call__(self, feat, feat_len, *, train: bool = False,
                 epoch=None, group_ids=None,
                 axis_name: Optional[str] = None):
        stats = self.variable("norm_stats", "stats",
                              lambda: init_stats(self.cfg))
        feat, feat_len, new_stats = apply_feat_norm(
            stats.value, feat, feat_len, self.cfg, train=train, epoch=epoch,
            group_ids=group_ids, axis_name=axis_name)
        if train and not self.is_initializing():
            stats.value = new_stats
        return feat, feat_len

    def recover(self, feat, group_ids=None):
        stats = self.get_variable("norm_stats", "stats")
        return recover_feat_norm(stats, feat, self.cfg, group_ids=group_ids)
