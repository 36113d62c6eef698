"""Switch-style mixture-of-experts feed-forward with expert parallelism.

Beyond-parity module (the reference has no MoE anywhere): a drop-in
replacement for the Transformer FFN that routes each token to its top-1
expert (Switch Transformer, Fedus et al. 2021), built TPU-first:

- dispatch/combine are einsums against a one-hot dispatch tensor — plain
  MXU matmuls, no gather/scatter, fully static shapes;
- expert parameter tensors carry a leading expert axis that
  ``parallel/mesh.py::param_sharding_rules`` shards over the 'model' mesh
  axis, so the GSPMD partitioner turns dispatch/combine into
  all-to-all-style collectives (expert parallelism);
- the load-balancing auxiliary loss is sown into the ``losses``
  collection; EVERY step factory in ``train/state.py`` requests
  ``mutable=['losses']`` and adds the sown sum to its objective
  (``_aux_from_losses``), so ``fdfwd_type: moe`` is balanced in all
  model families (ASR/TTS/FS2/LM, single- and multi-domain).

Tokens overflowing an expert's static capacity are dropped (output 0 —
the residual connection carries them), Switch semantics.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class SwitchFFN(nn.Module):
    d_model: int
    fdfwd_dim: int
    num_experts: int = 4
    capacity_factor: float = 1.25
    fdfwd_activation: str = "GELU"
    dropout: float = 0.1
    aux_loss_weight: float = 1e-2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        B, T, D = x.shape
        E, F = self.num_experts, self.fdfwd_dim
        S = B * T
        # static per-expert capacity, padded to a lane-friendly multiple
        cap = int(-(-S * self.capacity_factor // E))
        cap = max(8, -(-cap // 8) * 8)
        cap = min(cap, S)

        # router in fp32 for a stable softmax (Switch practice)
        router_logits = nn.Dense(E, dtype=jnp.float32,
                                 name="router")(x.astype(jnp.float32))
        probs = jax.nn.softmax(router_logits, axis=-1)        # (B, T, E)
        flat_probs = probs.reshape(S, E)
        expert_idx = jnp.argmax(flat_probs, axis=-1)          # (S,)
        gate = jnp.max(flat_probs, axis=-1)                   # (S,)
        onehot = jax.nn.one_hot(expert_idx, E,
                                dtype=jnp.float32)            # (S, E)

        # Switch load-balancing aux loss: E * sum_e f_e * P_e
        frac_tokens = jnp.mean(onehot, axis=0)                # (E,)
        frac_probs = jnp.mean(flat_probs, axis=0)             # (E,)
        aux = E * jnp.sum(frac_tokens * frac_probs)
        self.sow("losses", "moe_aux",
                 self.aux_loss_weight * aux,
                 reduce_fn=lambda a, b: a + b,
                 init_fn=lambda: jnp.zeros((), jnp.float32))

        # position of each token within its chosen expert (1-based)
        pos = jnp.cumsum(onehot, axis=0) * onehot             # (S, E)
        keep = (pos > 0) & (pos <= cap)
        # one-hot over capacity slots -> dispatch tensor (S, E, cap)
        slot = (pos - 1.0) * onehot                           # 0-based slot
        dispatch = keep.astype(jnp.float32)[..., None] * jax.nn.one_hot(
            slot.astype(jnp.int32), cap, dtype=jnp.float32)

        flat = x.reshape(S, D).astype(self.dtype)
        expert_in = jnp.einsum("sec,sd->ecd", dispatch.astype(self.dtype),
                               flat)                          # (E, cap, D)

        wi = self.param("expert_wi", nn.initializers.lecun_normal(),
                        (E, D, F), jnp.float32).astype(self.dtype)
        bi = self.param("expert_bi", nn.initializers.zeros,
                        (E, 1, F), jnp.float32).astype(self.dtype)
        wo = self.param("expert_wo", nn.initializers.lecun_normal(),
                        (E, F, D), jnp.float32).astype(self.dtype)
        bo = self.param("expert_bo", nn.initializers.zeros,
                        (E, 1, D), jnp.float32).astype(self.dtype)

        h = jnp.einsum("ecd,edf->ecf", expert_in, wi) + bi
        act = getattr(nn, self.fdfwd_activation.lower(), None) or \
            getattr(jax.nn, self.fdfwd_activation.lower())
        h = act(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        expert_out = jnp.einsum("ecf,efd->ecd", h, wo) + bo   # (E, cap, D)

        combine = dispatch * gate[:, None, None]              # (S, E, cap)
        out = jnp.einsum("sec,ecd->sd", combine.astype(self.dtype),
                         expert_out)
        return out.reshape(B, T, D)
