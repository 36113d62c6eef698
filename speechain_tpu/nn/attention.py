"""Multi-head attention (absolute and relative-position variants).

TPU-native rebuild of reference ``module/transformer/attention.py`` and
``module/conformer/attention.py``. Differences from the reference by design:

- Functional flax modules; dropout keyed by explicit PRNG.
- Autoregressive decoding uses a mutable ``cache`` collection (KV cache with a
  static-capacity ring buffer) instead of recomputing the full prefix every
  step (the reference has no KV cache — ``infer_func/beam_search.py:299-306``
  recomputes O(L^2) per step).
- Attention score computation runs on the MXU in the module ``dtype``
  (bf16-friendly), softmax in fp32.

Parity notes (attention.py:16-133):
- DEFAULT SCALING IS NON-STANDARD: scores are scaled by 1/sqrt(d_model)
  unless ``scale_dp_by_head=True`` (then 1/sqrt(head_size)). Preserved.
- The softmax matrix (before dropout) is returned for visualization and
  attention-guidance losses.
- mask: boolean, True = attendable; shapes (B, 1, Tk) or (B, Tq, Tk),
  broadcast over heads.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _dense_flat(mod, x: Array) -> Array:
    """Apply a last-axis Dense to a rank-3 (B, T, D) input as a 2-D matmul.

    XLA's TPU backend lowers the rank-3 (B, T, D) x (D, F) dot_general with
    its batch-in-sublanes CONVOLUTION emitter (round-4 step trace:
    ``convolution_add_fusion`` at ~67.7k estimated cycles vs ~18k for the
    equivalent plain matmul) whose preferred {2,0,1} operand layout also
    forced a full (B, T, D) relayout copy at every hand-off with the
    row-major Pallas kernels — 74 copies/step. Flattening to (B*T, D)
    selects the matmul emitter; the reshapes are layout bitcasts.
    Non-rank-3 inputs pass through unchanged."""
    if x.ndim != 3:
        return mod(x)
    B, T = x.shape[0], x.shape[1]
    return mod(x.reshape(B * T, x.shape[2])).reshape(B, T, -1)


def _flash_eligible(decode, cross_cache, cached_kv, return_attmat, mask,
                    q, k, causal) -> bool:
    """Route through the fused Pallas kernel? Requires a plain training
    attention shape (no KV cache), no attmat output, and a key-style mask
    (None or (B, 1, Tk)); see ops/pallas_attention.py. Rectangular
    Tq != Tk (decoder cross-attention) is fine unless ``causal``.
    ``q``/``k`` are the UNPROJECTED (B, T, D) module inputs."""
    from speechain_tpu.ops.pallas_attention import MAX_T, flash_enabled
    if decode or cross_cache is not None or cached_kv is not None:
        return False
    if return_attmat:
        return False
    if causal and q.shape[1] != k.shape[1]:
        return False
    if max(q.shape[1], k.shape[1]) > MAX_T:
        return False
    if mask is not None and mask.shape[1] != 1:
        return False
    return flash_enabled()


def _flash_seed(module, rate: float) -> Array:
    """(1,) int32 dropout seed drawn from the module's 'dropout' rng stream
    (one threefry word; the bulk in-kernel bits come from the TPU PRNG)."""
    if rate > 0.0:
        key = module.make_rng("dropout")
        return jax.random.randint(key, (1,), jnp.iinfo(jnp.int32).min,
                                  jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    return jnp.zeros((1,), jnp.int32)


class MultiHeadedAttention(nn.Module):
    """Standard MHA with the reference's scaling semantics.

    Call as ``att(q, k, v, mask)``; returns ``(output, attmat)`` where
    ``attmat`` is the post-softmax attention (B, H, Tq, Tk).
    """

    d_model: int
    num_heads: int
    dropout: float = 0.1
    scale_dp_by_head: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def head_size(self) -> int:
        return self.d_model // self.num_heads

    def _split(self, x: Array) -> Array:
        B, T = x.shape[0], x.shape[1]
        heads = x.reshape(B, T, self.num_heads,
                          self.head_size).transpose(0, 2, 1, 3)
        # under a GSPMD mesh, pin (B, H, T, Dh) to batch->'data',
        # heads->'model': without the hint the partitioner propagates param
        # shardings through the reshape+transpose and falls back to full
        # rematerialization on the decoder cross-attention (parallel/mesh.py
        # hint_activation_sharding docstring; no-op outside GSPMD traces)
        from speechain_tpu.parallel.mesh import hint_activation_sharding
        return hint_activation_sharding(heads, "data", "model", None, None)

    @nn.compact
    def __call__(
        self,
        q: Array,
        k: Array,
        v: Array,
        mask: Optional[Array] = None,
        *,
        train: bool = False,
        decode: bool = False,
        decode_index: Optional[Array] = None,
        cached_kv: Optional[Tuple[Array, Array]] = None,
        cross_cache: Optional[str] = None,
        cache_capacity: Optional[int] = None,
        prime: bool = False,
        return_attmat: bool = True,
        causal: bool = False,
    ):
        """q (B, Tq, D); k/v (B, Tk, D); mask bool (B, 1|Tq, Tk).

        decode: self-attention single-step mode — q/k/v have Tq = 1 and new
            K/V rows are written into the 'cache' collection at
            ``decode_index`` (defaults to internally-tracked index).
        cached_kv: cross-attention fast path — already-projected, head-split
            (K, V) of shape (B, H, Tk, Dh); skips the K/V projections.
        cross_cache: 'write' projects K/V and stores them in the cache
            collection (cache-priming pass over the encoder output);
            'read' ignores k/v and reuses the stored projections (every
            decode step). Avoids re-projecting encoder K/V per step.
        cache_capacity: static KV-buffer length, used when allocating the
            cache variables (cache-priming pass with ``prime=True``).
        prime: allocate/initialize cache variables without advancing them.
        causal: AND a subsequent mask into the scores. Callers that pass
            a (B, 1, Tk) length mask + ``causal=True`` (instead of a
            pre-materialized (B, Tq, Tk) combined mask) stay eligible for
            the fused Pallas path below.
        """
        assert self.d_model % self.num_heads == 0
        _mod = lambda name: nn.DenseGeneral(
            features=self.d_model, dtype=self.dtype, name=name)
        dense = lambda name: (lambda x, m=_mod(name): _dense_flat(m, x))

        if _flash_eligible(decode, cross_cache, cached_kv, return_attmat,
                           mask, q, k, causal):
            # fused VMEM-resident attention (ops/pallas_attention.py):
            # scores/softmax/dropout never touch HBM, and the kernel
            # consumes the natural (B, T, H, Dh) reshape of the projection
            # outputs — no head transpose copies
            from speechain_tpu.ops.pallas_attention import flash_attention
            H, Dh = self.num_heads, self.head_size
            qf = dense("q_layer")(q)                   # (B, T, D) — no
            kf = dense("k_layer")(k)                   # head transpose;
            vf = dense("v_layer")(v)                   # lanes ARE heads
            scale0 = (1.0 / math.sqrt(Dh) if self.scale_dp_by_head
                      else 1.0 / math.sqrt(self.d_model))
            rate = self.dropout if train and self.dropout > 0.0 else 0.0
            seed = _flash_seed(self, rate)
            km = None if mask is None else mask[:, 0].astype(jnp.int32)
            ctx = flash_attention(qf, kf, vf, seed, scale0, H, causal,
                                  rate, km)
            return dense("output_layer")(ctx), None

        qh = self._split(dense("q_layer")(q))
        if cross_cache == "read":
            kh = self.get_variable("cache", "cached_cross_key")
            vh = self.get_variable("cache", "cached_cross_value")
        elif cached_kv is not None:
            kh, vh = cached_kv
        else:
            kh = self._split(dense("k_layer")(k))
            vh = self._split(dense("v_layer")(v))
            if cross_cache == "write":
                self.put_variable("cache", "cached_cross_key", kh)
                self.put_variable("cache", "cached_cross_value", vh)

        if causal:
            from speechain_tpu.utils.masks import subsequent_mask
            cm = subsequent_mask(qh.shape[2])
            mask = cm if mask is None else (mask & cm)

        if decode:
            B = qh.shape[0]
            cap = int(cache_capacity) if cache_capacity else 0
            cap_k = self.variable(
                "cache", "cached_key",
                jnp.zeros, (B, self.num_heads, cap, self.head_size), self.dtype)
            cap_v = self.variable(
                "cache", "cached_value",
                jnp.zeros, (B, self.num_heads, cap, self.head_size), self.dtype)
            idx_var = self.variable(
                "cache", "cache_index", lambda: jnp.zeros((), jnp.int32))
            if cap_k.value.shape[2] == 0:
                raise ValueError(
                    "decode=True requires an initialized cache; run a priming "
                    "pass with prime=True and cache_capacity set first")
            index = idx_var.value if decode_index is None else decode_index
            index = jnp.asarray(index, jnp.int32)
            per_row = index.ndim == 1        # (B,) positions: stream pool
            if not prime:
                # write this step's K/V row(s) into the static-capacity buffer
                if per_row:
                    # each batch row writes at its OWN position (continuous
                    # batching: concurrent streams at different offsets)
                    write = jax.vmap(lambda c, n, i:
                                     jax.lax.dynamic_update_slice(
                                         c, n, (0, i, 0)))
                    kh = write(cap_k.value, kh.astype(self.dtype), index)
                    vh = write(cap_v.value, vh.astype(self.dtype), index)
                else:
                    kh = jax.lax.dynamic_update_slice(
                        cap_k.value, kh.astype(self.dtype), (0, 0, index, 0))
                    vh = jax.lax.dynamic_update_slice(
                        cap_v.value, vh.astype(self.dtype), (0, 0, index, 0))
                cap_k.value, cap_v.value = kh, vh
                if not per_row:
                    idx_var.value = index + q.shape[1]
                # per-row positions are owned by the caller; the scalar
                # internal index stays untouched (and unread)
            else:
                kh, vh = cap_k.value, cap_v.value
            # per-row causal visibility: query row i sits at position
            # index + i, so it may attend key positions <= index + i. For
            # Tq = 1 this reduces to the classic `pos <= index` single-step
            # mask; Tq > 1 is the CHUNKED decode used by streaming ASR
            # (infer/streaming.py) — one cache write per chunk, intra-chunk
            # causality enforced here
            Tk, Tq = kh.shape[2], qh.shape[2]
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, Tq, Tk), 2)
            row = jax.lax.broadcasted_iota(jnp.int32, (1, Tq, Tk), 1)
            off = index[:, None, None] if per_row else index
            step_mask = pos <= off + row     # (1|B, Tq, Tk)
            mask = step_mask if mask is None else (mask & step_mask)

        scale = (1.0 / math.sqrt(self.head_size) if self.scale_dp_by_head
                 else 1.0 / math.sqrt(self.d_model))
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh,
            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            # finite fill, not -inf: fully-masked rows (zero-length batch
            # padding from bucketed collation) must softmax to a finite
            # (uniform) distribution instead of NaN that poisons the step
            scores = jnp.where(mask[:, None], scores,
                               jnp.finfo(jnp.float32).min)
        attmat = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        att = attmat.astype(self.dtype)
        if self.dropout > 0.0:
            att = nn.Dropout(self.dropout, deterministic=not train)(att)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", att, vh,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        B, H, Tq, Dh = ctx.shape
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Tq, H * Dh)
        from speechain_tpu.parallel.mesh import hint_activation_sharding
        ctx = hint_activation_sharding(ctx, "data", None, "model")
        out = dense("output_layer")(ctx)
        return out, (attmat if return_attmat else None)


def rel_shift(matrix_bd: Array) -> Array:
    """Transformer-XL relative shift (conformer/attention.py:26-46).

    matrix_bd: (B, H, T, 2T-1) scores against relative positions
    [T-1 .. -(T-1)]; returns (B, H, T, T) where out[:, :, i, j] =
    matrix_bd[:, :, i, j - i + T - 1].
    """
    B, H, T, L = matrix_bd.shape  # L == 2T - 1
    zero_pad = jnp.zeros((B, H, T, 1), matrix_bd.dtype)
    padded = jnp.concatenate([zero_pad, matrix_bd], axis=-1)  # (B,H,T,2T)
    padded = padded.reshape(B, H, L + 1, T)
    shifted = padded[:, :, 1:].reshape(B, H, T, L)
    return shifted[:, :, :, : L // 2 + 1]


class RelPosMultiHeadedAttention(nn.Module):
    """Relative-position MHA (Transformer-XL style, conformer/attention.py:7).

    Takes ``posenc`` of shape (1, 2T-1, D) covering relative positions
    [T-1 .. -(T-1)]; adds learned pos_bias_u/v to queries.
    Scaling follows the same non-standard default as MultiHeadedAttention.
    """

    d_model: int
    num_heads: int
    dropout: float = 0.1
    scale_dp_by_head: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def head_size(self) -> int:
        return self.d_model // self.num_heads

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array,
                 mask: Optional[Array], posenc: Array, *,
                 train: bool = False, return_attmat: bool = True,
                 decode: bool = False, decode_index: Optional[Array] = None,
                 cache_capacity: Optional[int] = None, prime: bool = False):
        """``decode``: chunked KV-cached self-attention for streaming
        (mirrors MultiHeadedAttention's decode mode — one K/V write per
        chunk at scalar or per-row ``decode_index``). ``posenc`` must then
        be the CAUSAL band from RelPositionalEncoding(decode_cap=cap):
        (1, cap, D) rows for relative distances [cap-1 .. 0]; the
        Transformer-XL rel_shift is replaced by a per-(query,key) gather
        of distance ``index + i - k``."""
        _mod = lambda name: nn.DenseGeneral(
            features=self.d_model, dtype=self.dtype, name=name)
        dense = lambda name: (lambda x, m=_mod(name): _dense_flat(m, x))
        from speechain_tpu.parallel.mesh import hint_activation_sharding
        split = lambda x: hint_activation_sharding(
            x.reshape(x.shape[0], x.shape[1], self.num_heads,
                      self.head_size).transpose(0, 2, 1, 3),
            "data", "model", None, None)

        pos_bias_u = self.param(
            "pos_bias_u", nn.initializers.xavier_uniform(),
            (self.num_heads, self.head_size))
        pos_bias_v = self.param(
            "pos_bias_v", nn.initializers.xavier_uniform(),
            (self.num_heads, self.head_size))
        H, Dh = self.num_heads, self.head_size
        scale0 = (1.0 / math.sqrt(Dh) if self.scale_dp_by_head
                  else 1.0 / math.sqrt(self.d_model))

        if (_flash_eligible(False, None, None, return_attmat, mask, q, k,
                            causal=False)
                and posenc.shape[0] == 1
                and posenc.shape[1] == 2 * q.shape[1] - 1):
            # fused VMEM-resident rel-pos attention: the (T, 2T-1) band,
            # rel_shift, softmax and dropout never touch HBM; projections
            # feed the kernel in their natural (B, T, H, Dh) reshape —
            # no head transposes
            from speechain_tpu.ops.pallas_attention import (
                flash_relpos_attention)
            qf = dense("q_layer")(q)                   # (B, T, D) — no
            kf = dense("k_layer")(k)                   # head transposes;
            vf = dense("v_layer")(v)                   # lanes ARE heads
            pf = _dense_flat(nn.DenseGeneral(
                features=self.d_model, use_bias=False, dtype=self.dtype,
                name="pos_layer"), posenc)[0]          # (2T-1, D)
            rate = self.dropout if train and self.dropout > 0.0 else 0.0
            seed = _flash_seed(self, rate)
            km = None if mask is None else mask[:, 0].astype(jnp.int32)
            ctx = flash_relpos_attention(
                qf, kf, vf, pf,
                pos_bias_u.astype(jnp.float32).reshape(1, -1),
                pos_bias_v.astype(jnp.float32).reshape(1, -1),
                seed, scale0, H, rate, km)
            return dense("output_layer")(ctx), None

        qh = split(dense("q_layer")(q))
        kh = split(dense("k_layer")(k))
        vh = split(dense("v_layer")(v))
        p = _dense_flat(nn.DenseGeneral(features=self.d_model,
                                        use_bias=False, dtype=self.dtype,
                                        name="pos_layer"), posenc)
        ph = p.reshape(p.shape[0], p.shape[1], self.num_heads,
                       self.head_size).transpose(0, 2, 1, 3)  # (1,H,2T-1,Dh)

        if decode:
            # KV cache write — same static-capacity buffers and per-row
            # position semantics as MultiHeadedAttention decode mode
            B = qh.shape[0]
            cap = int(cache_capacity) if cache_capacity else 0
            cap_k = self.variable(
                "cache", "cached_key",
                jnp.zeros, (B, self.num_heads, cap, self.head_size),
                self.dtype)
            cap_v = self.variable(
                "cache", "cached_value",
                jnp.zeros, (B, self.num_heads, cap, self.head_size),
                self.dtype)
            if cap_k.value.shape[2] == 0:
                raise ValueError(
                    "decode=True requires an initialized cache; run a "
                    "priming pass with prime=True and cache_capacity set")
            Tq, Tk = qh.shape[2], cap_k.value.shape[2]
            if posenc.shape[1] != Tk:
                raise ValueError(
                    f"decode posenc must cover distances [cap-1..0]: got "
                    f"{posenc.shape[1]} rows for capacity {Tk}")
            index = jnp.asarray(
                jnp.zeros((), jnp.int32) if decode_index is None
                else decode_index, jnp.int32)
            per_row = index.ndim == 1
            if not prime:
                if per_row:
                    write = jax.vmap(lambda c, n, i:
                                     jax.lax.dynamic_update_slice(
                                         c, n, (0, i, 0)))
                    kh = write(cap_k.value, kh.astype(self.dtype), index)
                    vh = write(cap_v.value, vh.astype(self.dtype), index)
                else:
                    kh = jax.lax.dynamic_update_slice(
                        cap_k.value, kh.astype(self.dtype), (0, 0, index, 0))
                    vh = jax.lax.dynamic_update_slice(
                        cap_v.value, vh.astype(self.dtype), (0, 0, index, 0))
                cap_k.value, cap_v.value = kh, vh
            else:
                kh, vh = cap_k.value, cap_v.value
            pos = jax.lax.broadcasted_iota(jnp.int32, (1, Tq, Tk), 2)
            row = jax.lax.broadcasted_iota(jnp.int32, (1, Tq, Tk), 1)
            off = index[:, None, None] if per_row else index
            step_mask = pos <= off + row                 # (1|B, Tq, Tk)
            mask = step_mask if mask is None else (mask & step_mask)

            q_u = qh + pos_bias_u[None, :, None, :].astype(qh.dtype)
            q_v = qh + pos_bias_v[None, :, None, :].astype(qh.dtype)
            matrix_ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, kh,
                                   preferred_element_type=jnp.float32)
            # bd against ALL distances, then gather each (query i, key k)
            # pair's distance index + i - k (ph row Tk-1-d holds distance
            # d); clamped indices only survive where step_mask is False
            bd_full = jnp.einsum("bhqd,bhkd->bhqk", q_v, ph,
                                 preferred_element_type=jnp.float32)
            d = jnp.clip(off + row - pos, 0, Tk - 1)     # (1|B, Tq, Tk)
            gidx = jnp.broadcast_to(
                (Tk - 1 - d)[:, None],
                (qh.shape[0], self.num_heads, Tq, Tk))
            matrix_bd = jnp.take_along_axis(
                jnp.broadcast_to(bd_full,
                                 (qh.shape[0], self.num_heads, Tq, Tk)),
                gidx, axis=-1)
        else:
            q_u = qh + pos_bias_u[None, :, None, :].astype(qh.dtype)
            q_v = qh + pos_bias_v[None, :, None, :].astype(qh.dtype)
            matrix_ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, kh,
                                   preferred_element_type=jnp.float32)
            matrix_bd = jnp.einsum("bhqd,bhkd->bhqk", q_v, ph,
                                   preferred_element_type=jnp.float32)
            matrix_bd = rel_shift(matrix_bd)

        scale = (1.0 / math.sqrt(self.head_size) if self.scale_dp_by_head
                 else 1.0 / math.sqrt(self.d_model))
        scores = (matrix_ac + matrix_bd) * scale
        if mask is not None:
            # finite fill, not -inf (see MultiHeadedAttention): fully-masked
            # rows must yield a finite softmax, not NaN
            scores = jnp.where(mask[:, None], scores,
                               jnp.finfo(jnp.float32).min)
        attmat = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        att = attmat.astype(self.dtype)
        if self.dropout > 0.0:
            att = nn.Dropout(self.dropout, deterministic=not train)(att)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", att, vh,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        B, H, Tq, Dh = ctx.shape
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, Tq, H * Dh)
        from speechain_tpu.parallel.mesh import hint_activation_sharding
        ctx = hint_activation_sharding(ctx, "data", None, "model")
        out = dense("output_layer")(ctx)
        return out, (attmat if return_attmat else None)
