"""Core scaled-dot-product attention with float32 softmax.

The reference upcasts attention probabilities to fp32 before softmax
(``/root/reference/hicom/model/projector.py:213``); we keep the whole
logits→softmax→weighted-sum contraction in fp32 and cast back, which is also
the numerically safe choice on TPU (bf16 inputs, fp32 MXU accumulation).

``sdpa`` is the single entry point; ``implementation`` selects between the
XLA einsum path (always available; XLA fuses it well for short sequences) and
the Pallas flash kernel (``hicom_tpu.ops.flash_attention``) for long sequences
on TPU.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[Union[float, jnp.ndarray]] = None,
    logit_bias: Union[float, jnp.ndarray] = 0.0,
    mask: Optional[jnp.ndarray] = None,
    is_causal: bool = False,
    kv_lengths: Optional[jnp.ndarray] = None,
    implementation: str = "auto",
    kv_axis_name=None,
) -> jnp.ndarray:
    """Attention over the last two axes: q (..., Q, d), k/v (..., K, d).

    * ``scale``: logits multiplier; default ``1/sqrt(d)``.
    * ``logit_bias``: additive term applied to all logits (SigLIP logit_bias).
    * ``mask``: boolean (..., Q, K); True = attend.
    * ``kv_lengths``: (batch,) right-aligned valid kv lengths — the flash-
      compatible alternative to a dense padding mask.
    * ``kv_axis_name``: mesh axis name(s) the KV sequence is sharded over
      (shard_map bodies only). Per-shard softmax stats are merged exactly with
      pmax/psum (online softmax across devices); ``mask``/``kv_lengths`` then
      refer to the LOCAL kv chunk. q must be replicated along that axis.
    * fp32 softmax regardless of input dtype; output in q.dtype.
    """
    if kv_axis_name is not None:
        return _sdpa_kv_sharded(q, k, v, scale=scale, logit_bias=logit_bias,
                                mask=mask, kv_lengths=kv_lengths, axis_name=kv_axis_name)
    import os as _os

    grouped = q.ndim == 4 and k.ndim == 4 and q.shape[1] != k.shape[1]
    # When the whole sequence fits ONE kernel block, the grid collapses to
    # (rows, 1, 1) and the logits tile stays in VMEM (729² f32 ≈ 2.1MB) — no
    # multi-block streaming. Chip-measured: SigLIP tower (d=72) 5.6ms
    # full-block vs 7.2 einsum vs 9.5 with 256-blocks; CLIP tower (d=64)
    # 37.8 vs 57.2 ms/8f vs 256-blocks. This is also what makes
    # lane-misaligned d (72) flash-viable at all. HICOM_FLASH_FULLBLOCK_MAX=0
    # disables (then lane-misaligned d falls back to einsum).
    full_block_max = int(_os.environ.get("HICOM_FLASH_FULLBLOCK_MAX", "1024"))
    fits_one_block = 0 < q.shape[-2] <= full_block_max and 0 < k.shape[-2] <= full_block_max

    if implementation == "auto":
        # Flash pays off when the logits tile is big and the mask is expressible
        # in-kernel (causal/padding only). Traced scales (SigLIP logit_scale)
        # stay on the einsum path.
        # Flash is ~20x faster than the materialized-logits einsum at prefill
        # shapes (measured in-program on v5e); HICOM_FLASH_ATTENTION=0 disables.
        lane_ok = q.shape[-1] % int(_os.environ.get("HICOM_FLASH_MIN_LANE", "64")) == 0
        # grouped (GQA) folds q rows to g·L, which exceeds one block at real
        # sizes and never receives the full-block override — so only
        # lane-aligned d qualifies there.
        full_block = fits_one_block and q.shape[-1] % 8 == 0 and not grouped
        if (
            _os.environ.get("HICOM_FLASH_ATTENTION", "1") != "0"
            and jax.default_backend() == "tpu"
            and mask is None
            and not isinstance(scale, jax.core.Tracer)
            and not isinstance(logit_bias, jax.core.Tracer)
            and q.shape[-2] * k.shape[-2] >= 128 * 128
            and (lane_ok or full_block)
        ):
            implementation = "flash"
    if implementation == "flash":
        from .flash_attention import flash_attention, flash_attention_gqa

        # Full-seq blocks were chip-measured to win only on lane-misaligned
        # head dims (d=72 SigLIP −22%, d=64 CLIP −34% vs 256-blocks);
        # 128-multiple d (decoder prefill) keeps the default block tuning
        # until measured. HICOM_FLASH_FULLBLOCK_ALIGNED=1 extends the
        # override to aligned d (A/B knob).
        aligned_ok = _os.environ.get("HICOM_FLASH_FULLBLOCK_ALIGNED", "0") == "1"
        use_full = fits_one_block and (q.shape[-1] % 128 != 0 or aligned_ok)
        blocks = dict(block_q=full_block_max, block_k=full_block_max) if use_full else {}
        if grouped:
            assert mask is None, "flash GQA supports causal/length masks only"
            if _os.environ.get("HICOM_FLASH_GQA", "1") == "0":
                # escape hatch: repeat KV and run the plain kernel
                g = q.shape[1] // k.shape[1]
                k = jnp.repeat(k, g, axis=1)
                v = jnp.repeat(v, g, axis=1)
            else:
                return flash_attention_gqa(
                    q, k, v,
                    scale=float(scale) if scale is not None else None,
                    logit_bias=float(logit_bias),
                    is_causal=is_causal, kv_lengths=kv_lengths,
                )
        return flash_attention(
            q, k, v,
            scale=float(scale) if scale is not None else None,
            logit_bias=float(logit_bias),
            mask=mask, is_causal=is_causal, kv_lengths=kv_lengths,
            **blocks,
        )

    if grouped:
        # einsum GQA without materializing repeated KV: (b, KVH, g, L, d)
        b, H, L, d = q.shape
        KVH = k.shape[1]
        qg = q.reshape(b, KVH, H // KVH, L, d)
        if mask is not None and mask.ndim == 4:
            if mask.shape[1] == H:  # per-head mask: regroup alongside q
                mask = mask.reshape(b, KVH, H // KVH, *mask.shape[2:])
            else:  # broadcast over heads (shape (b, 1, Q, K))
                mask = mask[:, :, None]
        out = sdpa(qg, k[:, :, None], v[:, :, None], scale=scale, logit_bias=logit_bias,
                   mask=mask, is_causal=is_causal, kv_lengths=kv_lengths,
                   implementation="einsum")
        return out.reshape(b, H, L, d)

    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d**0.5)
    logits = jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale + logit_bias
    if is_causal:
        qlen, klen = logits.shape[-2], logits.shape[-1]
        causal = jnp.tril(jnp.ones((qlen, klen), dtype=bool), k=klen - qlen)
        logits = jnp.where(causal, logits, -jnp.inf)
    if kv_lengths is not None:
        klen = logits.shape[-1]
        len_mask = jnp.arange(klen)[None, :] < kv_lengths[:, None]  # (b, K)
        len_mask = len_mask.reshape((kv_lengths.shape[0],) + (1,) * (logits.ndim - 2) + (klen,))
        logits = jnp.where(len_mask, logits, jnp.finfo(jnp.float32).min)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("...qk,...kd->...qd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _sdpa_kv_sharded(q, k, v, *, scale, logit_bias, mask, kv_lengths, axis_name):
    """Exact attention with the KV sequence sharded over a mesh axis.

    Each device holds q (replicated) and a contiguous KV chunk; the softmax is
    merged across devices with the usual online-softmax algebra:
    ``m = pmax(m_i)``, ``out = psum(exp(m_i - m)·p_i·v_i) / psum(exp(m_i - m)·l_i)``.
    One pmax + one psum ride the ICI; no KV all-gather ever materializes.
    """
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d**0.5)
    logits = jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32) * scale + logit_bias
    neg = jnp.finfo(jnp.float32).min
    if kv_lengths is not None:
        klen = logits.shape[-1]
        len_mask = jnp.arange(klen)[None, :] < kv_lengths[:, None]
        len_mask = len_mask.reshape((kv_lengths.shape[0],) + (1,) * (logits.ndim - 2) + (klen,))
        logits = jnp.where(len_mask, logits, neg)
    if mask is not None:
        logits = jnp.where(mask, logits, neg)
    m_loc = jnp.max(logits, axis=-1, keepdims=True)
    m = jax.lax.pmax(m_loc, axis_name)
    p = jnp.exp(logits - m)
    # mirror the unsharded path's probs.astype(v.dtype) @ v matmul dtype
    num = jnp.einsum("...qk,...kd->...qd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    den = jnp.sum(p, axis=-1, keepdims=True)
    num = jax.lax.psum(num, axis_name)
    den = jax.lax.psum(den, axis_name)
    return (num / jnp.maximum(den, 1e-30)).astype(q.dtype)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(..., L, H*d) -> (..., H, L, d)"""
    *lead, L, D = x.shape
    x = x.reshape(*lead, L, num_heads, D // num_heads)
    return jnp.moveaxis(x, -2, -3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, L, d) -> (..., L, H*d)"""
    x = jnp.moveaxis(x, -3, -2)
    *lead, L, H, d = x.shape
    return x.reshape(*lead, L, H * d)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    *,
    scale: Optional[Union[float, jnp.ndarray]] = None,
    logit_bias: Union[float, jnp.ndarray] = 0.0,
    mask: Optional[jnp.ndarray] = None,
    is_causal: bool = False,
    implementation: str = "auto",
    kv_axis_name=None,
) -> jnp.ndarray:
    """MHA over already-projected q/k/v of shape (..., L, H*d).

    ``mask`` is (..., Q, K) and broadcast over heads.
    """
    qh, kh, vh = split_heads(q, num_heads), split_heads(k, num_heads), split_heads(v, num_heads)
    if mask is not None:
        mask = mask[..., None, :, :]
    out = sdpa(
        qh, kh, vh, scale=scale, logit_bias=logit_bias, mask=mask,
        is_causal=is_causal, implementation=implementation, kv_axis_name=kv_axis_name,
    )
    return merge_heads(out)
