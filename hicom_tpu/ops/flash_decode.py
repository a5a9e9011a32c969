"""Pallas decode-step attention over the (optionally int8) KV cache.

The serving hot loop: one query token per row attends over the whole cache.
The XLA path dequantizes the int8 cache with jnp ops before ``sdpa`` — if the
compiler fails to fuse that elementwise dequant into the attention reads, a
full bf16 copy of the cache is written to HBM every step, erasing the int8
savings. This kernel reads the int8 codes + per-slot scales directly and
dequantizes in VMEM: decode HBM traffic is guaranteed ~1 byte/weight of cache.

GQA queries fold into rows ((b·KVH, g, d) — g = H/KVH), so each grid row
streams its kv head's cache exactly once. Slot masking (append-order causality
+ right-padding validity) comes in as a per-slot bitmap.

Gated behind ``HICOM_FLASH_DECODE`` in models/qwen2.py until chip-profiled;
``interpret=True`` runs on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEFAULT_BLOCK_S = 512


def _decode_kernel(
    q_ref,  # (1, g, d)
    k_ref,  # (1, bs, d) int8 or fp
    v_ref,  # (1, bs, d)
    ks_ref,  # (1, 1, bs) f32 — k scales (ones when not quantized; singleton
    #            middle dim keeps the last-two-dims block tiling legal)
    vs_ref,  # (1, 1, bs) f32
    m_ref,  # (1, 1, bs) int8 — slot mask (1 = attend)
    o_ref,  # (1, g, d)
    acc_ref,  # (g, d) f32
    mx_ref,  # (g, 1) f32
    l_ref,  # (g, 1) f32
    *,
    scale: float,
    quantized: bool,
):
    si = pl.program_id(1)
    ns = pl.num_programs(1)

    @pl.when(si == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        mx_ref[:] = jnp.full_like(mx_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    k = k_ref[0]
    compute_dtype = q.dtype
    k = k.astype(compute_dtype)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (g, bs)
    if quantized:
        logits = logits * ks_ref[0, 0][None, :]
    logits = logits * scale
    logits = jnp.where(m_ref[0, 0][None, :] != 0, logits, NEG_INF)

    m_prev = mx_ref[:]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)  # (g, bs)
    if quantized:
        p = p * vs_ref[0, 0][None, :]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(jnp.exp(logits - m_new), axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(compute_dtype), v_ref[0].astype(compute_dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    mx_ref[:] = m_new

    @pl.when(si == ns - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def flash_decode(
    q: jnp.ndarray,  # (b, H, 1, d)
    k: jnp.ndarray,  # (b, KVH, S, d) — int8 codes or fp
    v: jnp.ndarray,
    slot_mask: jnp.ndarray,  # (b, S) bool — True = attend
    *,
    k_scale: Optional[jnp.ndarray] = None,  # (b, KVH, S) f32 (int8 cache)
    v_scale: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_s: int = DEFAULT_BLOCK_S,
    interpret: bool = False,
) -> jnp.ndarray:
    """One-token decode attention; returns (b, H, 1, d) in q.dtype."""
    b, H, L, d = q.shape
    assert L == 1
    KVH, S = k.shape[1], k.shape[2]
    g = H // KVH
    if scale is None:
        scale = 1.0 / (d**0.5)
    quantized = k_scale is not None

    q2 = q.reshape(b, KVH, g, d).reshape(b * KVH, g, d)
    k2 = k.reshape(b * KVH, S, d)
    v2 = v.reshape(b * KVH, S, d)
    # singleton middle dim: block (1, 1, bs) vs array (b*KVH, 1, S) satisfies
    # the TPU last-two-dims tiling rule for any row count
    mask2 = jnp.repeat(slot_mask.astype(jnp.int8), KVH, axis=0)[:, None, :]
    if quantized:
        ks2 = k_scale.reshape(b * KVH, 1, S)
        vs2 = v_scale.reshape(b * KVH, 1, S)
    else:
        ks2 = vs2 = jnp.ones((b * KVH, 1, S), jnp.float32)

    bs = min(block_s, max(S, 128))
    ns = pl.cdiv(S, bs)
    if ns * bs != S:
        pad = ns * bs - S
        k2 = jnp.pad(k2, ((0, 0), (0, pad), (0, 0)))
        v2 = jnp.pad(v2, ((0, 0), (0, pad), (0, 0)))
        ks2 = jnp.pad(ks2, ((0, 0), (0, 0), (0, pad)))
        vs2 = jnp.pad(vs2, ((0, 0), (0, 0), (0, pad)))
        mask2 = jnp.pad(mask2, ((0, 0), (0, 0), (0, pad)))

    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=float(scale), quantized=quantized),
        grid=(b * KVH, ns),
        in_specs=[
            pl.BlockSpec((1, g, d), lambda r, s: (r, 0, 0)),
            pl.BlockSpec((1, bs, d), lambda r, s: (r, s, 0)),
            pl.BlockSpec((1, bs, d), lambda r, s: (r, s, 0)),
            pl.BlockSpec((1, 1, bs), lambda r, s: (r, 0, s)),
            pl.BlockSpec((1, 1, bs), lambda r, s: (r, 0, s)),
            pl.BlockSpec((1, 1, bs), lambda r, s: (r, 0, s)),
        ],
        out_specs=pl.BlockSpec((1, g, d), lambda r, s: (r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * KVH, g, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((g, d), jnp.float32),
            pltpu.VMEM((g, 1), jnp.float32),
            pltpu.VMEM((g, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q2, k2, v2, ks2, vs2, mask2)
    return out.reshape(b, KVH, g, d).reshape(b, H, 1, d)
