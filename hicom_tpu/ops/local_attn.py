"""Fused Pallas kernel for the local compressor's tiled cross-attention.

The XLA path (``ops/grouping.tile_thw`` + ``ops/attention.sdpa``) retiles the
(t, h, w, d) key/value volumes into (G, K, d) copies — an extra HBM round trip
of ~2×(t·h·w·d) bytes that dominates this bandwidth-bound op (the arithmetic
is tiny: one 1×K attention per tile). This kernel reads each volume ONCE:
a (kt, kh, w) slab is pulled to VMEM per grid step and the K=kt·kh·kw tiles
are sliced, attended (fp32 softmax — reference ``projector.py:213``) and
written back without any intermediate HBM copy. ~3× less HBM traffic.

Divisible tile grids only (so400m 27×27 with S=3, t % T == 0 — every release
config); the overlap fallback keeps the XLA path. Gated behind
``HICOM_FUSED_LOCAL=1`` until chip-profiled (models/projector.py dispatch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_attn_kernel(
    scale_ref,  # (1,) f32 SMEM
    bias_ref,  # (1,) f32 SMEM
    q_ref,  # (1, 1, w1, qk)
    k_ref,  # (kt, kh, w, qk)
    v_ref,  # (kt, kh, w, dv)
    o_ref,  # (1, 1, w1, dv)
    *,
    kw: int,
    w1: int,
):
    kt, kh, w, qk = k_ref.shape
    K = kt * kh * kw
    for c in range(w1):  # static unroll over the w tile axis
        k_tile = k_ref[:, :, c * kw:(c + 1) * kw, :].reshape(K, qk)
        v_tile = v_ref[:, :, c * kw:(c + 1) * kw, :].reshape(K, v_ref.shape[-1])
        # f32 before the minor-dim insert: Mosaic only supports non-no-op
        # minor-dim reshapes for 32-bit types (and fp32 logits are the
        # reference semantics anyway, projector.py:213)
        q_vec = q_ref[0, 0, c, :].astype(jnp.float32)[:, None]  # (qk, 1)
        logits = jax.lax.dot_general(
            k_tile.astype(jnp.float32), q_vec, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K, 1)
        logits = logits * scale_ref[0] + bias_ref[0]
        m = jnp.max(logits, axis=0, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=0, keepdims=True)
        out = jax.lax.dot_general(  # (1, K) @ (K, dv)
            p.astype(v_tile.dtype).T, v_tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0, c, :] = out[0].astype(o_ref.dtype)


def fused_tile_attention(
    q: jnp.ndarray,  # (t1, h1, w1, qk) — one query per tile
    key: jnp.ndarray,  # (t, h, w, qk)
    value: jnp.ndarray,  # (t, h, w, dv)
    kernel: tuple,  # (kt, kh, kw)
    scale,
    logit_bias=0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q·K_tileᵀ·scale + bias)·V_tile per (kt, kh, kw) tile.

    Equals tile_thw + sdpa for divisible grids (asserted); scale/bias may be
    traced scalars (SigLIP clip-scale path).
    """
    t, h, w, qk = key.shape
    kt, kh, kw = kernel
    t1, h1, w1 = q.shape[:3]
    assert (t % kt, h % kh, w % kw) == (0, 0, 0), "fused kernel needs divisible tiles"
    assert (t1, h1, w1) == (t // kt, h // kh, w // kw)
    dv = value.shape[-1]

    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1)
    bias_arr = jnp.asarray(logit_bias, jnp.float32).reshape(1)

    out = pl.pallas_call(
        functools.partial(_tile_attn_kernel, kw=kw, w1=w1),
        grid=(t1, h1),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, w1, qk), lambda a, b: (a, b, 0, 0)),
            pl.BlockSpec((kt, kh, w, qk), lambda a, b: (a, b, 0, 0)),
            pl.BlockSpec((kt, kh, w, dv), lambda a, b: (a, b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, w1, dv), lambda a, b: (a, b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t1, h1, w1, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(scale_arr, bias_arr, q, key, value)
    return out
