"""Pallas TPU flash attention (forward) with mask / causal / logit-bias support.

Used for the decoder prefill over [visual; text] tokens and the SigLIP encoder
(seq 729), where materializing (L, L) logits in HBM wastes bandwidth. Streaming
softmax over KV blocks keeps everything in VMEM: for each query block we scan
key/value blocks, maintaining the running max/denominator (online softmax) and
the output accumulator in fp32 scratch.

Grid: (batch*heads, num_q_blocks, num_kv_blocks) with the KV dimension
innermost so the q-block accumulator lives across the kv scan.

Falls back to the XLA einsum path off-TPU (ops.attention.sdpa handles dispatch);
``interpret=True`` lets CPU tests run the same kernel code.
"""

from __future__ import annotations

import functools
from typing import Optional, Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
NEG_INF = -1e30


def _flash_kernel(
    kv_len_ref,  # (bh,) int32 SMEM — per-row valid kv lengths (whole array:
    #              rank-1 blocks must cover the array on the TPU lowering)
    q_ref,  # (1, bq, d)
    k_ref,  # (1, bk, d)
    v_ref,  # (1, bk, d)
    o_ref,  # (1, bq, d)
    lse_ref,  # (1, 1, 1, bq) f32 — logsumexp output (for the backward pass;
    #             laid out (bh, nq, 1, bq) so the block's LAST TWO dims (1, bq)
    #             equal the array's — legal for ANY bq under the TPU tiling rule)
    acc_ref,  # (bq, d) f32 scratch
    m_ref,  # (bq, 1) f32 scratch — running max
    l_ref,  # (bq, 1) f32 scratch — running denominator
    *,
    scale: float,
    logit_bias: float,
    causal: bool,
    q_len: int,
    kv_len: int,
    block_q: int,
    block_k: int,
    q_seq: int,
    full_kv: bool,
):
    bi = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    # Static fast path: no causal mask, every row attends to the whole
    # (unpadded) kv — the SigLIP/CLIP tower shape. Skips the iota/mod/compare
    # mask build (pure VPU work serialized against the MXU dots; chip-measured
    # ~15% of full-block tower attention) and, with a single kv block, the
    # online-softmax rescale + accumulator scratch entirely.
    skip_mask = full_kv and not causal
    single_kv = skip_mask and nk == 1

    if not single_kv:

        @pl.when(ki == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)

    def compute():
        q = q_ref[0]
        k = k_ref[0]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        logits = logits * scale + logit_bias

        if not skip_mask:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            if (pl.num_programs(1) * block_q) > q_seq:  # folded rows restart each q_seq
                q_pos = q_pos % q_seq
            k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = k_pos < jnp.minimum(kv_len, kv_len_ref[bi])  # block pad + row pad
            if causal:
                # bottom-right-aligned diagonal (einsum-path parity for Lq != Lk)
                mask &= k_pos <= q_pos + (kv_len - q_seq)
            logits = jnp.where(mask, logits, NEG_INF)

        if single_kv:  # plain softmax, straight to the output block
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0] = (o / l).astype(o_ref.dtype)
            lse_ref[0, 0, 0] = (m + jnp.log(l))[:, 0]
            return

        m_prev = m_ref[:]
        l_prev = l_ref[:]
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new
        l_ref[:] = l_new

    if causal:
        # Skip kv blocks fully above the diagonal. Positions are modulo q_seq
        # (folded GQA rows restart at 0 every q_seq rows), so the block's
        # effective start is (qi*bq) % q_seq; row r's position (s+r) % q_seq
        # <= s + r <= s + bq - 1, making the bound safe even when a block
        # straddles a fold boundary.
        @pl.when(ki * block_k <= (qi * block_q) % q_seq + (kv_len - q_seq) + block_q - 1)
        def _():
            compute()
    else:
        compute()

    if not single_kv:

        @pl.when(ki == nk - 1)
        def _finish():
            denom = jnp.maximum(l_ref[:], 1e-30)
            o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)
            lse_ref[0, 0, 0] = (m_ref[:] + jnp.log(denom))[:, 0]


def _fullblock_kernel(
    q_ref,  # (fold, L, d)
    k_ref,  # (fold, L, d)
    v_ref,  # (fold, L, d)
    o_ref,  # (fold, L, d)
    lse_ref,  # (fold, 1, 1, L) f32
    *,
    scale: float,
    logit_bias: float,
    fold: int,
):
    """Single-block full attention (no mask, no online softmax), ``fold`` rows
    per grid cell. The tower shape (729 tokens, d=72) makes the grid 55k tiny
    cells per layer at b=4; folding heads amortizes the per-cell fixed cost
    (chip: ~1.3us/cell of non-MXU, non-softmax overhead)."""
    for h in range(fold):  # static unroll
        logits = jax.lax.dot_general(
            q_ref[h], k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + logit_bias
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[h] = (o / l).astype(o_ref.dtype)
        lse_ref[h, 0, 0] = (m + jnp.log(l))[:, 0]


def _fullblock_fwd(q, k, v, scale, logit_bias, interpret):
    """Dispatch for the unmasked single-block case: grid (bh/fold, 1, 1)."""
    import os as _os

    bh, L, d = q.shape
    fold = int(_os.environ.get("HICOM_FLASH_HEADFOLD", "4"))
    while fold > 1 and bh % fold:
        fold //= 2
    out, lse = pl.pallas_call(
        functools.partial(_fullblock_kernel, scale=scale, logit_bias=logit_bias, fold=fold),
        grid=(bh // fold,),
        in_specs=[pl.BlockSpec((fold, L, d), lambda b: (b, 0, 0))] * 3,
        out_specs=[
            pl.BlockSpec((fold, L, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((fold, 1, 1, L), lambda b: (b, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, L, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, 1, L), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(q, k, v)
    return out, lse.reshape(bh, L)


def _pad_to_blocks(q, k, v, block_q, block_k):
    bh, q_len, d = q.shape
    kv_len = k.shape[1]
    bq = min(block_q, max(q_len, 8))
    bk = min(block_k, max(kv_len, 128))
    nq = pl.cdiv(q_len, bq)
    nk = pl.cdiv(kv_len, bk)
    q_pad = nq * bq - q_len
    k_pad = nk * bk - kv_len
    if q_pad:
        q = jnp.pad(q, ((0, 0), (0, q_pad), (0, 0)))
    if k_pad:
        k = jnp.pad(k, ((0, 0), (0, k_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, k_pad), (0, 0)))
    return q, k, v, bq, bk, nq, nk


def _flash_fwd_impl(q, k, v, kv_lengths, scale, logit_bias, is_causal, block_q, block_k, interpret, q_seq=None,
                    full_kv=False):
    bh, q_len, d = q.shape
    kv_len = k.shape[1]
    qp, kp, vp, bq, bk, nq, nk = _pad_to_blocks(q, k, v, block_q, block_k)
    if (full_kv and not is_causal and nq == nk == 1
            and nq * bq == q_len and nk * bk == kv_len):
        return _fullblock_fwd(q, k, v, scale, logit_bias, interpret)
    kernel = functools.partial(
        _flash_kernel,
        scale=scale, logit_bias=logit_bias, causal=is_causal,
        q_len=q_len, kv_len=kv_len, block_q=bq, block_k=bk,
        q_seq=q_seq if q_seq is not None else max(q_len, 1),
        full_kv=full_kv and nk * bk == kv_len,  # no kv block padding either
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, 1, bq), lambda b, i, j: (b, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq * bq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nq, 1, bq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lengths, qp, kp, vp)
    return out[:, :q_len], lse.reshape(bh, nq * bq)[:, :q_len]


def _bwd_dq_kernel(
    kv_len_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_ref,
    *, scale, logit_bias, causal, q_len, kv_len, block_q, block_k, q_seq, full_kv,
):
    bi = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def compute():
        s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale + logit_bias
        if full_kv and not causal:
            # no mask build: padded q rows have lse=+inf -> p=0 (inert)
            p = jnp.exp(s - lse_ref[0, 0, 0][:, None])
        else:
            q_pos = (qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)) % q_seq
            k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask = k_pos < jnp.minimum(kv_len, kv_len_ref[bi])
            if causal:
                mask &= k_pos <= q_pos + (kv_len - q_seq)
            p = jnp.where(mask, jnp.exp(s - lse_ref[0, 0, 0][:, None]), 0.0)
        dp = jax.lax.dot_general(do_ref[0].astype(jnp.float32), v_ref[0].astype(jnp.float32),
                                 (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0, 0][:, None])
        acc_ref[:] += scale * jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        # fold-aware diagonal skip (see _flash_kernel)
        @pl.when(ki * block_k <= (qi * block_q) % q_seq + (kv_len - q_seq) + block_q - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    kv_len_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc,
    *, scale, logit_bias, causal, q_len, kv_len, block_q, block_k, q_seq, full_kv,
):
    bi = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    def compute():
        s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale + logit_bias
        if full_kv and not causal:
            # no mask build: padded q rows have lse=+inf -> p=0 (inert)
            p = jnp.exp(s - lse_ref[0, 0, 0][:, None])
        else:
            q_pos = (qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)) % q_seq
            k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            raw_q = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = (k_pos < jnp.minimum(kv_len, kv_len_ref[bi])) & (raw_q < q_len)
            if causal:
                mask &= k_pos <= q_pos + (kv_len - q_seq)
            p = jnp.where(mask, jnp.exp(s - lse_ref[0, 0, 0][:, None]), 0.0)
        # dV += P^T dO
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do_ref[0].astype(jnp.float32), v_ref[0].astype(jnp.float32),
                                 (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0, 0][:, None])
        # dK += dS^T Q * scale
        dk_acc[:] += scale * jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        # fold-aware diagonal skip (see _flash_kernel)
        @pl.when((qi * block_q) % q_seq + (kv_len - q_seq) + block_q - 1 >= ki * block_k)
        def _():
            compute()
    else:
        compute()

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, kv_lengths, out, lse, do, scale, logit_bias, is_causal, block_q, block_k, interpret, q_seq=None,
                    full_kv=False):
    bh, q_len, d = q.shape
    kv_len = k.shape[1]
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (bh, Lq)
    qp, kp, vp, bq, bk, nq, nk = _pad_to_blocks(q, k, v, block_q, block_k)
    do_p = jnp.pad(do, ((0, 0), (0, nq * bq - q_len), (0, 0))) if nq * bq != q_len else do
    # padded q rows: lse=+inf → p=0 keeps them inert in the dkv pass.
    # (bh, nq, 1, bq) layout: see _flash_fwd_impl lse block-tiling note
    lse_p = jnp.pad(lse, ((0, 0), (0, nq * bq - q_len)), constant_values=jnp.inf).reshape(bh, nq, 1, bq)
    delta_p = jnp.pad(delta, ((0, 0), (0, nq * bq - q_len))).reshape(bh, nq, 1, bq)

    common = dict(scale=scale, logit_bias=logit_bias, causal=is_causal,
                  q_len=q_len, kv_len=kv_len, block_q=bq, block_k=bk,
                  q_seq=q_seq if q_seq is not None else max(q_len, 1),
                  full_kv=full_kv and nk * bk == kv_len)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, 1, bq), lambda b, i, j: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, 1, bq), lambda b, i, j: (b, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq * bq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lengths, qp, kp, vp, do_p, lse_p, delta_p)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **common),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, 1, 1, bq), lambda b, j, i: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, 1, bq), lambda b, j, i: (b, i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nk * bk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, nk * bk, d), v.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((bk, d), jnp.float32), pltpu.VMEM((bk, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lengths, qp, kp, vp, do_p, lse_p, delta_p)
    return dq[:, :q_len], dk[:, :kv_len], dv[:, :kv_len]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def _flash_bhld(q, k, v, kv_lengths, scale, logit_bias, is_causal, block_q, block_k, interpret, q_seq=None,
                full_kv=False):
    out, _ = _flash_fwd_impl(q, k, v, kv_lengths, scale, logit_bias, is_causal, block_q, block_k, interpret, q_seq,
                             full_kv)
    return out


def _flash_bhld_fwd(q, k, v, kv_lengths, scale, logit_bias, is_causal, block_q, block_k, interpret, q_seq=None,
                    full_kv=False):
    out, lse = _flash_fwd_impl(q, k, v, kv_lengths, scale, logit_bias, is_causal, block_q, block_k, interpret, q_seq,
                               full_kv)
    return out, (q, k, v, kv_lengths, out, lse)


def _flash_bhld_bwd(scale, logit_bias, is_causal, block_q, block_k, interpret, q_seq, full_kv, res, do):
    import numpy as _np

    q, k, v, kv_lengths, out, lse = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, kv_lengths, out, lse, do, scale, logit_bias,
                                 is_causal, block_q, block_k, interpret, q_seq, full_kv)
    dlen = _np.zeros(kv_lengths.shape, jax.dtypes.float0)
    return dq, dk, dv, dlen


_flash_bhld.defvjp(_flash_bhld_fwd, _flash_bhld_bwd)


def flash_attention(
    q: jnp.ndarray,  # (..., Lq, d)
    k: jnp.ndarray,  # (..., Lk, d)
    v: jnp.ndarray,
    *,
    scale: Optional[Union[float, jnp.ndarray]] = None,
    logit_bias: Union[float, jnp.ndarray] = 0.0,
    mask: Optional[jnp.ndarray] = None,
    is_causal: bool = False,
    kv_lengths: Optional[jnp.ndarray] = None,  # per-LEADING-batch valid kv lengths
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ops.attention.sdpa on TPU.

    Masking in-kernel: causal and/or per-row valid kv length (right-aligned
    padding). Arbitrary boolean masks use the einsum path instead.
    ``kv_lengths``: (batch,) int32, broadcast over any head axes between the
    batch axis and the (L, d) tail.
    """
    assert mask is None, "flash_attention supports causal/length masks only"
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d**0.5)
    scale = float(scale)
    logit_bias = float(logit_bias)

    lead = q.shape[:-2]
    q3 = q.reshape((-1,) + q.shape[-2:])
    k3 = k.reshape((-1,) + k.shape[-2:])
    v3 = v.reshape((-1,) + v.shape[-2:])
    bh = q3.shape[0]
    if kv_lengths is None:
        lens = jnp.full((bh,), k.shape[-2], jnp.int32)
    else:
        reps = bh // kv_lengths.shape[0]
        lens = jnp.repeat(kv_lengths.astype(jnp.int32), reps)
    out = _flash_bhld(q3, k3, v3, lens, scale, logit_bias, is_causal, block_q, block_k, interpret,
                      None, kv_lengths is None)
    return out.reshape(lead + out.shape[-2:])


def _aligned_block_q(L: int, block_q: int) -> int:
    """Causal folded-GQA q-block choice: the largest SUBLANE-ALIGNED
    (multiple-of-8) divisor of L that is <= block_q, else ``block_q``.
    Aligning blocks to fold boundaries lets the diagonal skip see the true
    per-fold block start; misaligned fallback blocks stay correct (the skip
    is conservative) but compute extra above-diagonal tiles.

    Candidates MUST be multiples of 8: Mosaic requires a block's second-minor
    dim to be 8-divisible or equal to the array dim, and the folded array has
    g*L rows — a divisor of L like L itself satisfies neither when L%8 != 0
    (chip-hit at L=241: the old search started at min(block_q, L) and picked
    c = L, failing lowering for every spliced length < block_q not divisible
    by 8)."""
    start = min(block_q, max(L, 8)) // 8 * 8
    return next((c for c in range(start, 7, -8) if L % c == 0), block_q)


def flash_attention_gqa(
    q: jnp.ndarray,  # (b, H, L, d)
    k: jnp.ndarray,  # (b, KVH, S, d)
    v: jnp.ndarray,
    *,
    scale=None,
    logit_bias=0.0,
    is_causal: bool = False,
    kv_lengths: Optional[jnp.ndarray] = None,  # (b,)
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """Grouped-query flash attention WITHOUT materializing repeated KV.

    The g = H/KVH query heads sharing a kv head are folded into the q-row axis
    ((b*KVH, g*L, d)); causal/length masks use positions modulo L, so each
    folded sequence masks independently. KV DMA traffic drops by g (7x for
    Qwen2.5-7B) versus the repeat-then-attend path.
    """
    b, H, L, d = q.shape
    KVH, S = k.shape[1], k.shape[2]
    assert H % KVH == 0
    g = H // KVH
    if scale is None:
        scale = 1.0 / (d**0.5)
    if is_causal:
        block_q = _aligned_block_q(L, block_q)
    q2 = q.reshape(b, KVH, g, L, d).reshape(b * KVH, g * L, d)
    k2 = k.reshape(b * KVH, S, d)
    v2 = v.reshape(b * KVH, S, d)
    if kv_lengths is None:
        lens = jnp.full((b * KVH,), S, jnp.int32)
    else:
        lens = jnp.repeat(kv_lengths.astype(jnp.int32), KVH)
    out = _flash_bhld(q2, k2, v2, lens, float(scale), float(logit_bias),
                      is_causal, block_q, block_k, interpret, L, kv_lengths is None)
    return out.reshape(b, KVH, g, L, d).reshape(b, H, L, d)
