"""Qwen2/2.5 decoder in flax with a static-shape KV cache.

Architecture per HF ``Qwen2ForCausalLM`` (the reference wraps it at
``/root/reference/hicom/model/hicom_qwen2.py``): RMSNorm pre-norm blocks, GQA
attention with QKV bias, NeoX-style rotary embeddings (theta 1e6), SwiGLU MLP.
The same module tree serves Llama (no QKV bias, theta 1e4) via config.

TPU-first choices: a preallocated (max_len) KV cache updated with
``dynamic_update_slice`` (static shapes under jit), positions passed explicitly
so prefill/decode are the same traced function, fp32 softmax/RMSNorm with bf16
matmuls on the MXU.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import sdpa

Array = jnp.ndarray


class KVCache(NamedTuple):
    """Per-layer stacked cache: k/v are (num_layers, b, kv_heads, max_len, head_dim).

    ``valid`` is a (b, max_len) bitmap marking real (non-padding) cache slots so
    right-padded prefill batches decode correctly; ``length`` is the shared
    contiguous write offset.

    int8 mode (``zeros(..., quantized=True)``): k/v hold int8 codes and
    ``k_scale``/``v_scale`` hold per-slot absmax scales (num_layers, b,
    kv_heads, max_len); dequantization fuses into the attention read so long
    decodes stream 4x less HBM than fp32 caches (2x vs bf16).
    """

    k: Array
    v: Array
    length: Array  # (b,) int32 — write offset (same for all rows)
    valid: Array  # (b, max_len) bool
    k_scale: Optional[Array] = None
    v_scale: Optional[Array] = None

    @classmethod
    def zeros(cls, num_layers, batch, kv_heads, max_len, head_dim, dtype, quantized: bool = False):
        shape = (num_layers, batch, kv_heads, max_len, head_dim)
        if quantized:
            sshape = shape[:-1]
            return cls(
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape, jnp.int8),
                jnp.zeros((batch,), jnp.int32),
                jnp.zeros((batch, max_len), dtype=bool),
                jnp.ones(sshape, jnp.float32),
                jnp.ones(sshape, jnp.float32),
            )
        return cls(
            jnp.zeros(shape, dtype),
            jnp.zeros(shape, dtype),
            jnp.zeros((batch,), jnp.int32),
            jnp.zeros((batch, max_len), dtype=bool),
        )


def quantize_kv(x: Array) -> Tuple[Array, Array]:
    """(..., d) → int8 codes + per-slot absmax scale (...,)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: Array, scale: Array, dtype) -> Array:
    return q.astype(dtype) * scale[..., None].astype(dtype)


class QuantDense(nn.Module):
    """Weight-only int8 linear: HBM holds int8 kernels + per-output-channel
    scales; dequantization fuses into the matmul read (the TPU analogue of the
    reference's bitsandbytes 8-bit load, ``model/__init__.py:58-68``)."""

    features: int
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-1]
        kernel_q = self.param("kernel_q", nn.initializers.zeros, (in_dim, self.features), jnp.int8)
        scale = self.param("kernel_scale", nn.initializers.ones, (self.features,), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kernel_q.astype(self.dtype))
        y = y * scale.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


# bitsandbytes' NF4 codebook: the 16 quantiles of a standard normal, scaled to
# [-1, 1] (QLoRA, Dettmers et al. 2023) — the reference loads decoders with
# bnb_4bit_quant_type="nf4" (model/__init__.py:58-68).
NF4_CODEBOOK = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634, 0.33791524171829224,
    0.44070982933044434, 0.5626170039176941, 0.7229568362236023, 1.0,
], np.float32)

NF4_GROUP = 64  # bnb blocksize


def nf4_values(idx_u8: Array, dtype) -> Array:
    """16-entry codebook lookup as a fused compare/select chain.

    A ``book[codes]`` gather materializes s32 index tensors ((in_dim, out) —
    measured 259MB/layer HLO temps at 7B MLP dims, a contributor to the QLoRA
    compile OOM) and lowers to TPU gather ops; fifteen VPU selects over the
    uint8 nibbles fuse into one elementwise loop feeding the matmul read."""
    out = jnp.full(idx_u8.shape, float(NF4_CODEBOOK[0]), dtype)
    for k in range(1, 16):
        out = jnp.where(idx_u8 == jnp.uint8(k), jnp.asarray(float(NF4_CODEBOOK[k]), dtype), out)
    return out


class QuantDense4(nn.Module):
    """Weight-only NF4 linear: two 4-bit codebook indices packed per uint8,
    per-(64-row group, column) absmax scales; dequantization (codebook lookup
    × scale) fuses into the matmul read. TPU analogue of the reference's
    bnb 4-bit load (``model/__init__.py:58-68``)."""

    features: int
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-1]
        assert in_dim % 2 == 0
        packed = self.param("kernel_nf4", nn.initializers.zeros,
                            (in_dim // 2, self.features), jnp.uint8)
        n_groups = (in_dim + NF4_GROUP - 1) // NF4_GROUP
        scale = self.param("kernel_scale", nn.initializers.ones,
                           (n_groups, self.features), jnp.float32)
        lo = nf4_values(packed & 0xF, self.dtype)
        hi = nf4_values(packed >> 4, self.dtype)
        w = jnp.stack([lo, hi], axis=1).reshape(in_dim, self.features)
        w = w * jnp.repeat(scale.astype(self.dtype), NF4_GROUP, axis=0)[:in_dim]
        y = jnp.dot(x.astype(self.dtype), w)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def make_dense(quantized, features: int, use_bias: bool, dtype, name: str):
    if quantized == "int8" or quantized is True:
        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    if quantized == "nf4":
        return QuantDense4(features, use_bias=use_bias, dtype=dtype, name=name)
    if quantized == "w8a8":
        # int8 activations × int8 weights on the MXU (param layout identical
        # to QuantDense): at prefill the decoder is compute-bound, so the
        # int8 MXU rate applies; at decode it streams the same int8 weights
        from .quant import W8A8Dense

        return W8A8Dense(features, use_bias=use_bias, dtype=dtype, name=name)
    if quantized in ("w8a8s", "w8a8s+calib"):
        # static-scale w8a8 (calibrated act_scale params — see models/quant.py)
        from .quant import W8A8DenseS

        return W8A8DenseS(features, use_bias=use_bias, dtype=dtype, name=name,
                          calibrate=quantized.endswith("+calib"))
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


def quantize_decoder_params(lm_params: dict, mode: str = "int8") -> dict:
    """Convert decoder linear kernels to the quantized layout — ``int8`` /
    ``w8a8`` / ``w8a8_mlp`` (per-column absmax int8; the w8a8 layout is
    identical to QuantDense's, ``w8a8_mlp`` leaves attention projections fp)
    or ``nf4`` (packed codebook indices + per-64-row-group scales, the
    reference's bnb 4-bit analogue). Embeddings, norms and lm_head stay fp.

    ``w8a8s`` / ``w8a8s_mlp``: same int8 storage as the dynamic counterpart
    plus per-site ``act_scale`` (scalar, init 1.0) and ``act_smooth``
    (per-input-channel SmoothQuant factors, init ones) — run a '+calib'
    forward and ``models.quant.fill_act_scales`` before serving (the decoder
    twin of the tower's static path; W8A8DenseS)."""
    import re as _re

    static = mode.startswith("w8a8s")
    target_re = (r"(gate_proj|up_proj|down_proj)$" if mode in ("w8a8_mlp", "w8a8s_mlp")
                 else r"(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj)$")

    # nearest codebook entry == searchsorted against bin midpoints (codebook is
    # sorted) — O(1) extra memory instead of a 16x-weight-size distance tensor
    nf4_mids = (NF4_CODEBOOK[1:] + NF4_CODEBOOK[:-1]) / 2

    def quantize_nf4(k: np.ndarray) -> dict:
        in_dim, out_dim = k.shape
        pad = (-in_dim) % NF4_GROUP
        kp = np.pad(k, ((0, pad), (0, 0)))
        g = kp.reshape(-1, NF4_GROUP, out_dim)
        absmax = np.maximum(np.abs(g).max(axis=1), 1e-8)  # (n_groups, out)
        norm = (g / absmax[:, None, :]).reshape(-1, out_dim)
        codes = np.searchsorted(nf4_mids, norm)[:in_dim].astype(np.uint8)
        packed = (codes[0::2] | (codes[1::2] << 4)).astype(np.uint8)
        return {"kernel_nf4": packed, "kernel_scale": absmax.astype(np.float32)}

    def walk(tree, path=""):
        if not isinstance(tree, dict):
            return tree
        if "kernel" in tree and _re.search(target_re, path):
            k = np.asarray(tree["kernel"], np.float32)
            if mode == "nf4":
                out = quantize_nf4(k)
            else:
                absmax = np.maximum(np.abs(k).max(axis=0), 1e-8)
                scale = (absmax / 127.0).astype(np.float32)
                kq = np.clip(np.round(k / scale[None, :]), -127, 127).astype(np.int8)
                out = {"kernel_q": kq, "kernel_scale": scale}
                if static:
                    out["act_scale"] = np.float32(1.0)
                    out["act_smooth"] = np.ones((k.shape[0],), np.float32)
            if "bias" in tree:
                out["bias"] = np.asarray(tree["bias"], np.float32)
            return out
        return {kk: walk(vv, f"{path}/{kk}") for kk, vv in tree.items()}

    return walk(lm_params)


def quantize_decoder_shapes(lm_shapes: dict, mode: str = "int8") -> dict:
    """ShapeDtypeStruct twin of :func:`quantize_decoder_params`: maps an
    ``eval_shape`` param tree to the quantized storage layout WITHOUT ever
    materializing fp weights — bench.py builds random 7B QLoRA params straight
    on device from these shapes (a host fp 7B tree is ~14GB on the 1-core
    host). Layout must stay in lockstep with quantize_decoder_params
    (tested by test_quantize_decoder_shapes_match)."""
    import re as _re

    import jax

    static = mode.startswith("w8a8s")
    target_re = (r"(gate_proj|up_proj|down_proj)$" if mode in ("w8a8_mlp", "w8a8s_mlp")
                 else r"(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj)$")

    def walk(tree, path=""):
        if not isinstance(tree, dict):
            return tree
        if "kernel" in tree and _re.search(target_re, path):
            in_dim, out_dim = tree["kernel"].shape
            if mode == "nf4":
                n_groups = (in_dim + NF4_GROUP - 1) // NF4_GROUP
                out = {"kernel_nf4": jax.ShapeDtypeStruct((in_dim // 2, out_dim), jnp.uint8),
                       "kernel_scale": jax.ShapeDtypeStruct((n_groups, out_dim), jnp.float32)}
            else:
                out = {"kernel_q": jax.ShapeDtypeStruct((in_dim, out_dim), jnp.int8),
                       "kernel_scale": jax.ShapeDtypeStruct((out_dim,), jnp.float32)}
                if static:
                    out["act_scale"] = jax.ShapeDtypeStruct((), jnp.float32)
                    out["act_smooth"] = jax.ShapeDtypeStruct((in_dim,), jnp.float32)
            if "bias" in tree:
                out["bias"] = jax.ShapeDtypeStruct(tree["bias"].shape, jnp.float32)
            return out
        return {kk: walk(vv, f"{path}/{kk}") for kk, vv in tree.items()}

    return walk(lm_shapes)


def dequantize_decoder_params(lm_params: dict, dtype=jnp.bfloat16) -> dict:
    """Traced inverse of :func:`quantize_decoder_params`: rebuild fp ``kernel``
    leaves from int8/NF4 storage inside a jitted program.

    This is the QLoRA compute path (reference ``train.py:567-587`` kbit prep):
    weights rest in HBM quantized; the fp kernels exist only transiently at
    matmul time (and are re-derived in backward under ``remat`` instead of
    kept alive), so training memory stays at the 4/8-bit footprint plus
    adapters and their optimizer state."""

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        if "kernel_q" in tree:  # int8: per-output-channel absmax
            k = tree["kernel_q"].astype(dtype) * tree["kernel_scale"].astype(dtype)[None, :]
            out = {"kernel": k}
        elif "kernel_nf4" in tree:  # packed codebook indices + group scales
            packed, scale = tree["kernel_nf4"], tree["kernel_scale"]
            in_dim = packed.shape[0] * 2
            lo = nf4_values(packed & 0xF, dtype)
            hi = nf4_values(packed >> 4, dtype)
            k = jnp.stack([lo, hi], axis=1).reshape(in_dim, packed.shape[1])
            k = k * jnp.repeat(scale.astype(dtype), NF4_GROUP, axis=0)[:in_dim]
            out = {"kernel": k}
        else:
            return {kk: walk(vv) for kk, vv in tree.items()}
        if "bias" in tree:
            out["bias"] = tree["bias"]
        return out

    return walk(lm_params)


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps)
        return (xf * scale).astype(x.dtype)


def rotary_tables(positions: Array, head_dim: int, theta: float, dtype) -> Tuple[Array, Array]:
    """cos/sin of shape (b, L, head_dim) for NeoX-style rotation."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (b, L, d/2)
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rotary(x: Array, cos: Array, sin: Array) -> Array:
    """x: (b, H, L, d); cos/sin: (b, L, d)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[:, None] + rotated * sin[:, None]


class DecoderAttention(nn.Module):
    hidden_size: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rope_theta: float
    attention_bias: bool
    quantized: Any = None  # None | "int8" | "nf4"
    dtype: Any = jnp.float32
    # mesh axis name for ring-attention prefill (set only on the shard_map
    # twin built by parallel/ring.py:ring_prefill; None everywhere else)
    ring_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: Array,  # (b, L, D)
        positions: Array,  # (b, L)
        cache_kv: Optional[Tuple[Array, Array]] = None,  # (b, KVH, S, d) each
        cache_length: Optional[Array] = None,  # (b,)
        cache_valid: Optional[Array] = None,  # (b, S) bool, already including this step
        padding_mask: Optional[Array] = None,  # (b, L) bool; True = real token
        prefill_from_empty: bool = False,  # static: cache known empty → attend current tokens only
        padding_right_aligned: bool = True,  # static: padding_mask is a per-row suffix
        cache_scales: Optional[Tuple[Array, Array]] = None,  # int8 cache: (b, KVH, S) each
        per_slot: bool = False,  # static: rows are independent serving slots (L==1)
    ):
        b, L, _ = x.shape
        H, KVH, hd = self.num_heads, self.num_kv_heads, self.head_dim
        q = make_dense(self.quantized, H * hd, self.attention_bias, self.dtype, "q_proj")(x)
        k = make_dense(self.quantized, KVH * hd, self.attention_bias, self.dtype, "k_proj")(x)
        v = make_dense(self.quantized, KVH * hd, self.attention_bias, self.dtype, "v_proj")(x)
        q = q.reshape(b, L, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, L, KVH, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, L, KVH, hd).transpose(0, 2, 1, 3)

        cos, sin = rotary_tables(positions, hd, self.rope_theta, self.dtype)
        q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)

        group = H // KVH
        new_cache_kv = None
        new_cache_scales = None
        if cache_kv is not None:
            ck, cv = cache_kv
            S = ck.shape[2]
            if per_slot:
                # continuous-batching decode: each row is an independent
                # serving slot with its own write offset (serve.py engine).
                # L == 1 is the plain decode step; L > 1 is a speculative
                # verify chunk (serve.py spec_k): the row's L candidate
                # tokens are written contiguously at its own offset.
                row_upd3 = jax.vmap(lambda c, off, new: jax.lax.dynamic_update_slice(c, new, (0, off, 0)))
                row_upd2 = jax.vmap(lambda c, off, new: jax.lax.dynamic_update_slice(c, new, (0, off)))
                if cache_scales is not None:
                    kq, ks = quantize_kv(k)
                    vq, vs = quantize_kv(v)
                    ck = row_upd3(ck, cache_length, kq)
                    cv = row_upd3(cv, cache_length, vq)
                    new_cache_scales = (row_upd2(cache_scales[0], cache_length, ks),
                                        row_upd2(cache_scales[1], cache_length, vs))
                else:
                    ck = row_upd3(ck, cache_length, k)
                    cv = row_upd3(cv, cache_length, v)
            else:
                # contiguous fill: all samples share the write offset
                # (= length[0]); per-sample validity is handled by the mask.
                offset = cache_length[0]
                if cache_scales is not None:
                    kq, ks = quantize_kv(k)
                    vq, vs = quantize_kv(v)
                    ck = jax.lax.dynamic_update_slice(ck, kq, (0, 0, offset, 0))
                    cv = jax.lax.dynamic_update_slice(cv, vq, (0, 0, offset, 0))
                    cks = jax.lax.dynamic_update_slice(cache_scales[0], ks, (0, 0, offset))
                    cvs = jax.lax.dynamic_update_slice(cache_scales[1], vs, (0, 0, offset))
                    new_cache_scales = (cks, cvs)
                else:
                    ck = jax.lax.dynamic_update_slice(ck, k, (0, 0, offset, 0))
                    cv = jax.lax.dynamic_update_slice(cv, v, (0, 0, offset, 0))
            new_cache_kv = (ck, cv)
            if prefill_from_empty:
                # cache known empty: attend within the L new tokens only —
                # avoids an L×cache_len contraction and enables flash.
                kv_lengths = None
                if padding_mask is None:
                    mask = None
                elif padding_right_aligned:
                    mask = None
                    kv_lengths = jnp.sum(padding_mask.astype(jnp.int32), axis=-1)
                else:
                    kv_pos = jnp.arange(L)[None, None, None, :]
                    q_pos = jnp.arange(L)[None, None, :, None]
                    mask = (kv_pos <= q_pos) & padding_mask[:, None, None, :]
                k_att, v_att = k, v
            else:
                kv_lengths = None
                # Causality over cache SLOTS (append-only), not rope positions:
                # with right padding the two diverge (pads consume slots but
                # not positions). Padding slots are excluded via the bitmap.
                import os as _os

                fd = _os.environ.get("HICOM_FLASH_DECODE", "0")
                if L == 1 and fd != "0" and (jax.default_backend() == "tpu" or fd == "interpret"):
                    # fused decode kernel: streams the (int8) cache once,
                    # dequantizing in VMEM — no bf16 cache copy in HBM
                    from ..ops.flash_decode import flash_decode

                    # per_slot: append-only rows mark exactly the attendable
                    # slots valid (each row's newest bit set by the caller)
                    slot_mask = cache_valid if per_slot else (
                        cache_valid & (jnp.arange(S)[None, :] <= cache_length[0]))
                    scales = new_cache_scales or (None, None)
                    out = flash_decode(
                        q, ck, cv, slot_mask,
                        k_scale=scales[0], v_scale=scales[1],
                        scale=hd**-0.5, interpret=fd == "interpret",
                    )
                    out = out.transpose(0, 2, 1, 3).reshape(b, L, H * hd)
                    out = make_dense(self.quantized, self.hidden_size, False, self.dtype, "o_proj")(out)
                    return out, new_cache_kv, new_cache_scales
                if per_slot:
                    # causal over slots within the row's chunk: q position i
                    # may attend slots <= offset + i. For L == 1 this also
                    # shields the row from any stale-valid slots beyond its
                    # own offset (speculative rounds leave unaccepted
                    # candidate slots marked valid until overwritten).
                    kv_slot = jnp.arange(S)[None, None, None, :]
                    q_slot = (cache_length[:, None] + jnp.arange(L)[None, :])[:, None, :, None]
                    mask = cache_valid[:, None, None, :] & (kv_slot <= q_slot)
                else:
                    kv_slot = jnp.arange(S)[None, None, None, :]  # (1, 1, 1, S)
                    q_slot = (cache_length[0] + jnp.arange(L))[None, None, :, None]
                    mask = kv_slot <= q_slot
                    mask = mask & cache_valid[:, None, None, :]
                if new_cache_scales is not None:
                    # dequant fuses into the attention read (int8 stream + mul)
                    k_att = dequantize_kv(ck, new_cache_scales[0], self.dtype)
                    v_att = dequantize_kv(cv, new_cache_scales[1], self.dtype)
                else:
                    k_att, v_att = ck, cv
        else:
            kv_lengths = None
            if padding_mask is None:
                # positions are arange by construction → plain causal; lets the
                # auto path pick the Pallas flash kernel on TPU.
                mask = None
            elif padding_right_aligned:
                # collator pads on the right: the mask is a per-row length —
                # flash-compatible (padded queries emit garbage the loss masks).
                mask = None
                kv_lengths = jnp.sum(padding_mask.astype(jnp.int32), axis=-1)
            else:
                kv_pos = positions[:, None, None, :]  # (b, 1, 1, L)
                q_pos = positions[:, None, :, None]  # (b, 1, L, 1)
                mask = (kv_pos <= q_pos) & padding_mask[:, None, None, :]
            k_att, v_att = k, v

        # GQA: kv heads stay unrepeated — sdpa groups queries per kv head
        # (grouped einsum / folded-row flash; no g-times KV materialization).
        if self.ring_axis is not None and (cache_kv is None or prefill_from_empty):
            # sequence axis sharded over the mesh: q/k/v here are this
            # device's chunks; exact attention via KV rotation + online
            # softmax (parallel/ring.py). Unpadded causal prompts only.
            assert mask is None and kv_lengths is None, \
                "ring prefill requires unpadded causal prompts"
            from ..parallel.ring import ring_attention

            out = ring_attention(q, k_att, v_att, self.ring_axis,
                                 scale=hd**-0.5, is_causal=True)
        else:
            out = sdpa(q, k_att, v_att, scale=hd**-0.5, mask=mask,
                       is_causal=mask is None, kv_lengths=kv_lengths)
        out = out.transpose(0, 2, 1, 3).reshape(b, L, H * hd)
        out = make_dense(self.quantized, self.hidden_size, False, self.dtype, "o_proj")(out)
        return out, new_cache_kv, new_cache_scales


class DecoderMLP(nn.Module):
    hidden_size: int
    intermediate_size: int
    quantized: Any = None  # None | "int8" | "nf4"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gate = make_dense(self.quantized, self.intermediate_size, False, self.dtype, "gate_proj")(x)
        up = make_dense(self.quantized, self.intermediate_size, False, self.dtype, "up_proj")(x)
        return make_dense(self.quantized, self.hidden_size, False, self.dtype, "down_proj")(nn.silu(gate) * up)


class DecoderLayer(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, positions, cache_kv=None, cache_length=None, cache_valid=None,
                 padding_mask=None, prefill_from_empty=False, padding_right_aligned=True,
                 cache_scales=None, per_slot=False):
        cfg = self.config
        h = RMSNorm(cfg.rms_norm_eps, dtype=self.dtype, name="input_layernorm")(x)
        # None | "int8" | "nf4" | "w8a8" | "w8a8_mlp" ("w8a8_mlp" runs only
        # gate/up/down on the int8 MXU — 88% of decoder linear FLOPs — and
        # keeps the attention projections bf16); "w8a8s*" = static calibrated
        # activation scales, "+calib" suffix = calibration forward
        quantized = getattr(cfg, "quantization", None)
        from .quant import parse_tower_quant

        base, static, calibf = parse_tower_quant(quantized)
        suffix = "+calib" if (static and calibf) else ""
        if base in ("w8a8_mlp", "w8a8s_mlp"):
            attn_q = None
            mlp_q = ("w8a8s" if static else "w8a8") + suffix
        elif static:
            attn_q = mlp_q = "w8a8s" + suffix
        else:
            attn_q = mlp_q = quantized
        attn_out, new_cache_kv, new_cache_scales = DecoderAttention(
            cfg.hidden_size, cfg.num_attention_heads, cfg.num_key_value_heads,
            cfg.head_dim, cfg.rope_theta, cfg.attention_bias, attn_q,
            dtype=self.dtype, ring_axis=getattr(cfg, "ring_axis", None),
            name="self_attn",
        )(h, positions, cache_kv, cache_length, cache_valid, padding_mask, prefill_from_empty,
          padding_right_aligned, cache_scales, per_slot)
        x = x + attn_out
        h = RMSNorm(cfg.rms_norm_eps, dtype=self.dtype, name="post_attention_layernorm")(x)
        x = x + DecoderMLP(cfg.hidden_size, cfg.intermediate_size, mlp_q, dtype=self.dtype, name="mlp")(h)
        return x, new_cache_kv, new_cache_scales


class DecoderLayerScanned(nn.Module):
    """nn.scan wrapper: carry = hidden states, xs = per-layer cache slices."""

    config: Any
    prefill_from_empty: bool = False
    padding_right_aligned: bool = True
    use_cache: bool = False
    per_slot: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, kv, positions, cache_length, cache_valid, padding_mask):
        layer = DecoderLayer(self.config, dtype=self.dtype, name="layer")
        cache_kv = kv[:2] if self.use_cache else None
        cache_scales = kv[2:] if (self.use_cache and len(kv) == 4) else None
        x, new_kv, new_scales = layer(
            x, positions, cache_kv, cache_length, cache_valid, padding_mask,
            self.prefill_from_empty, self.padding_right_aligned, cache_scales,
            self.per_slot,
        )
        if not self.use_cache:
            out = (jnp.zeros((), x.dtype), jnp.zeros((), x.dtype))
        else:
            out = new_kv + (new_scales if new_scales is not None else ())
        return x, out


class Qwen2Model(nn.Module):
    """Decoder stack. ``__call__`` accepts embeddings (multimodal splice output)
    or token ids via :meth:`embed`."""

    config: Any
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
            param_dtype=jnp.float32, name="embed_tokens",
        )
        if not getattr(cfg, "scan_layers", False):
            # remat: recompute each block's activations in the backward pass
            # (static_argnums count self as 0 → the python booleans are 7/8)
            layer_cls = (
                nn.remat(DecoderLayer, static_argnums=(7, 8, 10))
                if getattr(cfg, "remat", False) else DecoderLayer
            )
            self.layers = [
                layer_cls(cfg, dtype=self.dtype, name=f"layers_{i}") for i in range(cfg.num_hidden_layers)
            ]
        self.norm = RMSNorm(cfg.rms_norm_eps, dtype=self.dtype, name="norm")

    def embed(self, input_ids: Array) -> Array:
        return self.embed_tokens(input_ids)

    @nn.compact
    def __call__(
        self,
        inputs_embeds: Array,  # (b, L, D)
        positions: Array,  # (b, L)
        cache: Optional[KVCache] = None,
        padding_mask: Optional[Array] = None,
        prefill_from_empty: bool = False,
        padding_right_aligned: bool = True,
        per_slot: bool = False,
    ) -> Tuple[Array, Optional[KVCache]]:
        x = inputs_embeds.astype(self.dtype)
        b, L = inputs_embeds.shape[:2]
        cache_valid = None
        if cache is not None:
            if per_slot:
                # independent serving slots (serve.py): mark each row's own
                # L written slots valid (L > 1 = speculative verify chunk)
                offs = cache.length[:, None] + jnp.arange(L)[None, :]
                cache_valid = cache.valid.at[jnp.arange(b)[:, None], offs].set(True)
            else:
                step_valid = padding_mask.astype(bool) if padding_mask is not None else jnp.ones((b, L), bool)
                cache_valid = jax.lax.dynamic_update_slice(cache.valid, step_valid, (0, cache.length[0]))

        quant_cache = cache is not None and cache.k_scale is not None
        if getattr(self.config, "scan_layers", False):
            use_cache = cache is not None
            scan_target = (
                nn.remat(DecoderLayerScanned)
                if getattr(self.config, "remat", False) else DecoderLayerScanned
            )
            scanned = nn.scan(
                scan_target,
                # 'calib' carries per-layer sown act_amax during a static-
                # quant ("w8a8s*+calib") calibration forward — stacked on the
                # layer axis, matching the stacked act_scale param layout
                variable_axes={"params": 0, "calib": 0},
                split_rngs={"params": True},
                in_axes=((0 if use_cache else nn.broadcast),
                         nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
                out_axes=0,
                length=self.config.num_hidden_layers,
            )(self.config, prefill_from_empty, padding_right_aligned, use_cache,
              per_slot, dtype=self.dtype, name="layers")
            if not use_cache:
                kv_in = (None, None)
            elif quant_cache:
                kv_in = (cache.k, cache.v, cache.k_scale, cache.v_scale)
            else:
                kv_in = (cache.k, cache.v)
            x, new_kv = scanned(
                x, kv_in, positions,
                cache.length if use_cache else None,
                cache_valid, padding_mask,
            )
            x = self.norm(x)
            if use_cache:
                scales = (new_kv[2], new_kv[3]) if quant_cache else (None, None)
                return x, KVCache(new_kv[0], new_kv[1], cache.length + L, cache_valid,
                                  scales[0], scales[1])
            return x, None

        new_k, new_v, new_ks, new_vs = [], [], [], []
        for i, layer in enumerate(self.layers):
            cache_kv = (cache.k[i], cache.v[i]) if cache is not None else None
            scales = (cache.k_scale[i], cache.v_scale[i]) if quant_cache else None
            x, new_cache_kv, new_scales = layer(
                x, positions, cache_kv,
                cache.length if cache is not None else None,
                cache_valid, padding_mask, prefill_from_empty, padding_right_aligned,
                scales, per_slot,
            )
            if new_cache_kv is not None:
                new_k.append(new_cache_kv[0])
                new_v.append(new_cache_kv[1])
            if new_scales is not None:
                new_ks.append(new_scales[0])
                new_vs.append(new_scales[1])
        x = self.norm(x)
        new_cache = None
        if cache is not None:
            new_cache = KVCache(
                jnp.stack(new_k), jnp.stack(new_v), cache.length + L, cache_valid,
                jnp.stack(new_ks) if new_ks else None,
                jnp.stack(new_vs) if new_vs else None,
            )
        return x, new_cache


class Qwen2ForCausalLM(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    def setup(self):
        self.model = Qwen2Model(self.config, dtype=self.dtype)
        if not self.config.tie_word_embeddings:
            self.lm_head = nn.Dense(self.config.vocab_size, use_bias=False, dtype=self.dtype, name="lm_head")

    def embed(self, input_ids: Array) -> Array:
        return self.model.embed(input_ids)

    def logits(self, hidden: Array) -> Array:
        if self.config.tie_word_embeddings:
            emb = self.model.embed_tokens.embedding.astype(self.dtype)
            return hidden @ emb.T
        return self.lm_head(hidden)

    def __call__(self, inputs_embeds, positions, cache=None, padding_mask=None):
        hidden, new_cache = self.model(inputs_embeds, positions, cache, padding_mask)
        return self.logits(hidden), new_cache
