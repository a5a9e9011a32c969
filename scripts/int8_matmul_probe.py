"""Does this chip's MXU run int8 matmuls ~2x faster than bf16?

v5e datasheet: 394 int8 TOPS vs 197 bf16 TFLOP/s. If that holds through this
toolchain, a w8a8 SigLIP tower (the 86.6%-of-e2e bottleneck) roughly doubles
the bench's frames/s. Measures an MLP-shaped chain (the tower's hot shape) in
bf16, int8-weights-only (dequant into bf16 matmul), and w8a8 (int8xint8 →
int32 accumulate, rescale).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
M, D, F = 23328, 1152, 4304
x0 = jnp.asarray(rng.standard_normal((M, D)), jnp.bfloat16)
w1 = jnp.asarray(rng.standard_normal((D, F)), jnp.bfloat16)
w2 = jnp.asarray(rng.standard_normal((F, D)), jnp.bfloat16)
w1q = jnp.asarray(rng.integers(-127, 127, (D, F)), jnp.int8)
w2q = jnp.asarray(rng.integers(-127, 127, (F, D)), jnp.int8)
s1 = jnp.ones((F,), jnp.float32) * 0.01
s2 = jnp.ones((D,), jnp.float32) * 0.01

DEPTH = 27


@jax.jit
def chain_bf16(x, w1, w2):
    for _ in range(DEPTH):
        x = jax.nn.gelu(x @ w1) @ w2
    return jnp.sum(x.astype(jnp.float32))


@jax.jit
def chain_w8(x, w1q, s1, w2q, s2):
    # weight-only: dequant to bf16, matmul on MXU at bf16 rate
    for _ in range(DEPTH):
        h = jax.nn.gelu((x @ w1q.astype(jnp.bfloat16)) * s1.astype(jnp.bfloat16))
        x = (h @ w2q.astype(jnp.bfloat16)) * s2.astype(jnp.bfloat16)
    return jnp.sum(x.astype(jnp.float32))


def q_rows(x):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8), s


@jax.jit
def chain_w8a8(x, w1q, s1, w2q, s2):
    for _ in range(DEPTH):
        xq, sx = q_rows(x)
        acc = jax.lax.dot_general(xq, w1q, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        h = jax.nn.gelu((acc.astype(jnp.float32) * sx * s1).astype(jnp.bfloat16))
        hq, sh = q_rows(h)
        acc2 = jax.lax.dot_general(hq, w2q, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        x = (acc2.astype(jnp.float32) * sh * s2).astype(jnp.bfloat16)
    return jnp.sum(x.astype(jnp.float32))


@jax.jit
def chain_int8_raw(xq, w1q, w2q):
    """Pure int8 dot rate: int8 in, int32 accumulate, requant by arithmetic
    shift (no f32 epilogue, no absmax reduce) — isolates the MXU int8 ceiling
    from the dynamic-quantization overhead that chain_w8a8 carries."""
    for _ in range(DEPTH):
        acc = jax.lax.dot_general(xq, w1q, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        hq = jnp.clip(acc >> 8, -127, 127).astype(jnp.int8)
        acc2 = jax.lax.dot_general(hq, w2q, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        xq = jnp.clip(acc2 >> 8, -127, 127).astype(jnp.int8)
    return jnp.sum(acc2)


@jax.jit
def chain_int8_aligned(xq, w1q, w2q):
    """Raw int8 chain at 128-aligned dims (F 4304→4352): is the so400m
    intermediate size's 128-misalignment costing int8 tiles?"""
    w1p = jnp.pad(w1q, ((0, 0), (0, 48)))
    w2p = jnp.pad(w2q, ((0, 48), (0, 0)))
    for _ in range(DEPTH):
        acc = jax.lax.dot_general(xq, w1p, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        hq = jnp.clip(acc >> 8, -127, 127).astype(jnp.int8)
        acc2 = jax.lax.dot_general(hq, w2p, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        xq = jnp.clip(acc2 >> 8, -127, 127).astype(jnp.int8)
    return jnp.sum(acc2)


@jax.jit
def chain_w8a8_bf16q(x, w1q, s1, w2q, s2):
    """chain_w8a8 but the dynamic quantize runs in bf16 math (absmax reduce +
    divide + round in bf16, scales bf16): is the f32 quantize epilogue part of
    the 170 vs 199 TOPS gap?"""
    def q_rows16(h):
        amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
        s = jnp.maximum(amax, jnp.bfloat16(1e-6)) * jnp.bfloat16(1.0 / 127.0)
        q = jnp.clip(jnp.round(h / s), -127, 127).astype(jnp.int8)
        return q, s
    for _ in range(DEPTH):
        xq, sx = q_rows16(x)
        acc = jax.lax.dot_general(xq, w1q, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        h = jax.nn.gelu(acc.astype(jnp.bfloat16) * sx * s1.astype(jnp.bfloat16))
        hq, sh = q_rows16(h)
        acc2 = jax.lax.dot_general(hq, w2q, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        x = acc2.astype(jnp.bfloat16) * sh * s2.astype(jnp.bfloat16)
    return jnp.sum(x.astype(jnp.float32))


# ---- attention-core-shaped dots: (heads*frames) batched 729x72 @ 72x729 ----
# The tower's d=72 attention is the last bf16 holdout (~10% of tower FLOPs,
# flash full-block measured ~56 TFLOP/s). Does the int8 MXU path beat that
# through XLA batched dot_general at this shape?
AB_HEADS = 64  # heads*frames batch per call (memory-bounded stand-in)
La, Da = 729, 72


def attn_args(dtype):
    if dtype == "int8":
        q = jnp.asarray(rng.integers(-127, 127, (AB_HEADS, La, Da)), jnp.int8)
        k = jnp.asarray(rng.integers(-127, 127, (AB_HEADS, La, Da)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 127, (AB_HEADS, La, Da)), jnp.int8)
    else:
        q = jnp.asarray(rng.standard_normal((AB_HEADS, La, Da)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((AB_HEADS, La, Da)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((AB_HEADS, La, Da)), jnp.bfloat16)
    return q, k, v


ATTN_DEPTH = 8


@jax.jit
def attn_bf16(q, k, v):
    for _ in range(ATTN_DEPTH):
        logits = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))))
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))))
        q = (q + o * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)
    return jnp.sum(o.astype(jnp.float32))


@jax.jit
def attn_int8(q, k, v):
    """int8 qk^T and pV through XLA (NOT Pallas — the Pallas int8 path wedges
    Mosaic, TODO.md DEAD END). p requantized per-row to int8."""
    for _ in range(ATTN_DEPTH):
        logits = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=jnp.int32)
        p = jax.nn.softmax(logits.astype(jnp.float32) * 1e-4, axis=-1)
        pq = jnp.clip(jnp.round(p * 127.0), -127, 127).astype(jnp.int8)
        o = jax.lax.dot_general(pq, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.int32)
        q = jnp.clip(o >> 8, -127, 127).astype(jnp.int8)
    return jnp.sum(o)


def time_it(f, *args, iters=3):
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(f(*args))
    return (time.perf_counter() - t0) / iters


fl = DEPTH * 2 * M * D * F * 2
out = {}
t = time_it(chain_bf16, x0, w1, w2)
out["bf16"] = {"ms": round(t * 1e3, 1), "tflops": round(fl / t / 1e12, 1)}
t = time_it(chain_w8, x0, w1q, s1, w2q, s2)
out["w8_dequant"] = {"ms": round(t * 1e3, 1), "tflops": round(fl / t / 1e12, 1)}
t = time_it(chain_w8a8, x0, w1q, s1, w2q, s2)
out["w8a8_int32acc"] = {"ms": round(t * 1e3, 1), "tops": round(fl / t / 1e12, 1)}
xq0 = jnp.asarray(rng.integers(-127, 127, (M, D)), jnp.int8)
t = time_it(chain_int8_raw, xq0, w1q, w2q)
out["int8_raw"] = {"ms": round(t * 1e3, 1), "tops": round(fl / t / 1e12, 1)}
t = time_it(chain_int8_aligned, xq0, w1q, w2q)
out["int8_raw_aligned4352"] = {"ms": round(t * 1e3, 1), "tops": round(fl / t / 1e12, 1)}
t = time_it(chain_w8a8_bf16q, x0, w1q, s1, w2q, s2)
out["w8a8_bf16_quantize"] = {"ms": round(t * 1e3, 1), "tops": round(fl / t / 1e12, 1)}

attn_fl = ATTN_DEPTH * AB_HEADS * 2 * (2 * La * La * Da)  # qk^T + pV
qb, kb, vb = attn_args("bf16")
t = time_it(attn_bf16, qb, kb, vb)
out["attn_d72_bf16"] = {"ms": round(t * 1e3, 1), "tflops": round(attn_fl / t / 1e12, 1)}
qi, ki, vi = attn_args("int8")
t = time_it(attn_int8, qi, ki, vi)
out["attn_d72_int8"] = {"ms": round(t * 1e3, 1), "tops": round(attn_fl / t / 1e12, 1)}
print(json.dumps(out))
