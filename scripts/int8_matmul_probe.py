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
print(json.dumps(out))
