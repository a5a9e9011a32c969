"""w8a8 quantized linear for the frozen vision tower.

The SigLIP tower is 86.6% of e2e serving time (TODO.md profile) and is
compute-bound on the MXU, so weight-only int8 buys nothing — but v5e runs
int8×int8→int32 matmuls faster than bf16 (chip-measured: 167.8 TOPS vs 128.7
TFLOP/s on the tower's MLP shape, scripts/int8_matmul_probe.py). W8A8Dense
quantizes activations per-row at trace time (dynamic absmax), keeps per-output
-channel weight scales, and lets the MXU accumulate in int32.

The tower is frozen at inference (reference ``encoder.py:262-286`` never
trains it at eval), so this is a serving-time numerics trade: per-channel
weights + per-row activations is the standard accuracy-preserving int8 recipe
for ViTs. Parity is tested against the fp tower (tests/test_towers_parity.py).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def quantize_rows(x: Array) -> Tuple[Array, Array]:
    """(..., d) → int8 codes + per-row scale (..., 1) f32."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


class W8A8Dense(nn.Module):
    """int8-activation × int8-weight linear with int32 MXU accumulation."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-1]
        kernel_q = self.param("kernel_q", nn.initializers.zeros, (in_dim, self.features), jnp.int8)
        scale = self.param("kernel_scale", nn.initializers.ones, (self.features,), jnp.float32)
        xq, sx = quantize_rows(x)
        acc = jax.lax.dot_general(
            xq, kernel_q, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * sx * scale).astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class W8A8DenseQ(nn.Module):
    """W8A8Dense over an ALREADY-quantized input (xq int8, sx per-row scale):
    lets sibling projections (q/k/v share one layer-norm output) amortize one
    activation quantization across three int8 matmuls."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xq: Array, sx: Array) -> Array:
        in_dim = xq.shape[-1]
        kernel_q = self.param("kernel_q", nn.initializers.zeros, (in_dim, self.features), jnp.int8)
        scale = self.param("kernel_scale", nn.initializers.ones, (self.features,), jnp.float32)
        acc = jax.lax.dot_general(
            xq, kernel_q, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * sx * scale).astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def make_tower_dense(quantized: Optional[str], features: int, name: str, dtype) -> nn.Module:
    if quantized == "w8a8":
        return W8A8Dense(features, name=name, dtype=dtype)
    return nn.Dense(features, name=name, dtype=dtype)


def quantize_tower_params(vision_params: dict, mode: str = "w8a8") -> dict:
    """fp tower params → w8a8 layout: encoder-layer linear kernels become
    per-output-channel int8 (kernel_q + kernel_scale); embeddings and norms
    stay fp. Host-side (numpy), mirrors the param names W8A8Dense declares.

    Modes mirror ``SiglipAttention``/``SiglipMLP``:
      ``w8a8``          every encoder linear + the contrastive head MLP
      ``w8a8_mlp``      fc1/fc2 (incl. head_mlp) only
      ``w8a8_mlp_qkv``  fc1/fc2 + q/k/v projections; out_proj stays fp
    """
    TARGET = {
        "w8a8_mlp": ("fc1", "fc2"),
        "w8a8_mlp_qkv": ("fc1", "fc2", "q_proj", "k_proj", "v_proj"),
    }.get(mode, ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"))

    def walk(tree, path=""):
        if not isinstance(tree, dict):
            return tree
        leaf_name = path.rsplit("/", 1)[-1]
        if "kernel" in tree and leaf_name in TARGET:
            k = np.asarray(tree["kernel"], np.float32)
            absmax = np.maximum(np.abs(k).max(axis=0), 1e-8)
            scale = (absmax / 127.0).astype(np.float32)
            kq = np.clip(np.round(k / scale[None, :]), -127, 127).astype(np.int8)
            out = {"kernel_q": kq, "kernel_scale": scale}
            if "bias" in tree:
                out["bias"] = np.asarray(tree["bias"], np.float32)
            return out
        return {kk: walk(vv, f"{path}/{kk}") for kk, vv in tree.items()}

    return walk(vision_params)
