"""Shared flax building blocks with torch-compatible naming and init.

Submodule names mirror the reference's ``nn.Sequential`` indices ("0", "2", ...)
so checkpoint state-dict keys map 1:1 onto flax param paths (modulo the
kernel transpose handled by the weight importer).
"""

from __future__ import annotations

from typing import Any, Optional, Union

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import multi_head_attention

# torch trunc_normal_(std=.02) truncates at ±2σ, same as jax truncated_normal.
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def gelu_exact(x):
    return nn.gelu(x, approximate=False)


def gelu_tanh(x):
    return nn.gelu(x, approximate=True)


class TorchMLP(nn.Module):
    """``build_mlp`` equivalent: Dense -> (GELU -> Dense) * (depth-1).

    Dense layers are named "0", "2", "4", ... to match torch Sequential keys
    (reference ``/root/reference/hicom/model/projector.py:307-312``).
    """

    out_dim: int
    depth: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, name="0", dtype=self.dtype, kernel_init=trunc_normal_init)(x)
        for i in range(1, self.depth):
            x = gelu_exact(x)
            x = nn.Dense(self.out_dim, name=str(2 * i), dtype=self.dtype, kernel_init=trunc_normal_init)(x)
        return x


class LayerNorm(nn.Module):
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="ln")(x)


def l2_normalize(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """x / ||x||_2 along the last axis (torch ``norm(p=2, dim=-1, keepdim=True)``)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
    return (x.astype(jnp.float32) / (norm + eps)).astype(x.dtype)


class MultiheadAttention(nn.Module):
    """From-scratch MHA matching the reference's projector attention.

    Optional SigLIP contrastive scaling: when ``logit_scale`` is given, q and k
    are L2-normalized over the full embed dim and logits use
    ``exp(logit_scale)`` (+ ``logit_bias``) instead of 1/sqrt(head_dim).
    Softmax in fp32 (reference ``projector.py:184-213``).
    """

    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        logit_scale: Optional[Union[float, jnp.ndarray]] = None,
        logit_bias: Union[float, jnp.ndarray] = 0.0,
        mask: Optional[jnp.ndarray] = None,
        kv_axis_name=None,
    ) -> jnp.ndarray:
        dense = lambda name: nn.Dense(  # noqa: E731
            self.embed_dim, name=name, dtype=self.dtype, kernel_init=trunc_normal_init
        )
        q = dense("q_proj")(query)
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)
        if logit_scale is not None:
            q = l2_normalize(q)
            k = l2_normalize(k)
            scale = jnp.exp(logit_scale)
            bias = logit_bias
        else:
            head_dim = self.embed_dim // self.num_heads
            scale = head_dim**-0.5
            bias = 0.0
        out = multi_head_attention(q, k, v, self.num_heads, scale=scale, logit_bias=bias,
                                   mask=mask, kv_axis_name=kv_axis_name)
        return dense("out_proj")(out)
