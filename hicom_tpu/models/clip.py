"""CLIP vision tower and guide text encoder (clip-vit-large-patch14-336 path).

Architecture per HF ``CLIPVisionModelWithProjection`` / ``CLIPTextModelWithProjection``
(reference wrapper ``/root/reference/hicom/model/encoder.py:82-205``):

* vision: CLS token + conv patch embedding + learned positions, pre-LN, quick-GELU
  MLPs; tower feature = ``hidden_states[select_layer][:, 1:]`` (CLS dropped);
  contrastive ``image_embeds`` = ``visual_projection(post_ln(last_hidden)[:, 1:])``.
* text: CAUSAL transformer; pooled = eos-position token → ``text_projection``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import multi_head_attention

Array = jnp.ndarray


@dataclass(frozen=True)
class ClipVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5
    remat: bool = False  # gradient-checkpoint encoder layers (train memory)

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.num_patches_per_side**2


@dataclass(frozen=True)
class ClipTextConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    vocab_size: int = 49408
    max_position_embeddings: int = 77
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class ClipMLP(nn.Module):
    hidden_size: int
    intermediate_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.intermediate_size, name="fc1", dtype=self.dtype)(x)
        x = quick_gelu(x)
        return nn.Dense(self.hidden_size, name="fc2", dtype=self.dtype)(x)


class ClipEncoderLayer(nn.Module):
    hidden_size: int
    intermediate_size: int
    num_heads: int
    eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, is_causal=False):
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm1")(x)
        dense = lambda name: nn.Dense(self.hidden_size, name=name, dtype=self.dtype)  # noqa: E731
        q = dense("q_proj")(h)
        k = dense("k_proj")(h)
        v = dense("v_proj")(h)
        head_dim = self.hidden_size // self.num_heads
        attn = multi_head_attention(q, k, v, self.num_heads, scale=head_dim**-0.5, mask=mask, is_causal=is_causal)
        attn = dense("out_proj")(attn)
        x = x + attn
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm2")(x)
        return x + ClipMLP(self.hidden_size, self.intermediate_size, dtype=self.dtype, name="mlp")(h)


class ClipVisionTower(nn.Module):
    """Returns (features (b,h,w,d), image_embeds (b,h,w,proj) or None)."""

    config: ClipVisionConfig
    select_layer: int = -2
    with_projection: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: Array) -> Tuple[Array, Optional[Array]]:
        cfg = self.config
        b = pixel_values.shape[0]
        x = jnp.transpose(pixel_values, (0, 2, 3, 1)).astype(self.dtype)
        x = nn.Conv(
            cfg.hidden_size, kernel_size=(cfg.patch_size,) * 2, strides=(cfg.patch_size,) * 2,
            padding="VALID", use_bias=False, dtype=self.dtype, name="patch_embedding",
        )(x)
        hw = cfg.num_patches_per_side
        x = x.reshape(b, hw * hw, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (b, 1, cfg.hidden_size)), x], axis=1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (cfg.num_patches + 1, cfg.hidden_size), jnp.float32,
        )
        x = x + pos.astype(x.dtype)[None]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="pre_layrnorm")(x)

        layer_cls = nn.remat(ClipEncoderLayer) if getattr(cfg, "remat", False) else ClipEncoderLayer
        tap = self.select_layer if self.select_layer >= 0 else cfg.num_hidden_layers + 1 + self.select_layer
        tapped = x if tap == 0 else None
        for i in range(cfg.num_hidden_layers):
            x = layer_cls(
                cfg.hidden_size, cfg.intermediate_size, cfg.num_attention_heads,
                cfg.layer_norm_eps, dtype=self.dtype, name=f"layers_{i}",
            )(x)
            if i + 1 == tap:
                tapped = x
        features = tapped[:, 1:].reshape(b, hw, hw, cfg.hidden_size)

        image_embeds = None
        if self.with_projection:
            last = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="post_layernorm")(x)
            proj = nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype, name="visual_projection")
            image_embeds = proj(last[:, 1:]).reshape(b, hw, hw, cfg.projection_dim)
        return features, image_embeds


class ClipTextEncoder(nn.Module):
    """Returns (pooled text_embeds (b, proj), per-token projected (b, L, proj))."""

    config: ClipTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Array, attention_mask: Optional[Array] = None):
        cfg = self.config
        tok = self.param("token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        pos = self.param("position_embedding", nn.initializers.normal(0.02), (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32)
        L = input_ids.shape[-1]
        x = tok.astype(self.dtype)[input_ids] + pos.astype(self.dtype)[None, :L]
        # CLIP text attention is always causal; a padding mask combines with it.
        causal = jnp.tril(jnp.ones((L, L), dtype=bool))[None]
        mask = causal if attention_mask is None else causal & (attention_mask[:, None, :] > 0)
        for i in range(cfg.num_hidden_layers):
            x = ClipEncoderLayer(
                cfg.hidden_size, cfg.intermediate_size, cfg.num_attention_heads,
                cfg.layer_norm_eps, dtype=self.dtype, name=f"layers_{i}",
            )(x, mask=mask)
        last = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(x)
        proj = nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype, name="text_projection")
        per_token = proj(last)
        # HF pooling: hidden state at the eos token position (argmax over == eos)
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = jnp.take_along_axis(per_token, eos_pos[:, None, None], axis=1)[:, 0]
        return pooled, per_token
