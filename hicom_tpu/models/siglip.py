"""SigLIP vision tower and guide text encoder in flax.

Architecture per HF ``SiglipVisionModel`` / ``SiglipTextModel`` (the reference
wraps them at ``/root/reference/hicom/model/encoder.py:208-327``):

* vision: conv patch embedding + learned position embedding (no CLS), pre-LN
  transformer, post layernorm; the tower feature is ``hidden_states[select_layer]``
  (default -2, i.e. the input of the last block), reshaped to (h, w, d).
* contrastive ``image_embeds`` (used as compression keys when ``use_clip_scale``):
  ``last_hidden + head.mlp(head.layernorm(last_hidden))`` — the reference taps
  only the pooling head's LN+MLP, not its probe attention (encoder.py:284-285).
* guide text: token+position embeddings, transformer, final LN; pooled output =
  ``head(last_token)``; ``fine`` guide mode uses per-token ``head(last_hidden)``
  (encoder.py:276-282).

Param paths mirror the HF torch state dict for mechanical weight import.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import SiglipTextConfig, SiglipVisionConfig
from ..ops.attention import multi_head_attention
from .layers import gelu_tanh

Array = jnp.ndarray


class SiglipAttention(nn.Module):
    hidden_size: int
    num_heads: int
    quantized: Optional[str] = None  # None | "w8a8" (frozen-tower serving)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        # Mode ladder (chip A/B, f/s e2e at b=4: bf16 143.7 / w8a8_mlp 154.2 /
        # full w8a8 139.2): "w8a8_mlp" quantizes only the MLP; "w8a8_mlp_qkv"
        # additionally runs q/k/v on the int8 MXU (one shared activation
        # quantization) but keeps out_proj bf16 — isolates whether the full-
        # w8a8 loss came from the out_proj (whose input is the attention
        # output, needing its own quantize pass that can't fuse with the
        # Pallas flash kernel's epilogue) or from q/k/v themselves.
        # "w8a8s*" variants replace the dynamic absmax with CALIBRATED static
        # scales (quant.py: ActQuant / W8A8DenseS) so the quantize fuses into
        # the producing layernorm's epilogue instead of costing extra HBM
        # passes; "+calib" suffix runs dynamically while sowing per-site absmax.
        head_dim = self.hidden_size // self.num_heads
        from .quant import parse_tower_quant, quant_covers

        base, static, calib = parse_tower_quant(self.quantized)
        if quant_covers(base, "qkv"):
            from .quant import ActQuant, W8A8Dense, W8A8DenseQ, W8A8DenseS, quantize_rows

            # q/k/v share one quantized input (one activation pass, 3 int8
            # matmuls); out_proj quantizes its own input
            if static:
                xq, sx = ActQuant(calibrate=calib, name="qkv_quant")(x)
            else:
                xq, sx = quantize_rows(x)
            q = W8A8DenseQ(self.hidden_size, name="q_proj", dtype=self.dtype)(xq, sx)
            k = W8A8DenseQ(self.hidden_size, name="k_proj", dtype=self.dtype)(xq, sx)
            v = W8A8DenseQ(self.hidden_size, name="v_proj", dtype=self.dtype)(xq, sx)
            out = multi_head_attention(q, k, v, self.num_heads, scale=head_dim**-0.5, mask=mask)
            if quant_covers(base, "out"):
                if static:
                    return W8A8DenseS(self.hidden_size, name="out_proj", dtype=self.dtype,
                                      calibrate=calib)(out)
                return W8A8Dense(self.hidden_size, name="out_proj", dtype=self.dtype)(out)
            return nn.Dense(self.hidden_size, name="out_proj", dtype=self.dtype)(out)
        dense = lambda name: nn.Dense(self.hidden_size, name=name, dtype=self.dtype)  # noqa: E731
        q = dense("q_proj")(x)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)
        out = multi_head_attention(q, k, v, self.num_heads, scale=head_dim**-0.5, mask=mask)
        return dense("out_proj")(out)


class SiglipMLP(nn.Module):
    hidden_size: int
    intermediate_size: int
    quantized: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from .quant import make_tower_dense, parse_tower_quant, quant_covers

        base, static, calib = parse_tower_quant(self.quantized)
        q = None
        if quant_covers(base, "mlp"):
            q = "w8a8s" if static else "w8a8"
        x = make_tower_dense(q, self.intermediate_size, "fc1", self.dtype, calibrate=calib)(x)
        x = gelu_tanh(x)
        return make_tower_dense(q, self.hidden_size, "fc2", self.dtype, calibrate=calib)(x)


class SiglipEncoderLayer(nn.Module):
    hidden_size: int
    intermediate_size: int
    num_heads: int
    eps: float
    quantized: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm1")(x)
        x = x + SiglipAttention(self.hidden_size, self.num_heads, quantized=self.quantized,
                                dtype=self.dtype, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm2")(x)
        return x + SiglipMLP(self.hidden_size, self.intermediate_size, quantized=self.quantized,
                             dtype=self.dtype, name="mlp")(h)


class SiglipEncoderLayerScanned(nn.Module):
    """nn.scan body: carry = (hidden, tapped); xs = layer index (for the tap
    select). Params stack on a leading layer axis under ``layers/layer`` —
    same layout as the decoder's scan (weights.stack_encoder_layers)."""

    hidden_size: int
    intermediate_size: int
    num_heads: int
    eps: float
    tap: int
    constrain_batch: bool = False
    quantized: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, i, mask):
        x, tapped = carry
        x = SiglipEncoderLayer(
            self.hidden_size, self.intermediate_size, self.num_heads, self.eps,
            quantized=self.quantized, dtype=self.dtype, name="layer",
        )(x, mask)
        if self.constrain_batch:
            from ..parallel.sharding import constrain_batch_activation

            x = constrain_batch_activation(x)
        tapped = jnp.where(i + 1 == self.tap, x, tapped)
        return (x, tapped), None


class SiglipEncoder(nn.Module):
    """Returns (final_hidden, tapped_hidden) where ``tap_layer`` uses the
    hidden_states indexing convention: hidden_states[i] is the input of block i,
    hidden_states[-1] the final output. tap_layer=-2 → input of the last block."""

    num_layers: int
    hidden_size: int
    intermediate_size: int
    num_heads: int
    eps: float
    tap_layer: int = -2
    remat: bool = False  # gradient-checkpoint each block (train memory)
    scan_layers: bool = False  # one compiled block over stacked params
    constrain_batch: bool = False  # pin (b, …) activations to (dp, fsdp)
    quantized: Optional[str] = None  # None | "w8a8" (frozen tower serving)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Tuple[Array, Array]:
        # hidden_states list has num_layers+1 entries; resolve tap index.
        tap = self.tap_layer if self.tap_layer >= 0 else self.num_layers + 1 + self.tap_layer
        assert 0 <= tap <= self.num_layers, f"tap layer {self.tap_layer} out of range"
        if self.constrain_batch:
            from ..parallel.sharding import constrain_batch_activation

            x = constrain_batch_activation(x)
        if self.scan_layers:
            scan_target = (
                nn.remat(SiglipEncoderLayerScanned) if self.remat else SiglipEncoderLayerScanned
            )
            scanned = nn.scan(
                scan_target,
                # 'calib' carries the per-layer sown act_amax during a static-
                # quant calibration forward (stacked on the layer axis, same
                # layout as the act_scale params)
                variable_axes={"params": 0, "calib": 0},
                split_rngs={"params": True},
                in_axes=(0, nn.broadcast),
                out_axes=0,
                length=self.num_layers,
            )(self.hidden_size, self.intermediate_size, self.num_heads, self.eps,
              tap, constrain_batch=self.constrain_batch, quantized=self.quantized,
              dtype=self.dtype, name="layers")
            # tap==0 taps the embeddings; otherwise the where-select in the
            # body overwrites this initial value at step tap-1
            (final, tapped), _ = scanned((x, x), jnp.arange(self.num_layers), mask)
            return final, tapped
        layer_cls = nn.remat(SiglipEncoderLayer) if self.remat else SiglipEncoderLayer
        tapped = x if tap == 0 else None
        for i in range(self.num_layers):
            x = layer_cls(
                self.hidden_size, self.intermediate_size, self.num_heads, self.eps,
                quantized=self.quantized, dtype=self.dtype, name=f"layers_{i}",
            )(x, mask)
            if self.constrain_batch:
                from ..parallel.sharding import constrain_batch_activation

                x = constrain_batch_activation(x)
            if i + 1 == tap:
                tapped = x
        assert tapped is not None, f"tap layer {self.tap_layer} out of range"
        return x, tapped


class SiglipVisionTower(nn.Module):
    """Vision tower producing (features, image_embeds).

    ``features``: (b, h, w, d) tap of ``hidden_states[select_layer]``.
    ``image_embeds``: contrastive-head keys, or None when ``with_head=False``.
    Input pixels are channel-first (b, 3, H, W) float in [-1, 1] (SigLIP norm),
    matching the reference processor output.
    """

    config: SiglipVisionConfig
    select_layer: int = -2
    with_head: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: Array) -> Tuple[Array, Optional[Array]]:
        cfg = self.config
        b = pixel_values.shape[0]
        x = jnp.transpose(pixel_values, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embedding",
        )(x)
        hw = cfg.num_patches_per_side
        x = x.reshape(b, hw * hw, cfg.hidden_size)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(stddev=0.02),
            (cfg.num_patches, cfg.hidden_size),
            jnp.float32,
        )
        x = x + pos.astype(x.dtype)[None]

        final, tapped = SiglipEncoder(
            cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size,
            cfg.num_attention_heads, cfg.layer_norm_eps,
            tap_layer=self.select_layer, remat=getattr(cfg, "remat", False),
            scan_layers=getattr(cfg, "scan_layers", False),
            quantized=getattr(cfg, "quantization", None),
            dtype=self.dtype, name="encoder",
        )(x)

        features = tapped.reshape(b, hw, hw, cfg.hidden_size)

        image_embeds = None
        if self.with_head:
            last = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="post_layernorm")(final)
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="head_layernorm")(last)
            # the head MLP is one extra fc1/fc2 pair (~2.4% of tower FLOPs) —
            # quantize it under the same serving modes as the encoder MLPs
            h = SiglipMLP(cfg.hidden_size, cfg.intermediate_size,
                          quantized=getattr(cfg, "quantization", None),
                          dtype=self.dtype, name="head_mlp")(h)
            image_embeds = (last + h).reshape(b, hw, hw, cfg.hidden_size)
        return features, image_embeds


class SiglipTextEncoder(nn.Module):
    """Guide text encoder: returns (pooled (b, proj), per_token (b, L, proj))."""

    config: SiglipTextConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Array, attention_mask: Optional[Array] = None) -> Tuple[Array, Array]:
        cfg = self.config
        pair_mask = None
        if attention_mask is not None:
            pair_mask = (attention_mask[:, None, :] > 0)  # (b, 1, K) broadcast over queries
        tok = self.param(
            "token_embedding", nn.initializers.normal(stddev=0.02),
            (cfg.vocab_size, cfg.hidden_size), jnp.float32,
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(stddev=0.02),
            (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32,
        )
        L = input_ids.shape[-1]
        x = tok.astype(self.dtype)[input_ids] + pos.astype(self.dtype)[None, :L]
        final, _ = SiglipEncoder(
            cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size,
            cfg.num_attention_heads, cfg.layer_norm_eps,
            tap_layer=-1, scan_layers=getattr(cfg, "scan_layers", False),
            constrain_batch=True,  # see constrain_batch_activation (SPMD remat fix)
            dtype=self.dtype, name="encoder",
        )(x, pair_mask)
        last = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(final)
        head = nn.Dense(cfg.projection_size, name="head", dtype=self.dtype)
        per_token = head(last)
        pooled = per_token[:, -1, :]
        return pooled, per_token
