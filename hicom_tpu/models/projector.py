"""HICom compression projector: guide injection + local/global compressors.

Behavioral spec from ``/root/reference/hicom/model/projector.py:315-709``
(GuideInjector :315-397, LocalCompressor :399-559, GlobalCompressor :562-646,
HIComProjector :649-708), rebuilt TPU-first:

* modules are written per-sample with static (t, h, w) shapes and vmapped over
  the batch at the assembly layer (the reference loops over samples in Python);
* tile grouping lowers to reshape (divisible) or one gather (overlap fallback)
  instead of einops chains + torch.stack loops (see ``ops/grouping.py``);
* all softmaxes run in fp32; matmuls hit the MXU in the configured dtype.

Parameter paths mirror the torch state-dict so ``mm_projector.bin`` /
SFT-checkpoint weights import mechanically.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import GlobalCompressorSpec, HIComConfig, LocalCompressorSpec
from ..ops.attention import sdpa
from ..ops.grouping import tile_thw
from ..ops.pos_embed import get_3d_sincos_pos_embed
from ..ops.resize import resize_thw
from .layers import MultiheadAttention, TorchMLP, l2_normalize, trunc_normal_init

Array = jnp.ndarray


def _resolve_use_guide(config_use_guide, force_use_guide) -> Optional[str]:
    """Reference rule: a compressor-level ``guide<mode>`` DSL suffix overrides
    the model-level ``use_guide`` (``projector.py:422,585``)."""
    mode = config_use_guide if force_use_guide is False else force_use_guide
    return None if mode in (None, "off") else mode


class GuideInjector(nn.Module):
    """Inject the instruction embedding into compressor queries.

    Modes (reference ``projector.py:344-397``):
      * ``direct``: the query *becomes* the (projected) guide embedding.
      * ``coarse``: FiLM — ``norm(visual * (1+scale) + shift)``.
      * ``fine``: per-token cross-attention visual←guide + residual norm.
    """

    mode: str
    text_dim: int
    qk_dim: int
    adapt_guide: bool = False
    mlp_depth: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, visual_embed: Array, guide_embed: Array) -> Array:
        if self.mode in ("direct", "coarse"):
            return self._direct_and_coarse(visual_embed, guide_embed)
        if self.mode == "fine":
            return self._fine(visual_embed, guide_embed)
        raise NotImplementedError(f"guide mode {self.mode!r}")

    def _project_guide(self, guide: Array) -> Array:
        if self.text_dim != self.qk_dim:
            guide = TorchMLP(self.qk_dim, self.mlp_depth, dtype=self.dtype, name="text2qk_proj")(guide)
        if self.adapt_guide:
            proj = TorchMLP(self.qk_dim, self.mlp_depth, dtype=self.dtype, name="guide_proj")(guide)
            proj = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="guide_norm")(proj)
            alpha = self.param("guide_alpha", nn.initializers.zeros, (1,), jnp.float32).astype(guide.dtype)
            guide = (1 - alpha) * guide + alpha * proj
        return guide

    def _direct_and_coarse(self, visual: Array, guide: Array) -> Array:
        # guide: (d,); broadcast to the visual grid (t,h,w,d) or (n,d)
        assert visual.ndim in (4, 2), "visual must be (t,h,w,d) or (n,d)"
        guide = jnp.broadcast_to(guide, visual.shape[:-1] + guide.shape[-1:])
        guide = self._project_guide(guide)
        if self.mode == "direct":
            return guide
        film = TorchMLP(self.qk_dim * 2, self.mlp_depth, dtype=self.dtype, name="coarse_proj")(guide)
        scale, shift = jnp.split(film, 2, axis=-1)
        out = visual * (1 + scale) + shift
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="coarse_norm")(out)

    def _fine(self, visual: Array, guide: Array) -> Array:
        # guide: (L, d) token-level embeddings
        orig_shape = visual.shape
        if visual.ndim == 4:
            query = visual.reshape(-1, 1, visual.shape[-1])  # (thw, 1, d)
            guide_b = jnp.broadcast_to(guide[None], (query.shape[0],) + guide.shape)
        else:
            query = visual[None]  # (1, n, d)
            guide_b = guide[None]
        guide_b = self._project_guide(guide_b)
        attn = MultiheadAttention(self.qk_dim, max(1, self.qk_dim // 128), dtype=self.dtype, name="fine_proj")(
            query, guide_b, guide_b
        )
        out = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="fine_norm")(query + attn)
        return out.reshape(orig_shape)


class LocalCompressor(nn.Module):
    """Grouped local cross-attention compressor (reference ``projector.py:399-559``).

    Query = trilinear downsample of the feature volume to
    ``(⌈t/T⌉, ⌈h/S⌉, ⌈w/S⌉)`` (images force T=1), optionally adapted and
    guide-injected. Keys = contrastive-head embeddings (or raw features),
    values = raw features, both tiled into T×S×S groups; one query attends to
    its own tile. Single-head dot-product attention, fp32 softmax, then a
    2-layer MLP readout to the LLM width.
    """

    spec: LocalCompressorSpec
    qk_dim: int
    encoder_hidden_size: int
    output_hidden_size: int
    use_guide: Optional[str]  # resolved mode or None
    mlp_depth: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        frames_feature: Array,  # (t, h, w, dv)
        frames_embed: Optional[Array] = None,  # (t, h, w, qk_dim)
        guide_embed: Optional[Array] = None,
        modal: str = "video",
        logit_scale: Optional[Array] = None,
        logit_bias: Union[float, Array] = 0.0,
    ) -> Array:
        t, h, w, _ = frames_feature.shape
        spec = self.spec

        if frames_embed is not None and logit_scale is not None:
            frames_embed = l2_normalize(frames_embed)
            guide_embed = l2_normalize(guide_embed) if guide_embed is not None else None

        key_src = frames_feature if frames_embed is None else frames_embed

        def adapt_mix(x, enabled, name, proj_ctor):
            if not enabled:
                return x
            proj = proj_ctor(f"{name}_proj")(x)
            proj = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"{name}_norm")(proj)
            alpha = self.param(f"{name}_alpha", nn.initializers.zeros, (1,), jnp.float32).astype(x.dtype)
            return (1 - alpha) * x + alpha * proj

        key = adapt_mix(
            key_src, spec.adapt_k, "k",
            lambda n: TorchMLP(self.qk_dim, self.mlp_depth, dtype=self.dtype, name=n),
        )
        value = adapt_mix(
            frames_feature, spec.adapt_v, "v",
            lambda n: TorchMLP(self.encoder_hidden_size, self.mlp_depth, dtype=self.dtype, name=n),
        )

        kt = 1 if (modal == "image" or t == 1) else spec.temporal_kernel_size
        ks = spec.spatial_kernel_size
        down = (math.ceil(t / kt), math.ceil(h / ks), math.ceil(w / ks))

        q = resize_thw(frames_feature, down)
        adapt_q = spec.adapt_q and self.use_guide != "direct"  # direct replaces q entirely
        q = adapt_mix(
            q, adapt_q, "q",
            lambda n: nn.Dense(self.qk_dim, use_bias=False, dtype=self.dtype,
                               kernel_init=trunc_normal_init, name=n),
        )
        if self.use_guide is not None:
            q = GuideInjector(
                self.use_guide, self.qk_dim, self.qk_dim, spec.adapt_guide,
                self.mlp_depth, dtype=self.dtype, name="guide_injector",
            )(q, guide_embed)

        import os as _os

        fused = _os.environ.get("HICOM_FUSED_LOCAL", "0")
        divisible = t % kt == 0 and h % ks == 0 and w % ks == 0
        use_fused = divisible and (
            (fused == "1" and jax.default_backend() == "tpu") or fused == "interpret"
        )
        att_scale = jnp.exp(logit_scale) if logit_scale is not None else 1.0 / math.sqrt(self.qk_dim)
        if use_fused:
            # one-pass Pallas kernel: tiles sliced in VMEM, no retile HBM copy
            from ..ops.local_attn import fused_tile_attention

            out = fused_tile_attention(
                q, key, value, (kt, ks, ks), att_scale, logit_bias,
                interpret=fused == "interpret",
            )
        else:
            rk = tile_thw(key, (kt, ks, ks))  # (G, K, qk)
            rv = tile_thw(value, (kt, ks, ks))  # (G, K, dv)
            rq = q.reshape(-1, 1, q.shape[-1])  # (G, 1, qk)
            out = sdpa(rq, rk, rv, scale=att_scale, logit_bias=logit_bias)
            out = out.reshape(*down, value.shape[-1])
        return TorchMLP(self.output_hidden_size, self.mlp_depth, dtype=self.dtype, name="readout")(out)


class GlobalCompressor(nn.Module):
    """Learnable-query global cross-attention (reference ``projector.py:562-646``).

    N zero-init queries (guide-injected) attend over all t·h·w tokens with 3D
    sinusoidal position embeddings added; residual + MLP readout.
    """

    spec: GlobalCompressorSpec
    text_dim: int
    embed_dim: int
    output_hidden_size: int
    use_guide: Optional[str]
    mlp_depth: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        frames_feature: Array,  # (t, h, w, d)
        frames_embed: Optional[Array] = None,  # unused (parity with reference)
        guide_embed: Optional[Array] = None,
        modal: str = "video",
        logit_scale: Optional[Array] = None,
        logit_bias: Union[float, Array] = 0.0,
        t_offset: Optional[Array] = None,  # sharded: global index of frame 0
        t_total: Optional[int] = None,  # sharded: global frame count (static)
        kv_axis_name=None,  # sharded: mesh axis the t axis is split over
    ) -> Array:
        t, h, w, d = frames_feature.shape
        base_query = self.param("query", nn.initializers.zeros, (self.spec.num_queries, self.embed_dim), jnp.float32)
        base_query = base_query.astype(self.dtype)

        if self.spec.use_pos_emb:
            if t_total is not None:
                # KV holds frames [t_offset, t_offset+t) of a t_total-frame
                # video: slice the global 3D PE at the (traced) offset.
                full = jnp.asarray(get_3d_sincos_pos_embed(t_total, h, w, self.embed_dim),
                                   dtype=frames_feature.dtype)
                start = jnp.asarray(t_offset if t_offset is not None else 0, jnp.int32)
                pos = jax.lax.dynamic_slice_in_dim(full, start, t, axis=0)
            else:
                pos = jnp.asarray(get_3d_sincos_pos_embed(t, h, w, self.embed_dim),
                                  dtype=frames_feature.dtype)
            frames_feature = frames_feature + pos

        query = base_query
        if self.use_guide is not None:
            query = GuideInjector(
                self.use_guide, self.text_dim, self.embed_dim, self.spec.adapt_guide,
                self.mlp_depth, dtype=self.dtype, name="guide_injector",
            )(query, guide_embed)

        kv = frames_feature.reshape(1, t * h * w, d)
        x = MultiheadAttention(self.embed_dim, max(1, self.embed_dim // 128), dtype=self.dtype, name="attn_layer")(
            query[None], kv, kv, logit_scale=logit_scale, logit_bias=logit_bias,
            kv_axis_name=kv_axis_name,
        )
        return TorchMLP(self.output_hidden_size, self.mlp_depth, dtype=self.dtype, name="readout")(query + x[0])


class HIComProjector(nn.Module):
    """Container running local and/or global compression and concatenating
    ``[local_tokens ; global_tokens]`` (reference ``projector.py:649-708``).

    ``use_clip_scale`` ∈ {"local","global"} attaches SigLIP contrastive
    logit_scale/logit_bias parameters (imported from the tower checkpoint).
    Anyres images arrive as a dict ``{"base": (h,w,d)|None, "patch": (H,W,d)}``.
    """

    config: HIComConfig
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        spec = cfg.projector
        assert spec.kind == "hicom", "mean-pool projectors are handled by MeanPoolProjector"
        use_cs = [s for s in cfg.use_clip_scale.split(",") if s]
        self.local_use_clip_scale = "local" in use_cs
        self.global_use_clip_scale = "global" in use_cs
        if self.local_use_clip_scale:
            self.local_logit_scale = self.param("local_logit_scale", nn.initializers.zeros, (), jnp.float32)
            self.local_logit_bias = self.param("local_logit_bias", nn.initializers.zeros, (), jnp.float32)
        if self.global_use_clip_scale:
            self.global_logit_scale = self.param("global_logit_scale", nn.initializers.zeros, (), jnp.float32)
            self.global_logit_bias = self.param("global_logit_bias", nn.initializers.zeros, (), jnp.float32)

        if spec.local is not None:
            self.local_compressor = LocalCompressor(
                spec=spec.local,
                qk_dim=cfg.qk_dim,
                encoder_hidden_size=cfg.mm_hidden_size,
                output_hidden_size=cfg.hidden_size,
                use_guide=_resolve_use_guide(cfg.use_guide, spec.local.force_use_guide),
                dtype=self.dtype,
            )
        else:
            self.local_compressor = None
        if spec.global_ is not None:
            self.global_compressor = GlobalCompressor(
                spec=spec.global_,
                text_dim=cfg.qk_dim,
                embed_dim=cfg.mm_hidden_size,
                output_hidden_size=cfg.hidden_size,
                use_guide=_resolve_use_guide(cfg.use_guide, spec.global_.force_use_guide),
                dtype=self.dtype,
            )
        else:
            self.global_compressor = None

    def __call__(self, frames_feature, frames_embed=None, guide_embed=None, modal="video", image_newline=None):
        from .postprocess import post_process_visual_feature

        is_dict = isinstance(frames_feature, dict)
        local_x = global_x = None

        if self.local_compressor is not None:
            ls = self.local_logit_scale if self.local_use_clip_scale else None
            lb = self.local_logit_bias if self.local_use_clip_scale else 0.0
            if is_dict:
                parts = []
                if frames_feature["base"] is not None:
                    base = self.local_compressor(
                        frames_feature["base"][None],
                        frames_embed["base"][None] if frames_embed is not None else None,
                        guide_embed, modal, ls, lb,
                    )
                    parts.append(post_process_visual_feature(self.config, base, modal, image_newline, is_anyres=False))
                patch = self.local_compressor(
                    frames_feature["patch"][None],
                    frames_embed["patch"][None] if frames_embed is not None else None,
                    guide_embed, modal, ls, lb,
                )
                parts.append(post_process_visual_feature(self.config, patch, modal, image_newline, is_anyres=True))
                local_x = jnp.concatenate(parts, axis=-2) if len(parts) > 1 else parts[0]
            else:
                local_x = self.local_compressor(frames_feature, frames_embed, guide_embed, modal, ls, lb)
                local_x = post_process_visual_feature(self.config, local_x, modal, image_newline, is_anyres=False)

        if self.global_compressor is not None:
            gs = self.global_logit_scale if self.global_use_clip_scale else None
            gb = self.global_logit_bias if self.global_use_clip_scale else 0.0
            if is_dict:
                global_x = self.global_compressor(
                    frames_feature["patch"][None],
                    frames_embed["patch"][None] if frames_embed is not None else None,
                    guide_embed, modal, gs, gb,
                )
            else:
                global_x = self.global_compressor(frames_feature, frames_embed, guide_embed, modal, gs, gb)

        if local_x is None:
            return global_x
        if global_x is None:
            return local_x
        return jnp.concatenate([local_x, global_x], axis=-2)

    def compress_shard(
        self,
        frames_feature: Array,  # (t_loc, h, w, dv) — local chunk of the t axis
        frames_embed: Optional[Array],
        guide_embed: Optional[Array],
        modal: str,
        t_offset: Array,  # global index of this chunk's first frame
        t_total: int,  # static global frame count
        kv_axis_name,
    ):
        """Sequence-parallel compression of one t-chunk (shard_map body).

        The local compressor is exactly shard-local when ``t_loc`` is a
        multiple of its temporal kernel: integer-factor trilinear query
        windows and T×S×S tiles never cross chunk boundaries. The global
        compressor merges per-chunk softmax stats over ``kv_axis_name``
        (every device returns identical global tokens).

        Returns ``(local_raw, global_tokens)``: local output is the
        pre-postprocess (t', h', w', D) grid — the caller gathers chunks and
        applies ``post_process_visual_feature`` once on the full grid.
        """
        t_loc = frames_feature.shape[0]
        local_raw = None
        if self.local_compressor is not None:
            kt = self.local_compressor.spec.temporal_kernel_size
            assert modal == "video" and t_loc % kt == 0 and t_loc >= kt, (
                f"sharded local compression needs video chunks divisible by the "
                f"temporal kernel (t_loc={t_loc}, kernel={kt})"
            )
            ls = self.local_logit_scale if self.local_use_clip_scale else None
            lb = self.local_logit_bias if self.local_use_clip_scale else 0.0
            local_raw = self.local_compressor(frames_feature, frames_embed, guide_embed, modal, ls, lb)
        global_tokens = None
        if self.global_compressor is not None:
            gs = self.global_logit_scale if self.global_use_clip_scale else None
            gb = self.global_logit_bias if self.global_use_clip_scale else 0.0
            global_tokens = self.global_compressor(
                frames_feature, frames_embed, guide_embed, modal, gs, gb,
                t_offset=t_offset, t_total=t_total, kv_axis_name=kv_axis_name,
            )
        return local_raw, global_tokens


class MeanPoolProjector(nn.Module):
    """The ``mlp2x_gelu`` / ``linear`` baseline path: MLP per token; the
    assembly layer applies the 2×2 trilinear spatial downsample for video
    (reference ``hicom_arch.py:193-208``)."""

    out_dim: int
    depth: int = 2  # 1 == "linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return TorchMLP(self.out_dim, self.depth, dtype=self.dtype, name="layers")(x)
