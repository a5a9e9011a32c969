"""HICom model assembly: vision tower + guide encoder + projector + decoder.

Mirrors the responsibilities of ``HIComMetaModel`` / ``HIComMetaForCausalLM``
(``/root/reference/hicom/model/hicom_arch.py``) with a TPU-first dataflow:

* all samples' frames run through SigLIP as one batched matmul-heavy pass
  (reference batches this too, hicom_arch.py:159-161);
* the per-sample projector loop (hicom_arch.py:167-178) becomes an ``nn.vmap``
  over the batch — one fused program instead of b sequential graphs;
* sentinel-token splicing is the static-shape gather of ``splice.py`` instead
  of a Python concat loop.

The module exposes composable methods (``encode_visual``, ``embed_and_splice``,
``decode``) so training and generation jit the same building blocks.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import HIComConfig
from ..ops.resize import resize_thw
from .postprocess import num_visual_tokens, post_process_visual_feature
from .projector import HIComProjector, MeanPoolProjector
from .qwen2 import KVCache, Qwen2ForCausalLM
from .siglip import SiglipTextEncoder, SiglipVisionTower
from .splice import SplicedInputs, splice_visual_embeds

Array = jnp.ndarray


def _dtype_of(config: HIComConfig):
    return jnp.dtype(config.dtype)


class HIComModel(nn.Module):
    config: HIComConfig

    def setup(self):
        cfg = self.config
        dtype = _dtype_of(cfg)
        self.dtype = dtype
        need_head = cfg.guide_enabled()  # image_embeds used as compression keys
        is_clip = "clip" in (cfg.mm_vision_tower or "") and "siglip" not in (cfg.mm_vision_tower or "")
        if is_clip:
            from .clip import ClipTextEncoder, ClipVisionTower

            self.vision_tower = ClipVisionTower(
                config=cfg.vision_config,
                select_layer=cfg.mm_vision_select_layer,
                with_projection=need_head,
                dtype=dtype,
                name="vision_tower",
            )
            if cfg.guide_enabled():
                self.guide_encoder = ClipTextEncoder(config=cfg.guide_text_config, dtype=dtype, name="guide_encoder")
        else:
            self.vision_tower = SiglipVisionTower(
                config=cfg.vision_config,
                select_layer=cfg.mm_vision_select_layer,
                with_head=need_head,
                dtype=dtype,
                name="vision_tower",
            )
            if cfg.guide_enabled():
                self.guide_encoder = SiglipTextEncoder(config=cfg.guide_text_config, dtype=dtype, name="guide_encoder")
        spec = cfg.projector
        if spec.kind == "hicom":
            self.mm_projector = HIComProjector(config=cfg, dtype=dtype, name="mm_projector")
        else:
            self.mm_projector = MeanPoolProjector(out_dim=cfg.hidden_size, depth=spec.mlp_depth, dtype=dtype, name="mm_projector")
        self.language_model = Qwen2ForCausalLM(config=cfg.text_config, dtype=dtype, name="language_model")
        if "anyres" in (cfg.image_aspect_ratio or ""):
            embed_std = 1.0 / math.sqrt(cfg.hidden_size)
            self.image_newline = self.param(
                "image_newline", nn.initializers.normal(stddev=embed_std), (cfg.hidden_size,), jnp.float32
            )
        else:
            self.image_newline = None

    # ------------------------------------------------------------------ #
    # Visual encoding
    # ------------------------------------------------------------------ #

    def encode_guide(self, guide_ids: Array, guide_mask: Optional[Array] = None) -> Array:
        """(b, Lg) token ids → guide embedding: pooled (b, d) or per-token
        (b, Lg, d) for ``fine`` mode."""
        pooled, per_token = self.guide_encoder(guide_ids, guide_mask)
        return per_token if self.config.use_guide == "fine" else pooled

    def encode_visual(
        self,
        frames: Array,  # (b, t, 3, H, W)
        guide_embeds: Optional[Array] = None,  # (b, d) or (b, Lg, d)
        modal: str = "video",
    ) -> Array:
        """Full vision path: SigLIP over all frames, then batched compression.
        Returns (b, V, hidden) visual tokens."""
        cfg = self.config
        b, t = frames.shape[:2]
        flat = frames.reshape((b * t,) + frames.shape[2:])
        features, image_embeds = self.vision_tower(flat)
        features = features.reshape((b, t) + features.shape[1:])
        if image_embeds is not None:
            image_embeds = image_embeds.reshape((b, t) + image_embeds.shape[1:])

        spec = cfg.projector
        if spec.kind in ("mlp", "linear"):
            return self._mean_pool_project(features, modal)

        nl = self.image_newline.astype(self.dtype) if self.image_newline is not None else None
        in_axes = (0, 0 if image_embeds is not None else None, 0 if guide_embeds is not None else None, None, None)
        vp = nn.vmap(
            lambda mdl, *a: mdl(*a),
            in_axes=in_axes,
            out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )
        return vp(self.mm_projector, features, image_embeds, guide_embeds, modal, nl)

    def encode_visual_anyres(
        self,
        frames: Array,  # (n, 3, H, W): crop 0 = base image + grid patches
        image_size,  # host tuple (width, height) of the original image
        guide_embeds: Optional[Array] = None,  # (d,) or (Lg, d)
    ) -> Array:
        """Single anyres image → (V, hidden) tokens. Shapes depend on the host
        image_size, so callers jit per resulting shape (eval path)."""
        from .anyres import make_anyres_plan

        cfg = self.config
        plan = make_anyres_plan(image_size, cfg, cfg.vision_config.image_size)
        return self.encode_visual_anyres_plan(frames, plan, guide_embeds)

    def encode_visual_anyres_plan(
        self,
        frames: Array,  # (n, 3, H, W)
        plan,  # AnyresPlan (static) or None (non-spatial merge)
        guide_embeds: Optional[Array] = None,
    ) -> Array:
        """Single anyres image under a STATIC merge plan — the jit-safe core
        shared by eval (plan derived per sample) and the train step (batches
        grouped by plan; reference trains anyres in the llava1.5 ablation,
        hicom_arch.py:216-269 + mlp2x_gelu_anyres.sh:112-115)."""
        from .anyres import apply_anyres_plan

        cfg = self.config
        features, image_embeds = self.vision_tower(frames)
        nl = self.image_newline.astype(self.dtype) if self.image_newline is not None else None
        spec = cfg.projector
        if plan is None:
            feat = features
            if spec.kind in ("mlp", "linear"):
                proj = self.mm_projector(feat)
                return post_process_visual_feature(cfg, proj, "image", nl, is_anyres=False)
            emb = image_embeds
            return self.mm_projector(feat, emb, guide_embeds, "image", nl)
        feat = apply_anyres_plan(features, plan)
        emb = apply_anyres_plan(image_embeds, plan) if image_embeds is not None else None
        if spec.kind in ("mlp", "linear"):
            parts = []
            if feat["base"] is not None:
                base = self.mm_projector(feat["base"][None])
                parts.append(post_process_visual_feature(cfg, base, "image", nl, is_anyres=False))
            patch = self.mm_projector(feat["patch"][None])
            parts.append(post_process_visual_feature(cfg, patch, "image", nl, is_anyres=True))
            return jnp.concatenate(parts, axis=-2)
        return self.mm_projector(feat, emb, guide_embeds, "image", nl)

    def encode_visual_shard(
        self,
        frames: Array,  # (t_loc, 3, H, W) — one device's chunk of a long video
        guide_embeds: Optional[Array],
        modal: str,
        t_offset: Array,
        t_total: int,
        kv_axis_name,
    ):
        """Sequence-parallel vision path body (see parallel/long_video.py):
        tower + compressors on a t-chunk inside shard_map. Exceeds the
        reference's 32-frame cap (constants.py:21) by sharding frames over the
        mesh instead of truncating."""
        assert self.config.projector.kind == "hicom"
        features, image_embeds = self.vision_tower(frames)
        return self.mm_projector.compress_shard(
            features, image_embeds, guide_embeds, modal, t_offset, t_total, kv_axis_name
        )

    def _mean_pool_project(self, features: Array, modal: str) -> Array:
        """Baseline mlp/linear path (reference hicom_arch.py:193-208): project,
        then for video trilinear-downsample 2×2 spatially, then flatten.
        Rows share shape/modal → one vmapped program, not b unrolled copies."""
        import jax

        cfg = self.config
        b, t, h, w, _ = features.shape
        proj = self.mm_projector(features)  # (b, t, h, w, hidden)
        nl = self.image_newline.astype(self.dtype) if self.image_newline is not None else None

        def one(x):
            if modal == "video":
                x = resize_thw(x, (t, math.ceil(h / 2), math.ceil(w / 2)))
            return post_process_visual_feature(cfg, x, modal, nl, is_anyres=False)

        return jax.vmap(one)(proj)

    def visual_token_count(self, t: int, modal: str) -> int:
        """Static count of visual tokens for a t-frame input (non-anyres)."""
        cfg = self.config
        hw = cfg.vision_config.num_patches_per_side
        spec = cfg.projector
        if spec.kind in ("mlp", "linear"):
            thw = (t, math.ceil(hw / 2), math.ceil(hw / 2)) if modal == "video" else (t, hw, hw)
            return num_visual_tokens(cfg, thw, modal, has_newline=self.image_newline is not None)
        n = 0
        if spec.local is not None:
            kt = 1 if (modal == "image" or t == 1) else spec.local.temporal_kernel_size
            ks = spec.local.spatial_kernel_size
            thw = (math.ceil(t / kt), math.ceil(hw / ks), math.ceil(hw / ks))
            n += num_visual_tokens(cfg, thw, modal, has_newline=self.image_newline is not None)
        if spec.global_ is not None:
            n += spec.global_.num_queries
        return n

    # ------------------------------------------------------------------ #
    # Text + splice + decode
    # ------------------------------------------------------------------ #

    def embed_and_splice(
        self,
        input_ids: Array,  # (b, L) with modal sentinels
        visual_embeds: Optional[Array],  # (b, V, hidden) or None (text-only)
        attention_mask: Optional[Array] = None,
        labels: Optional[Array] = None,
    ) -> SplicedInputs:
        safe_ids = jnp.where(input_ids < 0, 0, input_ids)
        text_embeds = self.language_model.embed(safe_ids)
        if visual_embeds is None:
            b, L = input_ids.shape
            if attention_mask is None:
                attention_mask = jnp.ones((b, L), dtype=bool)
            positions = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (b, L))
            return SplicedInputs(text_embeds, attention_mask.astype(bool), labels, positions)
        if visual_embeds.ndim == 4:  # (b, K, V, D): multi-image prompts
            from .splice import splice_visual_embeds_multi

            return splice_visual_embeds_multi(input_ids, text_embeds, visual_embeds, attention_mask, labels)
        return splice_visual_embeds(input_ids, text_embeds, visual_embeds, attention_mask, labels)

    def decode(
        self,
        embeds: Array,
        positions: Array,
        cache: Optional[KVCache] = None,
        padding_mask: Optional[Array] = None,
    ):
        return self.language_model(embeds, positions, cache, padding_mask)

    # ------------------------------------------------------------------ #
    # One-shot forward (training / eval loss)
    # ------------------------------------------------------------------ #

    def __call__(
        self,
        input_ids: Array,
        frames: Optional[Array] = None,
        attention_mask: Optional[Array] = None,
        labels: Optional[Array] = None,
        guide_ids: Optional[Array] = None,
        guide_mask: Optional[Array] = None,
        modal: str = "video",
        multi_image: bool = False,  # static: frames is (b, K, 3, H, W) — K images, K sentinels
        anyres_plan=None,  # static AnyresPlan: frames is (b, n_crops, 3, H, W)
    ):
        """Returns (logits, spliced labels, attention mask)."""
        visual = None
        if frames is not None:
            guide_embeds = None
            if self.config.guide_enabled():
                guide_embeds = self.encode_guide(guide_ids, guide_mask)
            if anyres_plan is not None and modal == "image" and not multi_image:
                # anyres TRAIN path: every row shares the static merge plan
                # (batches grouped by plan upstream), so one vmapped program
                # covers the batch — the llava1.5 anyres ablation
                # (hicom_arch.py:216-269) inside the jitted step.
                in_axes = (0, 0 if guide_embeds is not None else None)
                vp = nn.vmap(
                    lambda mdl, f, g: mdl.encode_visual_anyres_plan(f, anyres_plan, g),
                    in_axes=in_axes, out_axes=0,
                    variable_axes={"params": None}, split_rngs={"params": False},
                )
                visual = vp(self, frames, guide_embeds)
            elif multi_image and modal == "image":
                # each image is its own single-frame sample; rows with fewer
                # sentinels than K ignore the surplus (multi-sentinel splice).
                b, K = frames.shape[:2]
                flat = frames.reshape(b * K, 1, *frames.shape[2:])
                ge = None
                if guide_embeds is not None:
                    ge = jnp.repeat(guide_embeds, K, axis=0)
                visual = self.encode_visual(flat, ge, "image")
                visual = visual.reshape(b, K, visual.shape[-2], visual.shape[-1])
            else:
                visual = self.encode_visual(frames, guide_embeds, modal)
        spliced = self.embed_and_splice(input_ids, visual, attention_mask, labels)
        logits, _ = self.decode(spliced.embeds, spliced.positions, padding_mask=spliced.attention_mask)
        return logits, spliced.labels, spliced.attention_mask
