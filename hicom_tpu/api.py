"""Public inference API: ``model_init`` and ``mm_infer``.

Mirrors the reference surface (``/root/reference/hicom/__init__.py:14-124`` and
``model/__init__.py:42-193``): ``model_init(path)`` loads a checkpoint into a
runtime handle + processor dict + tokenizer; ``mm_infer`` runs one multimodal
generation. Checkpoint layouts supported:

* **SFT** — one HF directory with ``model_type: hicom_*``, full weights
  (decoder + vision tower + guide encoder + projector + image_newline).
* **pretrain** — base LLM directory (``model_base=``) + ``mm_projector.bin``
  in ``model_path``; tower weights from ``config.mm_vision_tower``.
* **plain LLM** — text-only.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional

import numpy as np

from .config import HIComConfig, SiglipTextConfig, SiglipVisionConfig
from .constants import DEFAULT_IMAGE_TOKEN, DEFAULT_VIDEO_TOKEN
from .data.image import process_image
from .data.processor import SiglipImagePreprocessor
from .data.prompts import get_model_name_from_path, tokenizer_multimodal_token
from .data.video import process_video
from . import weights as W


@dataclass
class HICom:
    """Loaded model runtime: config + flax module + params on device."""

    config: HIComConfig
    model: Any
    params: Dict[str, Any]
    guide_tokenizer: Any = None
    eos_token_id: Optional[int] = None
    cache_len: int = 4096
    _gen_cache: dict = field(default_factory=dict)
    _eval_mesh: Any = None
    _tower_calibrated: bool = False
    # pruned fp16 copies of the static-quant tower's original kernels (host),
    # consumed by the first calibrate_tower for the SmoothQuant refit
    _fp_tower_kernels: Any = None
    _dec_calibrated: bool = False
    # same for a static-quant ("w8a8s*") decoder — consumed by the first
    # calibrate_decoder (see load_model dec_quant)
    _fp_dec_kernels: Any = None

    def shard_for_eval(self, mesh=None):
        """Replicate params over a mesh and shard subsequent batched-generate
        calls' batch axis across it — one pjit program over all chips instead
        of the reference's one-process-per-GPU bash fan-out
        (scripts/eval/video/*.sh, SURVEY.md §3.4)."""
        import jax

        from .parallel.mesh import create_mesh
        from .parallel.sharding import replicate

        if mesh is None:
            mesh = create_mesh(dp=len(jax.devices()))
        self.params = jax.device_put(self.params, replicate(mesh))
        self._eval_mesh = mesh
        return mesh

    def calibrate_tower(self, frames: np.ndarray, guide_ids: Optional[np.ndarray] = None,
                        modal: str = "video") -> None:
        """Fill a static-quant tower's activation scales ("w8a8s*" modes) from
        one calibration forward over representative ``frames`` (b, t, 3, H, W).
        A '+calib' twin of the model (identical param tree, models/quant.py)
        quantizes with live per-tensor absmax while sowing each site's amax;
        the scales are written into ``self.params`` in place. No-op effect on
        dynamic modes (no act_scale params exist to fill)."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from .models.hicom import HIComModel
        from .models.quant import fill_act_scales

        ccfg = dataclasses.replace(
            self.config, vision_config=dataclasses.replace(
                self.config.vision_config,
                quantization=(self.config.vision_config.quantization or "") + "+calib"))
        cmodel = HIComModel(config=ccfg)
        f = jnp.asarray(frames, jnp.dtype(self.config.dtype))
        g = None
        if guide_ids is not None and self.config.guide_enabled():
            g = self.model.apply({"params": self.params}, jnp.asarray(guide_ids),
                                 method="encode_guide")

        @jax.jit
        def calib_fn(params, f, g):
            def run(m):
                return jnp.sum(m.encode_visual(f, g, modal).astype(jnp.float32))

            return cmodel.apply({"params": params}, method=run, mutable=["calib"])

        _, mut = calib_fn(self.params, f, g)
        fp = ({"vision_tower": self._fp_tower_kernels}
              if self._fp_tower_kernels else None)
        self.params = fill_act_scales(self.params, jax.device_get(mut["calib"]),
                                      fp_params=fp)
        self._fp_tower_kernels = None  # refit done — free the host copy
        self._tower_calibrated = True

    def calibrate_decoder(self, input_ids: np.ndarray, frames: np.ndarray,
                          guide_ids: Optional[np.ndarray] = None,
                          modal: str = "video") -> None:
        """Fill a static-quant decoder's activation scales (dec_quant
        "w8a8s*") from one calibration prefill over a representative prompt:
        a '+calib' text-config twin runs the real pipeline (guide → visual →
        splice → decoder) quantizing with live per-tensor absmax while sowing
        each site's amax; fill_act_scales then writes act_scale and — where
        the per-channel profile is heavy-tailed — SmoothQuant act_smooth
        factors, refitting kernels from the pruned fp copies kept by
        load_model (decoder outliers are the canonical SmoothQuant case,
        arXiv 2211.10438). The decoder analogue of :meth:`calibrate_tower`."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from .models.hicom import HIComModel
        from .models.quant import fill_act_scales

        ccfg = dataclasses.replace(
            self.config, text_config=dataclasses.replace(
                self.config.text_config,
                quantization=(self.config.text_config.quantization or "") + "+calib"))
        cmodel = HIComModel(config=ccfg)
        f = jnp.asarray(frames, jnp.dtype(self.config.dtype))
        g = jnp.asarray(guide_ids) if (guide_ids is not None and self.config.guide_enabled()) else None
        ids = jnp.asarray(input_ids)

        @jax.jit
        def calib_fn(params, ids, f, g):
            def run(m):
                ge = m.encode_guide(g) if g is not None else None
                visual = m.encode_visual(f, ge, modal)
                spliced = m.embed_and_splice(ids, visual)
                hidden, _ = m.language_model.model(spliced.embeds, spliced.positions)
                return jnp.sum(m.language_model.logits(hidden[:, -1:]).astype(jnp.float32))

            return cmodel.apply({"params": params}, method=run, mutable=["calib"])

        _, mut = calib_fn(self.params, ids, f, g)
        fp = ({"language_model": self._fp_dec_kernels}
              if self._fp_dec_kernels else None)
        self.params = fill_act_scales(self.params, jax.device_get(mut["calib"]),
                                      fp_params=fp)
        self._fp_dec_kernels = None
        self._dec_calibrated = True

    def _maybe_autocalibrate_decoder(self, input_ids, frames, guide_ids, modal: str) -> None:
        """Static-quant decoders ship with act_scale=1.0; calibrate once on
        the first real multimodal prompt (mirrors _maybe_autocalibrate).
        Must run AFTER the tower autocalibration so the visual features
        feeding the splice already carry serving numerics."""
        quant = getattr(self.config.text_config, "quantization", None)
        if (self._dec_calibrated or frames is None
                or not (isinstance(quant, str) and quant.startswith("w8a8s"))):
            return
        f = np.asarray(frames)
        if f.ndim == 4:
            f = f[None]
        f = f[:1, : min(8, f.shape[1])]
        g = np.asarray(guide_ids)[:1] if guide_ids is not None else None
        self.calibrate_decoder(np.asarray(input_ids)[:1], f, guide_ids=g, modal=modal)

    def _maybe_autocalibrate(self, frames, guide_ids, modal: str) -> None:
        """Static-quant towers ("w8a8s*") ship with act_scale=1.0; calibrate
        once on the first real frames so every entry point (mm_infer, eval
        runner, serve prefill) gets correct scales without an explicit call.
        Scales are per-tensor and shape-independent, so a small frame slice
        suffices and the extra compile stays cheap."""
        quant = getattr(self.config.vision_config, "quantization", None)
        if self._tower_calibrated or not (isinstance(quant, str) and quant.startswith("w8a8s")):
            return
        if frames is None:
            return
        f = np.asarray(frames)
        if f.ndim == 4:  # (t, 3, H, W) → add batch
            f = f[None]
        f = f[:1, : min(8, f.shape[1])]
        g = np.asarray(guide_ids)[:1] if guide_ids is not None else None
        self.calibrate_tower(f, guide_ids=g, modal=modal)

    def _place_batch(self, tree):
        """Shard array leaves' batch axis over the eval mesh when divisible."""
        import jax

        from .parallel.sharding import batch_sharding

        mesh = self._eval_mesh
        if mesh is None:
            return tree
        n = mesh.devices.size
        bs = batch_sharding(mesh)

        def place(x):
            if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n == 0:
                return jax.device_put(x, bs)
            return x

        return jax.tree.map(place, tree)

    def generate(
        self,
        input_ids: np.ndarray,
        frames: Optional[np.ndarray] = None,
        guide_ids: Optional[np.ndarray] = None,
        guide_mask: Optional[np.ndarray] = None,
        attention_mask: Optional[np.ndarray] = None,
        visual_embeds: Optional[np.ndarray] = None,
        modal: str = "video",
        max_new_tokens: int = 128,
        do_sample: bool = False,
        temperature: float = 0.2,
        top_p: float = 0.9,
        seed: int = 0,
        stop_sequences: tuple = (),
        spec_decode: Optional[int] = None,
    ) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        from .models.generate import generate_tokens

        temp = float(temperature) if do_sample else 0.0
        # prompt-lookup speculative decoding (greedy b=1 only; generate_tokens
        # self-gates): k drafts verified per decode step — opt-in, the chip
        # A/B decides whether it becomes a serving default
        if spec_decode is None:
            spec_decode = int(os.environ.get("HICOM_SPEC_DECODE", "0"))
        has_frames = frames is not None or visual_embeds is not None
        if frames is not None:
            self._maybe_autocalibrate(frames, guide_ids, modal)
            self._maybe_autocalibrate_decoder(input_ids, frames, guide_ids, modal)

        # auto-grow the KV cache for long prompts (e.g. 256-frame videos):
        # spliced length = L + n_sentinels*(V - 1), V from config (static) or
        # the precomputed embeds; round up so jit variants stay few.
        L = input_ids.shape[1]
        if visual_embeds is not None:
            V = visual_embeds.shape[1]
        elif frames is not None:
            key = ("vtok", frames.shape[1], modal)
            if key not in self._gen_cache:
                self._gen_cache[key] = int(
                    self.model.bind({"params": self.params}).visual_token_count(frames.shape[1], modal)
                )
            V = self._gen_cache[key]
        else:
            V = 0
        # the generate path always uses the single-sentinel splice
        # (models/splice.py): out_len = L - 1 + V even if the prompt carries
        # stray extra sentinels (they stay ordinary tokens)
        need = L + max(V - 1, 0) + max_new_tokens + 8
        cache_len = self.cache_len
        if need > cache_len:
            cache_len = ((need + 1023) // 1024) * 1024

        # beyond-bucket prompts on a multi-chip mesh: prefill via ring
        # attention (sequence axis sharded, KV rotated — parallel/ring.py)
        # instead of one chip holding the whole (S, S) prefill. Composes with
        # the sequence-parallel long-video encoder (mm_infer passes
        # visual_embeds for >32-frame videos).
        ring_min = int(os.environ.get("HICOM_RING_PREFILL_MIN", "16384"))
        S_est = L + max(V - 1, 0)
        if (has_frames and input_ids.shape[0] == 1 and attention_mask is None
                and S_est >= ring_min and len(jax.devices()) > 1):
            return self._generate_ring(
                input_ids, frames, guide_ids, guide_mask, visual_embeds,
                modal, max_new_tokens, temp, float(top_p), seed,
                tuple(stop_sequences), max(cache_len, S_est))

        batch_in = self._place_batch({
            "input_ids": jnp.asarray(input_ids),
            "frames": jnp.asarray(frames, dtype=jnp.dtype(self.config.dtype)) if frames is not None else None,
            "guide_ids": jnp.asarray(guide_ids) if guide_ids is not None else None,
            "guide_mask": jnp.asarray(guide_mask) if guide_mask is not None else None,
            "attention_mask": jnp.asarray(attention_mask) if attention_mask is not None else None,
            "visual_embeds": visual_embeds if visual_embeds is None else jnp.asarray(visual_embeds),
        })
        out = generate_tokens(
            {"params": self.params},
            batch_in["input_ids"],
            batch_in["frames"],
            batch_in["guide_ids"],
            batch_in["guide_mask"],
            jax.random.PRNGKey(seed),
            batch_in["attention_mask"],
            batch_in["visual_embeds"],
            model=self.model,
            modal=modal if has_frames else "text",
            max_new_tokens=max_new_tokens,
            temperature=temp,
            top_p=float(top_p),
            eos_token_id=int(self.eos_token_id),
            cache_len=cache_len,
            has_frames=has_frames,
            stop_sequences=tuple(stop_sequences),
            spec_k=int(spec_decode),
        )
        return np.asarray(out)

    def _generate_ring(self, input_ids, frames, guide_ids, guide_mask,
                       visual_embeds, modal: str, max_new_tokens: int,
                       temperature: float, top_p: float, seed: int,
                       stop_sequences: tuple, cache_len: int) -> np.ndarray:
        """Beyond-bucket generation: encode+splice, ring-attention prefill
        across the device mesh (parallel/ring.py), then the standard decode
        loop over the assembled cache (models/generate.py:decode_tokens)."""
        import jax
        import jax.numpy as jnp

        from .models.generate import decode_tokens
        from .parallel.mesh import create_mesh
        from .parallel.ring import ring_prefill

        key = ("ring_splice", input_ids.shape,
               None if frames is None else frames.shape,
               None if visual_embeds is None else visual_embeds.shape, modal)
        if key not in self._gen_cache:
            def splice_fn(params, ids, f, g, gm, ve):
                def run(m):
                    visual = ve
                    if visual is None:
                        ge = None
                        if m.config.guide_enabled():
                            ge = m.encode_guide(g, gm)
                        visual = m.encode_visual(f, ge, modal)
                    sp = m.embed_and_splice(ids, visual)
                    return sp.embeds, sp.positions, jnp.sum(
                        sp.attention_mask.astype(jnp.int32), axis=1)

                return self.model.apply({"params": params}, method=run)

            self._gen_cache[key] = jax.jit(splice_fn)
        dt = jnp.dtype(self.config.dtype)
        embeds, positions, true_len = self._gen_cache[key](
            self.params, jnp.asarray(input_ids),
            None if frames is None else jnp.asarray(frames, dt),
            None if guide_ids is None else jnp.asarray(guide_ids),
            None if guide_mask is None else jnp.asarray(guide_mask),
            None if visual_embeds is None else jnp.asarray(visual_embeds, dt))

        mesh = create_mesh(dp=len(jax.devices()))
        n = mesh.devices.size
        S = embeds.shape[1]  # b=1 unpadded: spliced length == true length
        cache_len = max(cache_len, -(-S // n) * n)
        last_hidden, cache = ring_prefill(
            self.model, self.params, embeds, positions, mesh, "dp",
            cache_len=cache_len)
        out = decode_tokens(
            {"params": self.params}, cache, last_hidden, true_len,
            jax.random.PRNGKey(seed), model=self.model,
            max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, eos_token_id=int(self.eos_token_id),
            stop_sequences=stop_sequences)
        return np.asarray(out)

    def encode_long_video(self, frames: np.ndarray, guide_ids=None, guide_mask=None) -> np.ndarray:
        """(t, 3, H, W) → (V, hidden) visual tokens with the t axis sharded
        over every device (sequence-parallel SigLIP + compression; see
        parallel/long_video.py). Lifts the reference's 32-frame ceiling."""
        import jax
        import jax.numpy as jnp

        from .models.hicom import HIComModel
        from .parallel.long_video import encode_visual_sharded
        from .parallel.mesh import create_mesh

        self._maybe_autocalibrate(frames, guide_ids, "video")
        frames = jnp.asarray(frames, dtype=jnp.dtype(self.config.dtype))
        ge = None
        if self.config.guide_enabled() and guide_ids is not None:
            ge = self.model.apply(
                {"params": self.params}, jnp.asarray(guide_ids),
                jnp.asarray(guide_mask) if guide_mask is not None else None,
                method=HIComModel.encode_guide,
            )[0]
        key = ("long_video", frames.shape, ge is not None)
        if key not in self._gen_cache:
            mesh = create_mesh(dp=len(jax.devices()))

            def run(p, f, g):
                return encode_visual_sharded(self.model, p, f, mesh, guide_embeds=g, modal="video")

            self._gen_cache[key] = (mesh, jax.jit(run))
        mesh, fn = self._gen_cache[key]
        with mesh:
            return np.asarray(fn(self.params, frames, ge))

    def encode_anyres(self, crops: np.ndarray, image_size, guide_ids=None, guide_mask=None) -> np.ndarray:
        """(n, 3, H, W) anyres crops → (V, hidden) visual tokens."""
        import jax.numpy as jnp

        self._maybe_autocalibrate(np.asarray(crops)[:1][None], guide_ids, "image")
        crops = jnp.asarray(crops, dtype=jnp.dtype(self.config.dtype))

        def run(m):
            ge = None
            if self.config.guide_enabled() and guide_ids is not None:
                ge = m.encode_guide(
                    jnp.asarray(guide_ids),
                    jnp.asarray(guide_mask) if guide_mask is not None else None,
                )[0]
            return m.encode_visual_anyres(crops, tuple(image_size), ge)

        return np.asarray(self.model.apply({"params": self.params}, method=run))


def _tower_configs(tower_path: str):
    """Vision/guide-text configs: from a local tower directory's config.json,
    else baked defaults for the known tower names."""
    is_clip = "clip" in tower_path and "siglip" not in tower_path
    if is_clip:
        from .models.clip import ClipTextConfig, ClipVisionConfig

        if os.path.isdir(tower_path):
            with open(os.path.join(tower_path, "config.json")) as f:
                d = json.load(f)
            vd = d.get("vision_config", {})
            td = d.get("text_config", {})
            vkeys = {f.name for f in __import__("dataclasses").fields(ClipVisionConfig)}
            tkeys = {f.name for f in __import__("dataclasses").fields(ClipTextConfig)}
            vd = {k: v for k, v in vd.items() if k in vkeys}
            td = {k: v for k, v in td.items() if k in tkeys}
            if "projection_dim" in d:
                vd.setdefault("projection_dim", d["projection_dim"])
                td.setdefault("projection_dim", d["projection_dim"])
            return ClipVisionConfig(**vd), ClipTextConfig(**td)
        return ClipVisionConfig(), ClipTextConfig()
    if os.path.isdir(tower_path):
        with open(os.path.join(tower_path, "config.json")) as f:
            d = json.load(f)
        vd = d.get("vision_config", d if d.get("model_type") == "siglip_vision_model" else {})
        td = d.get("text_config", {})
        vision = SiglipVisionConfig(
            hidden_size=vd.get("hidden_size", 1152),
            intermediate_size=vd.get("intermediate_size", 4304),
            num_hidden_layers=vd.get("num_hidden_layers", 27),
            num_attention_heads=vd.get("num_attention_heads", 16),
            image_size=vd.get("image_size", 384),
            patch_size=vd.get("patch_size", 14),
        )
        text = SiglipTextConfig(
            hidden_size=td.get("hidden_size", vision.hidden_size),
            intermediate_size=td.get("intermediate_size", vision.intermediate_size),
            num_hidden_layers=td.get("num_hidden_layers", vision.num_hidden_layers),
            num_attention_heads=td.get("num_attention_heads", vision.num_attention_heads),
            vocab_size=td.get("vocab_size", 32000),
            max_position_embeddings=td.get("max_position_embeddings", 64),
            projection_size=td.get("projection_size", td.get("hidden_size", vision.hidden_size)),
        )
        return vision, text
    if "siglip" in tower_path:
        return SiglipVisionConfig(), SiglipTextConfig()
    raise NotImplementedError(f"unknown vision tower: {tower_path}")


def load_model(
    model_path: str,
    model_base: Optional[str] = None,
    dtype: str = "bfloat16",
    cache_len: int = 4096,
    device: Optional[str] = None,
    load_8bit: bool = False,
    load_4bit: bool = False,
    load_w8a8_tower: bool = False,
    dec_quant: Optional[str] = None,
    scan_layers: bool = False,
    scan_towers: bool = False,
    kv_cache_int8: bool = False,
) -> "HICom":
    """Load a checkpoint directory into a device-resident HICom runtime.

    ``dec_quant``: decoder serving quantization beyond the reference's
    4/8-bit flags — "int8" (weight-only, == load_8bit), "nf4" (== load_4bit),
    "w8a8" / "w8a8_mlp" (int8 MXU prefill, models/quant.py), "w8a8s" /
    "w8a8s_mlp" (static CALIBRATED activation scales; self-calibrates on the
    first multimodal prompt seen by :meth:`HICom.generate`, or explicitly via
    :meth:`HICom.calibrate_decoder`).
    ``load_w8a8_tower``: True for "w8a8", or a mode string such as
    "w8a8_mlp_qkv" / "w8a8s_mlp_qkv"; static "w8a8s*" modes self-calibrate
    their activation scales on the first frames seen by :meth:`HICom.generate`.
    """
    import jax
    import jax.numpy as jnp

    from .models.hicom import HIComModel

    with open(os.path.join(model_path, "config.json")) as f:
        raw_cfg = json.load(f)

    is_pretrain_artifact = os.path.exists(os.path.join(model_path, "mm_projector.bin"))
    is_lora_artifact = os.path.exists(os.path.join(model_path, "adapter_config.json"))
    cfg = HIComConfig.from_hf_dict(raw_cfg)
    vision_cfg, guide_cfg = _tower_configs(cfg.mm_vision_tower)
    # CLIP compression keys live in the contrastive projection space (768),
    # not the tower hidden size (reference projector.py:410-411).
    qk_override = getattr(vision_cfg, "projection_dim", None)
    cfg = cfg.replace(vision_config=vision_cfg, guide_text_config=guide_cfg, dtype=dtype,
                      projector_qk_dim=qk_override)
    assert sum(map(bool, (load_8bit, load_4bit, dec_quant))) <= 1, \
        "pick one decoder quantization (load_8bit / load_4bit / dec_quant)"
    if load_8bit:
        dec_quant = "int8"
    elif load_4bit:
        dec_quant = "nf4"
    if dec_quant or scan_layers or kv_cache_int8:
        import dataclasses as _dc

        cfg = cfg.replace(text_config=_dc.replace(
            cfg.text_config,
            quantization=dec_quant,
            scan_layers=scan_layers,
            kv_cache_int8=kv_cache_int8,
        ))
    if load_w8a8_tower:
        # frozen-tower int8 serving: activations and weights int8, int32 MXU
        # accumulation — ~1.3× tower speedup on v5e (models/quant.py). SigLIP
        # towers only. Pass True for full "w8a8", or a mode string (e.g.
        # "w8a8_mlp_qkv", "w8a8s_mlp_qkv"); static "w8a8s*" modes ship with
        # act_scale=1.0 — calibrate via HICom.calibrate_tower() before serving.
        import dataclasses as _dc

        if hasattr(cfg.vision_config, "projection_dim"):
            raise ValueError("load_w8a8_tower supports the SigLIP tower family")
        tq = load_w8a8_tower if isinstance(load_w8a8_tower, str) else "w8a8"
        cfg = cfg.replace(vision_config=_dc.replace(cfg.vision_config, quantization=tq))
    if scan_towers:
        # one compiled encoder block (stacked layer params): ~num_layers-fold
        # faster remote compiles, identical numerics. SigLIP towers only —
        # the CLIP tower family keeps the unrolled layout.
        import dataclasses as _dc

        if hasattr(cfg.vision_config, "projection_dim"):  # CLIP family
            raise ValueError(
                "scan_towers supports the SigLIP tower family; the CLIP tower "
                "keeps the unrolled layout"
            )
        cfg = cfg.replace(
            vision_config=_dc.replace(cfg.vision_config, scan_layers=True),
            guide_text_config=_dc.replace(cfg.guide_text_config, scan_layers=True),
        )

    spec = cfg.projector
    params: Dict[str, Any] = {}

    if is_pretrain_artifact:
        assert model_base is not None, "pretrain checkpoints need model_base (the base LLM directory)"
        llm_sd = W.load_hf_state_dict(model_base)
        proj_sd = W.load_torch_bin(os.path.join(model_path, "mm_projector.bin"))
        tower_sd = W.load_hf_state_dict(cfg.mm_vision_tower)
    elif is_lora_artifact:
        # reference lora path (model/__init__.py:91-138): base weights +
        # non_lora_trainables + adapter, merged at load.
        assert model_base is not None, "lora checkpoints need model_base"
        llm_sd = W.load_hf_state_dict(model_base)
        nlt_path = os.path.join(model_path, "non_lora_trainables.bin")
        extra_sd = W.load_torch_bin(nlt_path) if os.path.exists(nlt_path) else {}
        extra_sd = {k.replace("base_model.model.", "").replace("model.model.", "model."): v
                    for k, v in extra_sd.items()}
        llm_sd = {**llm_sd, **{k: v for k, v in extra_sd.items() if "mm_projector" not in k and "vision_tower" not in k}}
        proj_sd = {k: v for k, v in extra_sd.items() if "mm_projector" in k}
        tower_sd = W.load_hf_state_dict(cfg.mm_vision_tower)
    else:
        sd = W.load_hf_state_dict(model_path)
        llm_sd = sd
        proj_sd = {k: v for k, v in sd.items() if "mm_projector" in k}
        # tower/guide weights embedded under model.vision_tower.*
        tower_sd = {}
        for k, v in sd.items():
            if k.startswith("model.vision_tower.vision_tower."):
                tower_sd[k[len("model.vision_tower.vision_tower."):]] = v
            elif k.startswith("model.vision_tower.guide_encoder."):
                tower_sd[k[len("model.vision_tower.guide_encoder."):]] = v
        if not tower_sd:  # frozen tower (delay_load): pull from the tower dir
            tower_sd = W.load_hf_state_dict(cfg.mm_vision_tower)

    is_clip = "clip" in cfg.mm_vision_tower and "siglip" not in cfg.mm_vision_tower
    params["language_model"] = W.convert_decoder(llm_sd, cfg.text_config.tie_word_embeddings)
    if is_lora_artifact:
        # merge BEFORE quantize/stack: those rewrite the kernel paths/shapes
        # the adapter keys address (apply_lora asserts full consumption)
        from .train.lora import apply_lora, load_peft_adapter

        lora, alpha, rank = load_peft_adapter(model_path)
        params["language_model"] = apply_lora(params["language_model"], {
            k.replace("language_model/", ""): v for k, v in lora.items()
        }, alpha=alpha, rank=rank)
    fp_dec_kernels = None
    if dec_quant:
        from .models.qwen2 import quantize_decoder_params

        if dec_quant.startswith("w8a8s"):
            # static dec modes: pruned fp16 kernel copies feed the SmoothQuant
            # refit at the one-time calibration (decoder activations are where
            # outlier channels live on trained transformers), then are freed
            from .models.quant import decoder_quant_targets, prune_fp_kernels

            fp_dec_kernels = prune_fp_kernels(
                params["language_model"], dec_quant,
                targets=decoder_quant_targets(dec_quant)) or None
        params["language_model"] = quantize_decoder_params(
            params["language_model"], mode=dec_quant)
    if scan_layers:
        params["language_model"] = W.stack_decoder_layers(params["language_model"])
        if fp_dec_kernels:
            fp_dec_kernels = W.stack_decoder_layers(fp_dec_kernels)
    params["vision_tower"] = W.convert_clip_vision(tower_sd) if is_clip else W.convert_siglip_vision(tower_sd)
    fp_tower_kernels = None
    if load_w8a8_tower:
        from .models.quant import prune_fp_kernels, quantize_tower_params

        # static modes keep pruned fp16 kernels until the one-time calibration
        # so the SmoothQuant outlier refit quantizes from fp, not from int8
        # codes (fill_act_scales fp_params — test_quant_outliers)
        fp_tower_kernels = prune_fp_kernels(
            params["vision_tower"], cfg.vision_config.quantization) or None
        params["vision_tower"] = quantize_tower_params(
            params["vision_tower"], mode=cfg.vision_config.quantization)
    if cfg.guide_enabled():
        params["guide_encoder"] = W.convert_clip_text(tower_sd) if is_clip else W.convert_siglip_text(tower_sd)
    if scan_towers:
        params["vision_tower"] = W.stack_encoder_layers(params["vision_tower"])
        if fp_tower_kernels:
            fp_tower_kernels = W.stack_encoder_layers(fp_tower_kernels)
        if cfg.guide_enabled():
            params["guide_encoder"] = W.stack_encoder_layers(params["guide_encoder"])
    if proj_sd:
        params["mm_projector"] = W.convert_projector_state(proj_sd, spec.kind)
        use_cs = [s for s in (cfg.use_clip_scale or "").split(",") if s]
        if use_cs and "logit_scale" in tower_sd:
            for side in ("local", "global"):
                if side in use_cs and f"{side}_logit_scale" not in params["mm_projector"]:
                    params["mm_projector"][f"{side}_logit_scale"] = tower_sd["logit_scale"].reshape(())
                    params["mm_projector"][f"{side}_logit_bias"] = tower_sd["logit_bias"].reshape(())
    if "model.image_newline" in llm_sd:
        params["image_newline"] = llm_sd["model.image_newline"]

    jdtype = jnp.dtype(dtype)
    params = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x, dtype=jdtype if np.issubdtype(x.dtype, np.floating) else None)), params)

    model = HIComModel(config=cfg)
    guide_tok = None
    if cfg.guide_enabled():
        try:
            from transformers import AutoTokenizer

            guide_tok = AutoTokenizer.from_pretrained(cfg.mm_vision_tower)
        except Exception:
            guide_tok = None  # sentencepiece unavailable: caller passes guide ids

    eos = raw_cfg.get("eos_token_id", cfg.text_config.eos_token_id)
    if isinstance(eos, list):
        eos = eos[0]
    hicom = HICom(config=cfg, model=model, params=params, guide_tokenizer=guide_tok,
                  eos_token_id=eos, cache_len=cache_len)
    hicom._fp_tower_kernels = fp_tower_kernels  # host fp16; freed at calibration
    hicom._fp_dec_kernels = fp_dec_kernels
    return hicom


def model_init(model_path: str, model_base: Optional[str] = None,
               device_preprocess: Optional[bool] = None, **kwargs):
    """Reference-compatible entry: returns (model, processor dict, tokenizer).

    ``device_preprocess`` (default: env HICOM_DEVICE_PREPROCESS, else off)
    swaps the VIDEO processor for the on-chip pad+resize+normalize
    (ops/preprocess.py): the host only decodes, uploading raw uint8 frames —
    the fix for the 1-core host's ~300ms/video scalar resize (the reference
    hides the same cost in 8 DataLoader workers,
    inference_video_mcqa_videomme.py:325-326). Only applies when
    image_aspect_ratio == "pad" (the release configs); images keep the host
    path (anyres grids need host-side PIL geometry)."""
    from transformers import AutoTokenizer

    model = load_model(model_path, model_base=model_base, **kwargs)
    tok_path = model_path if os.path.exists(os.path.join(model_path, "tokenizer_config.json")) else model_base
    tokenizer = AutoTokenizer.from_pretrained(tok_path)
    if tokenizer.pad_token is None and tokenizer.unk_token is not None:
        tokenizer.pad_token = tokenizer.unk_token

    cfg = model.config
    image_processor = SiglipImagePreprocessor(
        size=(cfg.vision_config.image_size, cfg.vision_config.image_size)
    )
    if device_preprocess is None:
        device_preprocess = os.environ.get("HICOM_DEVICE_PREPROCESS", "") == "1"
    video_processor = image_processor
    if device_preprocess and cfg.image_aspect_ratio == "pad":
        from .ops.preprocess import DeviceSiglipPreprocessor

        video_processor = DeviceSiglipPreprocessor(
            size=(cfg.vision_config.image_size, cfg.vision_config.image_size))
    processor = {
        "image": partial(
            process_image,
            processor=image_processor,
            aspect_ratio=cfg.image_aspect_ratio,
            image_grid_pinpoints=cfg.image_grid_pinpoints,
            image_crop_resolution=None,
            image_split_resolution=None,
        ),
        "video": partial(
            process_video,
            processor=video_processor,
            aspect_ratio=cfg.image_aspect_ratio,
            num_frames=cfg.num_frames,
        ),
    }
    return model, processor, tokenizer


def _pad_to_bucket(ids, pad_id: int, bucket: int = 64):
    """Right-pad id rows to a shared bucketed length → (ids, mask).

    Accepts a 2-D array (already equal-length rows) or a list of ragged 1-D
    rows (the batched path) — one padding rule for both entry points.
    """
    if isinstance(ids, np.ndarray):
        rows = list(ids)
    else:
        rows = [np.asarray(r) for r in ids]
    L = max(len(r) for r in rows)
    target = max(bucket, ((L + bucket - 1) // bucket) * bucket)
    out = np.full((len(rows), target), pad_id, dtype=np.int64)
    mask = np.zeros((len(rows), target), dtype=bool)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
        mask[i, : len(r)] = True
    return out, mask


def _trim_at_keywords(text: str, keywords) -> str:
    """Cut ``text`` at the earliest occurrence of any stop keyword — the
    post-decode counterpart of ``KeywordsStoppingCriteria``'s string
    containment check (reference mm_utils.py:705-708)."""
    for kw in keywords:
        if kw and kw in text:
            text = text.split(kw)[0]
    return text.strip()


def mm_infer_batch(
    tensors,
    instructs,
    model: HICom,
    tokenizer,
    modal: str = "video",
    guide_instructs=None,
    **kwargs,
) -> list:
    """Batched multimodal generation: N same-shape videos/images in one
    compiled prefill+decode (right-padded prompts, cache validity bitmap).
    The reference evaluates at batch 1 per GPU; this is the TPU-native
    throughput path for MCQA eval."""
    assert modal in ("image", "video")
    modal_token = DEFAULT_IMAGE_TOKEN if modal == "image" else DEFAULT_VIDEO_TOKEN
    frames = np.stack([np.asarray(t) for t in tensors])  # (b, t, 3, H, W)

    ids_list = []
    for instruct in instructs:
        message = [{"role": "user", "content": modal_token + "\n" + instruct}]
        prompt = tokenizer.apply_chat_template(message, tokenize=False, add_generation_prompt=True)
        ids_list.append(np.asarray(tokenizer_multimodal_token(prompt, tokenizer, modal_token, return_tensors="np")))
    pad_id = tokenizer.pad_token_id if tokenizer.pad_token_id is not None else 0
    ids, mask = _pad_to_bucket(ids_list, pad_id)

    guide_ids = kwargs.pop("guide_ids", None)
    guide_mask = kwargs.pop("guide_mask", None)
    if model.config.guide_enabled() and guide_ids is None:
        assert guide_instructs is not None and model.guide_tokenizer is not None, \
            "guide-enabled model needs guide_instructs (or precomputed guide_ids)"
        enc = model.guide_tokenizer(list(guide_instructs), padding="max_length", truncation=True,
                                    max_length=model.config.guide_text_config.max_position_embeddings,
                                    return_tensors="np")
        guide_ids = enc["input_ids"]
        guide_mask = enc.get("attention_mask")

    from .models.generate import keyword_token_sequences

    stop_strings = list(kwargs.get("stop_strings", ()))
    out = model.generate(
        ids, frames=frames, guide_ids=guide_ids, guide_mask=guide_mask,
        attention_mask=mask, modal=modal,
        max_new_tokens=kwargs.get("max_new_tokens", 64),
        do_sample=kwargs.get("do_sample", False),
        temperature=kwargs.get("temperature", 0.2),
        top_p=kwargs.get("top_p", 0.9),
        stop_sequences=keyword_token_sequences(stop_strings, tokenizer),
    )
    texts = tokenizer.batch_decode(out, skip_special_tokens=True)
    eos_str = tokenizer.decode([model.eos_token_id], skip_special_tokens=False)
    return [_trim_at_keywords(t, [eos_str] + stop_strings) for t in texts]


def mm_infer(
    image_or_video,
    instruct,
    model: HICom,
    tokenizer,
    modal: str = "video",
    image_size=None,
    **kwargs,
) -> str:
    """Single-sample multimodal generation → response string
    (reference ``hicom/__init__.py:40-124``)."""
    import copy as _copy

    if modal == "image":
        modal_token = DEFAULT_IMAGE_TOKEN
    elif modal == "video":
        modal_token = DEFAULT_VIDEO_TOKEN
    elif modal == "text":
        modal_token = ""
    else:
        raise ValueError(f"unsupported modal: {modal}")

    frames = None
    if modal != "text":
        frames = np.asarray(image_or_video)
        if frames.ndim == 3:
            frames = frames[None]
        frames = frames[None]  # (1, t, 3, H, W)

    if isinstance(instruct, str):
        message = [{"role": "user", "content": modal_token + "\n" + instruct}]
    elif isinstance(instruct, list):
        message = _copy.deepcopy(instruct)
        message[0]["content"] = modal_token + "\n" + message[0]["content"]
    else:
        raise ValueError(f"unsupported instruct type: {type(instruct)}")

    prompt = tokenizer.apply_chat_template(message, tokenize=False, add_generation_prompt=True)
    ids = np.asarray(tokenizer_multimodal_token(prompt, tokenizer, modal_token, return_tensors="np"))[None]
    pad_id = tokenizer.pad_token_id if tokenizer.pad_token_id is not None else 0
    ids, mask = _pad_to_bucket(ids, pad_id)

    guide_ids = guide_mask = None
    if model.config.guide_enabled() and frames is not None:
        if "guide_ids" in kwargs:
            guide_ids = np.asarray(kwargs["guide_ids"])
            guide_mask = kwargs.get("guide_mask")
        else:
            guide_instruct = kwargs["guide_instruct"]
            assert model.guide_tokenizer is not None, "guide tokenizer unavailable; pass guide_ids"
            enc = model.guide_tokenizer(guide_instruct, padding="max_length", truncation=True,
                                        max_length=model.config.guide_text_config.max_position_embeddings,
                                        return_tensors="np")
            guide_ids = enc["input_ids"]
            guide_mask = enc.get("attention_mask")

    visual_embeds = None
    if modal == "video" and frames is not None and model.config.projector.kind == "hicom":
        # sequence-parallel encode for long videos: shard t over the devices
        # when it divides evenly (HICOM_SEQ_PARALLEL=0 off / 1 force / auto:
        # only beyond the reference's 32-frame cap on a multi-chip mesh).
        import jax as _jax

        sp = os.environ.get("HICOM_SEQ_PARALLEL", "auto")
        n_dev = len(_jax.devices())
        t = frames.shape[1]
        spec = model.config.projector
        kt = spec.local.temporal_kernel_size if spec.local is not None else 1
        eligible = n_dev > 1 and t % (n_dev * kt) == 0
        if sp != "0" and eligible and (sp == "1" or t > 32):
            visual_embeds = model.encode_long_video(frames[0], guide_ids, guide_mask)[None]
            frames = None

    if (
        modal == "image"
        and frames is not None
        and frames.shape[1] > 1
        and "anyres" in (model.config.image_aspect_ratio or "")
    ):
        # multi-crop anyres image: merge features per the patch-merge config,
        # then generate from precomputed visual tokens (shape depends on the
        # original image size — jitted per shape).
        visual_embeds = model.encode_anyres(frames[0], image_size, guide_ids, guide_mask)[None]
        frames = None

    from .models.generate import keyword_token_sequences

    stop_strings = list(kwargs.get("stop_strings", ()))
    out = model.generate(
        ids,
        frames=frames,
        guide_ids=guide_ids,
        guide_mask=guide_mask,
        attention_mask=mask,
        visual_embeds=visual_embeds,
        modal=modal,
        max_new_tokens=kwargs.get("max_new_tokens", 2048),
        do_sample=kwargs.get("do_sample", False),
        temperature=kwargs.get("temperature", 0.2),
        top_p=kwargs.get("top_p", 0.9),
        stop_sequences=keyword_token_sequences(stop_strings, tokenizer),
    )
    text = tokenizer.batch_decode(out, skip_special_tokens=True)[0].strip()
    # KeywordsStoppingCriteria parity: trim at eos / stop keywords that
    # survive decode (the reference's decoded-string containment check,
    # mm_utils.py:705-708, applied post-hoc)
    eos_str = tokenizer.decode([model.eos_token_id], skip_special_tokens=False)
    return _trim_at_keywords(text, [eos_str] + stop_strings)


def mm_serve(
    samples,
    model: HICom,
    tokenizer,
    modal: str = "video",
    n_slots: int = 4,
    cache_len: Optional[int] = None,
    sync_steps: int = 16,
    prompt_buckets=(64, 128, 256, 512),
    **kwargs,
) -> list:
    """Continuous-batching generation over mixed requests → response strings
    in submission order.

    The serving analogue of calling ``mm_infer`` per sample (reference
    ``hicom/__init__.py:40-124``, one HF ``generate`` at a time): requests
    stream through ``n_slots`` resident sequences of one ServeEngine, so the
    decode weight stream is amortized across every active request and a
    finished slot is immediately refilled from the queue (``serve.py``).

    ``samples``: list of dicts with keys ``instruct`` (str), and optionally
    ``tensor`` (preprocessed (t,3,H,W) pixels; None/absent = text-only),
    ``modal``, ``guide_instruct`` / ``guide_ids``, ``max_new_tokens``.
    Shared generation kwargs: ``max_new_tokens``, ``do_sample``,
    ``temperature``, ``top_p``, ``stop_strings``.
    """
    from .models.generate import keyword_token_sequences
    from .serve import GenRequest, ServeEngine

    stop_strings = list(kwargs.get("stop_strings", ()))
    stop_seqs = keyword_token_sequences(stop_strings, tokenizer)
    do_sample = kwargs.get("do_sample", False)
    gcfg = model.config.guide_text_config
    guide_len = gcfg.max_position_embeddings if gcfg is not None else 32
    engine = ServeEngine(
        model.model, {"params": model.params},
        n_slots=n_slots, cache_len=cache_len or model.cache_len,
        prompt_buckets=tuple(prompt_buckets), guide_len=guide_len,
        sync_steps=sync_steps,
        temperature=(kwargs.get("temperature", 0.2) if do_sample else 0.0),
        top_p=kwargs.get("top_p", 0.9),
        eos_token_id=model.eos_token_id,
        pad_token_id=tokenizer.pad_token_id if tokenizer.pad_token_id is not None else 0,
        # speculative serving (greedy only): kwarg wins, env is the default
        spec_k=(0 if do_sample else int(
            kwargs.get("spec_k", os.environ.get("HICOM_SPEC_DECODE", "0")))),
    )

    order = []
    for s in samples:
        s_modal = s.get("modal", modal)
        tensor = s.get("tensor")
        if s_modal == "text" or tensor is None:
            s_modal, modal_token, frames = "text", "", None
        else:
            modal_token = DEFAULT_IMAGE_TOKEN if s_modal == "image" else DEFAULT_VIDEO_TOKEN
            frames = np.asarray(tensor)
            if frames.ndim == 3:
                frames = frames[None]
        message = [{"role": "user", "content": (modal_token + "\n" if modal_token else "") + s["instruct"]}]
        prompt = tokenizer.apply_chat_template(message, tokenize=False, add_generation_prompt=True)
        ids = np.asarray(tokenizer_multimodal_token(
            prompt, tokenizer, modal_token, return_tensors="np"), np.int32)

        guide_ids = guide_mask = None
        if model.config.guide_enabled() and frames is not None:
            if "guide_ids" in s:
                guide_ids = np.asarray(s["guide_ids"]).reshape(-1)
            else:
                assert model.guide_tokenizer is not None, "guide tokenizer unavailable; pass guide_ids"
                enc = model.guide_tokenizer(s["guide_instruct"], padding="max_length", truncation=True,
                                            max_length=guide_len, return_tensors="np")
                guide_ids = enc["input_ids"][0]
                am = enc.get("attention_mask")
                guide_mask = am[0].astype(bool) if am is not None else None
        order.append(engine.submit(GenRequest(
            input_ids=ids, frames=frames, guide_ids=guide_ids, guide_mask=guide_mask,
            modal=s_modal, max_new_tokens=s.get("max_new_tokens", kwargs.get("max_new_tokens", 128)),
            stop_sequences=stop_seqs)))
    results = engine.run()
    eos_str = tokenizer.decode([model.eos_token_id], skip_special_tokens=False)
    out = []
    for rid in order:
        text = tokenizer.decode(results[rid].tokens, skip_special_tokens=True).strip()
        out.append(_trim_at_keywords(text, [eos_str] + stop_strings))
    return out
