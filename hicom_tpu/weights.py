"""Checkpoint import: torch/HF state dicts → flax parameter pytrees.

Handles the reference's four checkpoint layouts
(``/root/reference/hicom/model/__init__.py:42-193``): full SFT checkpoints
(safetensors shards), base-LLM + ``mm_projector.bin`` pretrain artifacts, and
the SigLIP / CLIP / Qwen2 tower weights. Conversion is name-driven: our flax
module paths mirror the torch module tree, so mapping is mechanical
(Linear weight transposed to a Dense kernel; LayerNorm weight→scale).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable, Dict, Iterable, Mapping, Optional

import numpy as np


# --------------------------------------------------------------------------- #
# Low-level loading
# --------------------------------------------------------------------------- #


def load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .bin/.pt state dict to numpy (CPU, no grad)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.to(torch.float32).numpy() if v.dtype.is_floating_point else v.numpy() for k, v in sd.items()}


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    try:
        return load_file(path)
    except (TypeError, ValueError, NotImplementedError):
        # bf16 tensors can't round-trip through the numpy loader; use torch.
        # (IO errors — missing/corrupt file — propagate with the real cause.)
        from safetensors.torch import load_file as load_torch

        import torch

        sd = load_torch(path)
        return {k: v.to(torch.float32).numpy() for k, v in sd.items()}


def load_hf_state_dict(model_path: str) -> Dict[str, np.ndarray]:
    """Load all weights of an HF checkpoint directory (sharded or single)."""
    index_path = os.path.join(model_path, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        shards = sorted(set(index["weight_map"].values()))
        out: Dict[str, np.ndarray] = {}
        for shard in shards:
            out.update(load_safetensors(os.path.join(model_path, shard)))
        return out
    single = os.path.join(model_path, "model.safetensors")
    if os.path.exists(single):
        return load_safetensors(single)
    bin_index = os.path.join(model_path, "pytorch_model.bin.index.json")
    if os.path.exists(bin_index):
        with open(bin_index) as f:
            index = json.load(f)
        out = {}
        for shard in sorted(set(index["weight_map"].values())):
            out.update(load_torch_bin(os.path.join(model_path, shard)))
        return out
    single_bin = os.path.join(model_path, "pytorch_model.bin")
    if os.path.exists(single_bin):
        return load_torch_bin(single_bin)
    raise FileNotFoundError(f"no weights found under {model_path}")


# --------------------------------------------------------------------------- #
# Generic torch-module-tree → flax-params conversion
# --------------------------------------------------------------------------- #


def _set_path(tree: dict, path: Iterable[str], value) -> None:
    keys = list(path)
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def torch_to_flax_params(
    state_dict: Mapping[str, np.ndarray],
    rename: Optional[Callable[[str], Optional[str]]] = None,
) -> dict:
    """Convert a torch state dict into a nested flax params dict.

    Rules: ``*.weight`` 2-D → ``kernel`` (transposed), 1-D → ``scale``;
    ``*.bias`` → ``bias``; everything else keeps its leaf name. ``rename``
    may rewrite a full torch key first (return None to drop the entry).
    """
    params: dict = {}
    for key, value in state_dict.items():
        if rename is not None:
            key = rename(key)
            if key is None:
                continue
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "weight":
            if value.ndim == 2:
                _set_path(params, parts[:-1] + ["kernel"], np.ascontiguousarray(value.T))
            elif value.ndim == 4:
                # conv2d OIHW -> flax HWIO
                _set_path(params, parts[:-1] + ["kernel"], np.ascontiguousarray(value.transpose(2, 3, 1, 0)))
            elif value.ndim == 1:
                _set_path(params, parts[:-1] + ["scale"], value)
            else:
                _set_path(params, parts[:-1] + ["weight"], value)
        elif leaf == "bias":
            _set_path(params, parts[:-1] + ["bias"], value)
        else:
            _set_path(params, parts, value)
    return params


def merge_params(template: Any, loaded: Any, path: str = "", strict: bool = False) -> Any:
    """Overlay ``loaded`` onto ``template``, keeping only keys the template has
    (e.g. a guide-off model ignores the tower's pooling-head weights).

    strict=True raises if a template leaf has no loaded counterpart.
    """
    if isinstance(template, dict):
        out = {}
        for k, v in template.items():
            if isinstance(loaded, dict) and k in loaded:
                out[k] = merge_params(v, loaded[k], f"{path}/{k}", strict)
            elif strict:
                raise KeyError(f"missing weight for {path}/{k}")
            else:
                out[k] = v
        return out
    if hasattr(loaded, "shape") and tuple(loaded.shape) != tuple(template.shape):
        raise ValueError(f"shape mismatch at {path}: ckpt {loaded.shape} vs model {template.shape}")
    return loaded


def assert_tree_match(expected: Any, got: Any, path: str = "") -> None:
    """Assert two param trees have identical structure and leaf shapes."""
    import jax

    exp_flat = jax.tree_util.tree_flatten_with_path(expected)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(got)[0]
    exp_keys = {jax.tree_util.keystr(k): v.shape for k, v in exp_flat}
    got_keys = {jax.tree_util.keystr(k): v.shape for k, v in got_flat}
    missing = sorted(set(exp_keys) - set(got_keys))
    extra = sorted(set(got_keys) - set(exp_keys))
    if missing or extra:
        raise ValueError(f"param tree mismatch{path}: missing={missing[:10]} extra={extra[:10]}")
    for k in exp_keys:
        if exp_keys[k] != got_keys[k]:
            raise ValueError(f"shape mismatch at {k}: expected {exp_keys[k]}, got {got_keys[k]}")


# --------------------------------------------------------------------------- #
# Encoder / decoder weight converters
# --------------------------------------------------------------------------- #


def convert_siglip_vision(state_dict: Mapping[str, np.ndarray]) -> dict:
    """HF SiglipVisionModel → flax SiglipVisionTower params.

    The pooling head's probe attention is unused (reference taps only its
    LN+MLP, encoder.py:284-285) and is dropped.
    """

    def rename(key: str) -> Optional[str]:
        if key.startswith("vision_model."):
            key = key[len("vision_model."):]
        elif key.startswith("vision_tower.vision_model."):  # SFT checkpoints
            key = key[len("vision_tower.vision_model."):]
        else:
            return None
        if key.startswith("head.attention") or key == "head.probe":
            return None
        key = key.replace("embeddings.patch_embedding", "patch_embedding")
        if key == "embeddings.position_embedding.weight":
            return "position_embedding"  # raw (num_pos, d), no transpose
        key = re.sub(r"encoder\.layers\.(\d+)\.", r"encoder.layers_\1.", key)
        key = key.replace("head.layernorm", "head_layernorm")
        key = key.replace("head.mlp", "head_mlp")
        return key

    return torch_to_flax_params(state_dict, rename)


def convert_siglip_text(state_dict: Mapping[str, np.ndarray]) -> dict:
    """HF SiglipTextModel → flax SiglipTextEncoder params."""

    def rename(key: str) -> Optional[str]:
        if key.startswith("text_model."):
            key = key[len("text_model."):]
        elif key.startswith("guide_encoder.text_model."):
            key = key[len("guide_encoder.text_model."):]
        else:
            return None
        if key == "embeddings.token_embedding.weight":
            return "token_embedding"
        if key == "embeddings.position_embedding.weight":
            return "position_embedding"
        key = re.sub(r"encoder\.layers\.(\d+)\.", r"encoder.layers_\1.", key)
        return key

    return torch_to_flax_params(state_dict, rename)


def convert_clip_vision(state_dict: Mapping[str, np.ndarray]) -> dict:
    """HF CLIPVisionModelWithProjection → flax ClipVisionTower params."""

    def rename(key: str) -> Optional[str]:
        if key.startswith("vision_tower."):  # SFT checkpoint nesting
            key = key[len("vision_tower."):]
        if key == "visual_projection.weight":
            return key
        if not key.startswith("vision_model."):
            return None
        key = key[len("vision_model."):]
        if key == "embeddings.class_embedding":
            return "class_embedding"
        if key == "embeddings.position_embedding.weight":
            return "position_embedding"
        key = key.replace("embeddings.patch_embedding", "patch_embedding")
        key = re.sub(r"encoder\.layers\.(\d+)\.self_attn\.", r"layers_\1.", key)
        key = re.sub(r"encoder\.layers\.(\d+)\.", r"layers_\1.", key)
        return key

    return torch_to_flax_params(state_dict, rename)


def convert_clip_text(state_dict: Mapping[str, np.ndarray]) -> dict:
    """HF CLIPTextModelWithProjection → flax ClipTextEncoder params."""

    def rename(key: str) -> Optional[str]:
        if key.startswith("guide_encoder."):
            key = key[len("guide_encoder."):]
        if key == "text_projection.weight":
            return key
        if not key.startswith("text_model."):
            return None
        key = key[len("text_model."):]
        if key == "embeddings.token_embedding.weight":
            return "token_embedding"
        if key == "embeddings.position_embedding.weight":
            return "position_embedding"
        key = re.sub(r"encoder\.layers\.(\d+)\.self_attn\.", r"layers_\1.", key)
        key = re.sub(r"encoder\.layers\.(\d+)\.", r"layers_\1.", key)
        return key

    return torch_to_flax_params(state_dict, rename)


def _stack_layer_dict(container: dict) -> dict:
    """Stack layers_i.* children of ``container`` into the nn.scan layout
    (layers.layer.* with a leading layer axis)."""
    import jax

    out = dict(container)
    layer_keys = sorted((k for k in out if re.fullmatch(r"layers_\d+", k)),
                        key=lambda k: int(k.split("_")[1]))
    layers = [out.pop(k) for k in layer_keys]
    stacked = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *layers)
    out["layers"] = {"layer": stacked}
    return out


def stack_decoder_layers(decoder_params: dict) -> dict:
    """Convert per-layer params (model.layers_i.*) to the nn.scan layout
    (model.layers.layer.* with a leading layer axis)."""
    out = dict(decoder_params)
    out["model"] = _stack_layer_dict(decoder_params["model"])
    return out


def stack_encoder_layers(tower_params: dict) -> dict:
    """Same for SigLIP vision/text towers: encoder.layers_i.* →
    encoder.layers.layer.* (scan_layers tower option)."""
    out = dict(tower_params)
    out["encoder"] = _stack_layer_dict(tower_params["encoder"])
    return out


def unstack_encoder_layers(tower_params: dict) -> dict:
    """Inverse of :func:`stack_encoder_layers` (HF export)."""
    import jax

    enc = dict(tower_params["encoder"])
    stacked = enc.pop("layers")["layer"]
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(n):
        enc[f"layers_{i}"] = jax.tree.map(lambda x: np.asarray(x)[i], stacked)
    out = dict(tower_params)
    out["encoder"] = enc
    return out


def unstack_decoder_layers(decoder_params: dict) -> dict:
    """Inverse of :func:`stack_decoder_layers` (for HF export)."""
    import jax

    model = dict(decoder_params["model"])
    stacked = model.pop("layers")["layer"]
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(n):
        model[f"layers_{i}"] = jax.tree.map(lambda x: np.asarray(x)[i], stacked)
    out = dict(decoder_params)
    out["model"] = model
    return out


def convert_decoder(state_dict: Mapping[str, np.ndarray], tie_word_embeddings: bool = False) -> dict:
    """HF Qwen2/Llama ForCausalLM → flax Qwen2ForCausalLM params.

    Multimodal keys (``model.mm_projector.*``, ``model.vision_tower.*``,
    ``model.image_newline``) are dropped here; dedicated converters handle them.
    """

    def rename(key: str) -> Optional[str]:
        if key.startswith("model.mm_projector") or key.startswith("model.vision_tower"):
            return None
        if key == "model.image_newline":
            return None
        if key == "model.embed_tokens.weight":
            return "model.embed_tokens.embedding"
        if key == "lm_head.weight":
            return None if tie_word_embeddings else "lm_head.weight"
        key = re.sub(r"model\.layers\.(\d+)\.", r"model.layers_\1.", key)
        return key

    return torch_to_flax_params(state_dict, rename)


# --------------------------------------------------------------------------- #
# Reverse conversion: flax params → reference-format HF checkpoint
# --------------------------------------------------------------------------- #


def flax_to_torch_state(tree: Any, prefix: str = "") -> Dict[str, "np.ndarray"]:
    """Flatten a flax subtree into torch-style keys: kernel→weight (transposed;
    conv HWIO→OIHW), scale→weight, bias→bias; ``embedding`` leaves stay raw
    under ``<name>.weight``."""
    import jax

    out: Dict[str, np.ndarray] = {}
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = []
        for p in key_path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "name"):
                parts.append(str(p.name))
            else:
                parts.append(str(p))
        leaf_name = parts[-1]
        name = ".".join(parts[:-1])
        arr = np.asarray(leaf)
        if leaf_name == "kernel":
            if arr.ndim == 4:
                out[f"{prefix}{name}.weight"] = np.ascontiguousarray(arr.transpose(3, 2, 0, 1))
            else:
                out[f"{prefix}{name}.weight"] = np.ascontiguousarray(arr.T)
        elif leaf_name == "scale":
            out[f"{prefix}{name}.weight"] = arr
        elif leaf_name == "bias":
            out[f"{prefix}{name}.bias"] = arr
        elif leaf_name == "embedding":
            # nn.Embed param → torch Embedding.weight (no transpose)
            out[f"{prefix}{name}.weight"] = arr
        else:
            full = f"{prefix}{name}.{leaf_name}" if name else f"{prefix}{leaf_name}"
            out[full] = arr
    return out


def export_hf_checkpoint(params: Dict[str, Any], config, output_dir: str, dtype: str = "float16") -> None:
    """Write a reference-layout SFT checkpoint (config.json + model.safetensors)
    consumable by both this framework and the reference's ``load_pretrained_model``
    (equivalent of ``safe_save_model_for_hf_trainer``, hicom_trainer.py:91-126)."""
    import os

    from safetensors.numpy import save_file

    os.makedirs(output_dir, exist_ok=True)
    sd: Dict[str, np.ndarray] = {}

    lm = params["language_model"]
    model_sub = lm.get("model", {}) if isinstance(lm, dict) else {}
    if isinstance(model_sub, dict) and isinstance(model_sub.get("layers"), dict) \
            and "layer" in model_sub["layers"]:
        # nn.scan stacked layout → per-layer keys the reference can read
        lm = unstack_decoder_layers(dict(lm))

    def fix_decoder_keys(d):
        out = {}
        for k, v in d.items():
            k = re.sub(r"model\.layers_(\d+)\.", r"model.layers.\1.", k)
            out[k] = v
        return out

    sd.update(fix_decoder_keys(flax_to_torch_state(lm)))

    def fix_tower_keys(d, is_text):
        exact = {
            "token_embedding": "embeddings.token_embedding.weight",
            "position_embedding": "embeddings.position_embedding.weight",
            "class_embedding": "embeddings.class_embedding",
        }
        out = {}
        for k, v in d.items():
            k = exact.get(k, k)
            k = re.sub(r"encoder\.layers_(\d+)\.", r"encoder.layers.\1.", k)
            if k.startswith("patch_embedding."):
                k = "embeddings." + k
            k = k.replace("head_layernorm.", "head.layernorm.")
            k = k.replace("head_mlp.", "head.mlp.")
            root = "text_model" if is_text else "vision_model"
            host = "guide_encoder" if is_text else "vision_tower"
            out[f"model.vision_tower.{host}.{root}.{k}"] = v
        return out

    def fix_clip_tower_keys(d, is_text):
        """Inverse of convert_clip_vision/convert_clip_text naming."""
        attn = ("q_proj.", "k_proj.", "v_proj.", "out_proj.")
        out = {}
        for k, v in d.items():
            if k in ("visual_projection.weight", "text_projection.weight"):
                host = "guide_encoder" if is_text else "vision_tower"
                out[f"model.vision_tower.{host}.{k}"] = v
                continue
            if k == "class_embedding":
                k = "embeddings.class_embedding"
            elif k in ("position_embedding", "token_embedding"):
                k = f"embeddings.{k}.weight"
            elif k.startswith("patch_embedding."):
                k = "embeddings." + k
            m = re.match(r"layers_(\d+)\.(.+)", k)
            if m:
                rest = m.group(2)
                mid = "self_attn." if rest.startswith(attn) else ""
                k = f"encoder.layers.{m.group(1)}.{mid}{rest}"
            root = "text_model" if is_text else "vision_model"
            host = "guide_encoder" if is_text else "vision_tower"
            out[f"model.vision_tower.{host}.{root}.{k}"] = v
        return out

    is_clip = "clip" in (config.mm_vision_tower or "") and "siglip" not in (config.mm_vision_tower or "")
    tower_fix = fix_clip_tower_keys if is_clip else fix_tower_keys
    if "vision_tower" in params:
        sd.update(tower_fix(flax_to_torch_state(params["vision_tower"]), is_text=False))
    if "guide_encoder" in params:
        sd.update(tower_fix(flax_to_torch_state(params["guide_encoder"]), is_text=True))
    if "mm_projector" in params:
        sd.update({f"model.{k}": v for k, v in flax_to_torch_state(params["mm_projector"], "mm_projector.").items()})
    if "image_newline" in params:
        sd["model.image_newline"] = np.asarray(params["image_newline"])

    np_dtype = np.float16 if dtype == "float16" else np.float32
    sd = {k: (v.astype(np_dtype) if np.issubdtype(v.dtype, np.floating) else v) for k, v in sd.items()}
    save_file(sd, os.path.join(output_dir, "model.safetensors"))

    import json as _json

    with open(os.path.join(output_dir, "config.json"), "w") as f:
        _json.dump(config.to_hf_dict(), f, indent=2)


# --------------------------------------------------------------------------- #
# Projector weights (mm_projector.bin or prefixed SFT keys)
# --------------------------------------------------------------------------- #


def convert_projector_state(state_dict: Mapping[str, np.ndarray], projector_kind: str = "hicom") -> dict:
    """Convert projector weights. Accepts keys with or without the
    ``model.mm_projector.`` / ``mm_projector.`` prefix."""

    def rename(key: str) -> Optional[str]:
        for prefix in ("model.mm_projector.", "mm_projector."):
            if key.startswith(prefix):
                key = key[len(prefix):]
                break
        else:
            if "mm_projector" in key:  # defensive: unexpected nesting
                key = key.split("mm_projector.")[-1]
            else:
                return None
        if projector_kind in ("mlp", "linear") and re.match(r"^\d+\.", key):
            key = "layers." + key  # Sequential lives under MeanPoolProjector."layers"
        return key

    filtered = {k: v for k, v in state_dict.items() if "mm_projector" in k}
    if not filtered:  # already stripped keys (e.g. raw mm_projector.bin without prefix)
        filtered = dict(state_dict)

        def rename(key: str) -> Optional[str]:  # noqa: F811
            if projector_kind in ("mlp", "linear") and re.match(r"^\d+\.", key):
                return "layers." + key
            return key

    return torch_to_flax_params(filtered, rename)
