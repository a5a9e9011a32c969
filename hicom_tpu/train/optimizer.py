"""Optimizer construction: per-module learning rates + tunable-parts freezing.

Mirrors the reference's 3-tier optimizer (``hicom_trainer.py:241-345``) and
``mm_tunable_parts`` freeze matrix (``train.py:702-738``) as optax transforms:

* label each param by path: ``guide`` (projector guide_injector), ``projector``
  (rest of mm_projector), ``vision`` (vision_tower + guide_encoder — in the
  reference the guide encoder lives under ``vision_tower.*`` and inherits
  ``vision_tower_lr``), ``base`` (everything else); frozen params get
  ``optax.set_to_zero``.
* per-group AdamW with HF's decay rule (no decay on params whose name
  contains "bias", nor *Norm scales).
* gradient clipping by the GLOBAL norm over all trainable groups (the
  reference's accelerator.clip_grad_norm_), applied before the per-group
  updates — not per group.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax

from ..parallel.sharding import path_str as _path_str


def tree_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    return [(_path_str(p), v) for p, v in flat], treedef


def is_tunable(path: str, tunable_parts: str, use_guide: Optional[str] = None) -> bool:
    """Reference freeze matrix (``train.py:702-738``)."""
    parts = [p.strip() for p in (tunable_parts or "").split(",") if p.strip()]
    guide_on = use_guide not in (None, "off")
    in_projector = "mm_projector" in path
    in_tower = "vision_tower" in path
    is_scale = ("logit_scale" in path) or ("logit_bias" in path)

    if "mm_projector" in parts and in_projector and not is_scale:
        return True
    if "pure_vision_model" in parts and in_tower and "head" not in path:
        return True
    if guide_on:
        if "vision_model_head" in parts and in_tower and "head" in path:
            return True
        if "guide_encoder" in parts and "guide_encoder" in path:
            return True
        if "attn_scale" in parts and in_projector and is_scale:
            return True
    if "language_model" in parts and not in_tower and not in_projector and "guide_encoder" not in path:
        return True
    return False


def lr_group(path: str) -> str:
    """Reference LR grouping (``hicom_trainer.py:260-268``): keyword match on
    torch param names, where the guide encoder is nested under vision_tower."""
    if "mm_projector" in path and "guide_injector" in path:
        return "guide"
    if "mm_projector" in path:
        return "projector"
    if "vision_tower" in path or "guide_encoder" in path:
        return "vision"
    return "base"


def decay_mask(params: Any) -> Any:
    """HF rule (hicom_trainer.py decay_parameters): decay everything except
    params whose NAME contains "bias" (covers logit_bias scalars) and *Norm
    scales."""

    def one(path_entries, _leaf):
        path = _path_str(path_entries)
        leaf = path.rsplit("/", 1)[-1]
        return "bias" not in leaf and leaf != "scale"

    return jax.tree_util.tree_map_with_path(one, params)


def make_schedule(lr: float, total_steps: int, warmup_ratio: float = 0.03, kind: str = "cosine"):
    warmup = int(total_steps * warmup_ratio)
    if kind == "constant":
        if warmup == 0:
            return optax.constant_schedule(lr)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup), optax.constant_schedule(lr)], [warmup]
        )
    return optax.warmup_cosine_decay_schedule(0.0, lr, warmup, max(total_steps, warmup + 1), end_value=0.0)


def build_optimizer(
    params: Any,
    *,
    learning_rate: float,
    total_steps: int = 1000,
    warmup_ratio: float = 0.03,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    mm_projector_lr: Optional[float] = None,
    vision_tower_lr: Optional[float] = None,
    guide_injector_lr: Optional[float] = None,
    tunable_parts: str = "mm_projector,language_model",
    use_guide: Optional[str] = None,
    schedule_kind: str = "cosine",
) -> optax.GradientTransformation:
    # reference fallback: guide lr set → projector lr defaults to base lr
    if guide_injector_lr is not None and mm_projector_lr is None:
        mm_projector_lr = learning_rate
    group_lrs = {
        "base": learning_rate,
        "projector": mm_projector_lr if mm_projector_lr is not None else learning_rate,
        "guide": guide_injector_lr
        if guide_injector_lr is not None
        else (mm_projector_lr if mm_projector_lr is not None else learning_rate),
        "vision": vision_tower_lr if vision_tower_lr is not None else learning_rate,
    }

    def label(path_entries, _leaf):
        path = _path_str(path_entries)
        if not is_tunable(path, tunable_parts, use_guide):
            return "frozen"
        return lr_group(path)

    labels = jax.tree_util.tree_map_with_path(label, params)

    def zero_frozen(grads):
        """Zero frozen grads BEFORE the global-norm clip so frozen params
        neither move nor inflate the clip norm."""
        return jax.tree_util.tree_map_with_path(
            lambda p, g: g * 0 if label(p, None) == "frozen" else g, grads
        )

    def adamw(lr):
        # mask passed as a callable: multi_transform hands each sub-transform a
        # masked tree, and the path-based rule works on any leaf type.
        return optax.adamw(
            make_schedule(lr, total_steps, warmup_ratio, schedule_kind),
            b1=b1, b2=b2, eps=eps, weight_decay=weight_decay, mask=decay_mask,
        )

    transforms = {g: adamw(lr) for g, lr in group_lrs.items()}
    transforms["frozen"] = optax.set_to_zero()
    tx = optax.multi_transform(transforms, labels)
    if max_grad_norm:
        # ONE norm over all trainable grads (reference clip_grad_norm_), not
        # a per-group clip
        return optax.chain(
            optax.stateless(lambda g, _p=None: zero_frozen(g)),
            optax.clip_by_global_norm(max_grad_norm),
            tx,
        )
    return tx


def trainable_param_count(params: Any, tunable_parts: str, use_guide: Optional[str] = None) -> int:
    flat, _ = tree_paths(params)
    return sum(int(v.size) for p, v in flat if is_tunable(p, tunable_parts, use_guide))
