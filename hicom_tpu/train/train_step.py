"""Sharded training step: loss, gradients, optimizer update under one jit.

Replaces the reference's HF Trainer + DeepSpeed engine: the (dp, fsdp, tp)
mesh shards batch and params; XLA inserts gradient reductions and ZeRO-style
parameter gathers from the sharding annotations (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..constants import IGNORE_INDEX
from ..parallel.sharding import batch_sharding, param_shardings


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def causal_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Next-token cross entropy; positions labeled IGNORE_INDEX are masked.

    Returns (mean_loss, num_target_tokens).
    """
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    ll = optax.softmax_cross_entropy_with_integer_labels(shift_logits, safe_labels)
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, ll, 0.0)) / n, n


def make_loss_fn(model, modal: str = "video", has_frames: bool = True, multi_image: bool = False,
                 anyres_plan=None, tunable_parts: Optional[str] = None,
                 use_guide: Optional[str] = None):
    """``tunable_parts`` (the reference's freeze matrix, optimizer.is_tunable):
    frozen leaves are wrapped in ``stop_gradient`` INSIDE the loss, so JAX
    prunes their entire backward at trace time — a frozen tower costs one
    forward, not fwd+bwd. (The reference gets this via requires_grad=False;
    without this, zeroing frozen grads after the fact still paid for the
    tower backward — ~2× the tower FLOPs, and the tower dominates.)"""
    freeze = None
    if tunable_parts is not None:
        from .optimizer import _path_str, is_tunable

        def freeze(params):
            return jax.tree_util.tree_map_with_path(
                lambda p, x: x if is_tunable(_path_str(p), tunable_parts, use_guide)
                else jax.lax.stop_gradient(x), params)

    def loss_fn(params, batch):
        if freeze is not None:
            params = freeze(params)
        logits, labels, _ = model.apply(
            {"params": params},
            batch["input_ids"],
            batch.get("frames") if has_frames else None,
            attention_mask=batch.get("attention_mask"),
            labels=batch["labels"],
            guide_ids=batch.get("guide_ids"),
            guide_mask=batch.get("guide_mask"),
            modal=modal,
            multi_image=multi_image,
            anyres_plan=anyres_plan,
        )
        loss, n = causal_lm_loss(logits, labels)
        return loss, {"loss": loss, "target_tokens": n}

    return loss_fn


def make_train_step(model, optimizer, modal: str = "video", has_frames: bool = True, multi_image: bool = False,
                    anyres_plan=None, tunable_parts: Optional[str] = None,
                    use_guide: Optional[str] = None,
                    offload_optimizer: bool = False):
    """``offload_optimizer``: the optimizer state enters/leaves this step in
    ``pinned_host`` memory (see create_sharded_state). XLA refuses to compute
    directly on host-space operands ("memory_space of all inputs ... must be
    the same" — observed on the real TPU backend), so the step must move the
    moments explicitly: host→device right before the update, device→host for
    the returned state. The moments are absent from HBM during the whole
    fwd+bwd — the phase that owns the activation peak; the update phase pays
    a transient device copy, so this helps exactly when activations (not the
    param+moment sum) are the binding peak."""
    loss_fn = make_loss_fn(model, modal, has_frames, multi_image, anyres_plan,
                           tunable_parts, use_guide)

    def train_step(state: TrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
        opt_in = state.opt_state
        if offload_optimizer:
            opt_in = jax.device_put(opt_in, jax.memory.Space.Device)
        updates, opt_state = optimizer.update(grads, opt_in, state.params)
        params = optax.apply_updates(state.params, updates)
        if offload_optimizer:
            opt_state = jax.device_put(opt_state, jax.memory.Space.Host)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def create_sharded_state(model, optimizer, mesh, init_batch, rng, modal="video",
                         offload_optimizer: bool = False):
    """Initialize TrainState with params/opt-state sharded per the mesh rules.

    Shapes are derived with eval_shape, shardings from the rules (opt-state
    moments inherit their param's sharding because their tree paths contain the
    param path), then init runs jitted straight into sharded buffers.

    ``offload_optimizer`` rests the optimizer state in ``pinned_host`` memory
    (ZeRO-offload analogue of the reference's ``scripts/zero3_offload.json``);
    XLA streams the moments host↔device around each update. Silently falls
    back on backends without memory-placement support (CPU tests).
    """

    def create(rng):
        variables = model.init(
            rng,
            init_batch["input_ids"],
            init_batch.get("frames"),
            labels=init_batch.get("labels"),
            guide_ids=init_batch.get("guide_ids"),
            guide_mask=init_batch.get("guide_mask"),
            modal=modal,
        )
        params = variables["params"]
        opt_state = optimizer.init(params)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    shapes = jax.eval_shape(create, rng)
    shardings = param_shardings(shapes, mesh)
    if offload_optimizer:
        from ..parallel.sharding import host_offload_shardings, supports_host_offload

        if supports_host_offload():
            shardings = TrainState(
                shardings.params,
                host_offload_shardings(shardings.opt_state),
                shardings.step,
            )
        else:
            import sys

            print("offload-optimizer: backend lacks pinned_host placement; "
                  "keeping optimizer state on device", file=sys.stderr)
    state = jax.jit(create, out_shardings=shardings)(rng)
    return state, shardings


def compile_train_step(model, optimizer, mesh, state_shardings, modal="video", has_frames=True):
    step_fn = make_train_step(model, optimizer, modal, has_frames)
    bs = batch_sharding(mesh)

    def batch_shardings_for(batch):
        return {k: bs for k in batch}

    def jitted(batch_example):
        return jax.jit(
            step_fn,
            in_shardings=(state_shardings, batch_shardings_for(batch_example)),
            out_shardings=(state_shardings, None),
            donate_argnums=(0,),
        )

    return jitted
