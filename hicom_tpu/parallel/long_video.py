"""Sequence-parallel long-video encoding: frames sharded over the mesh.

The reference caps videos at 32 frames (``/root/reference/hicom/constants.py:21``,
applied in ``mm_utils.py:636``) because all t·729 SigLIP tokens must fit one
GPU. Here the t axis is sharded over mesh devices instead:

* SigLIP runs on each device's frame chunk — pure data parallelism, zero
  collectives (the dominant FLOPs).
* The local compressor is exactly shard-local when the chunk size is a
  multiple of its temporal kernel T: integer-factor trilinear query windows
  and the T×S×S key/value tiles never cross chunk boundaries
  (``projector.py:536-553`` semantics preserved bit-for-bit).
* The global compressor's N queries attend over all t·h·w tokens via a
  distributed online softmax: per-chunk (max, numerator, denominator) stats
  merged with one pmax + one psum over ICI (``ops/attention.py``); 3D sinusoid
  position embeddings are sliced from the global table at each chunk's frame
  offset.

Result: 128-, 256-, 512-frame videos compress with the same numerics as a
single-device pass, wall-clock scaling ~1/n_devices.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

Array = jnp.ndarray


def _axis_names(axis: Union[str, Sequence[str]]) -> Tuple[str, ...]:
    return (axis,) if isinstance(axis, str) else tuple(axis)


def encode_visual_sharded(
    model,
    params,
    frames: Array,  # (t, 3, H, W) — one long video
    mesh: Mesh,
    axis: Union[str, Sequence[str]] = ("dp", "fsdp", "tp"),
    guide_embeds: Optional[Array] = None,  # (d,) or (Lg, d), replicated
    modal: str = "video",
) -> Array:
    """Compress a long video with its t axis sharded over ``axis``.

    Exact-parity with ``HIComModel.encode_visual`` (tested on a virtual mesh);
    requires ``t % (n_devices · temporal_kernel) == 0`` — the frame sampler
    can always hit that for long videos. Returns (V, hidden) visual tokens.
    Callers jit this (params replicated or resharded automatically).
    """
    from ..models.postprocess import post_process_visual_feature

    cfg = model.config
    names = _axis_names(axis)
    n = 1
    for a in names:
        n *= mesh.shape[a]
    t = frames.shape[0]
    assert t % n == 0, f"t={t} not divisible by {n} devices"
    t_loc = t // n
    spec = cfg.projector
    if spec.local is not None:
        kt = spec.local.temporal_kernel_size
        assert t_loc % kt == 0, (
            f"per-device chunk {t_loc} must be a multiple of the temporal "
            f"kernel {kt}; sample t as a multiple of {n * kt}"
        )

    def body(params, frames_loc, guide_e):
        idx = jnp.int32(0)
        for a in names:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        t_offset = idx * t_loc
        return model.apply(
            {"params": params}, frames_loc, guide_e, modal, t_offset, t, names,
            method="encode_visual_shard",
        )

    out_specs = (
        P(names) if spec.local is not None else None,  # t' chunks concat in order
        P() if spec.global_ is not None else None,  # identical on every device
    )
    local_raw, global_tokens = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(names), P() if guide_embeds is not None else None),
        out_specs=out_specs,
    )(params, frames, guide_embeds)

    parts = []
    if local_raw is not None:
        nl = params.get("image_newline")
        if nl is not None:
            nl = jnp.asarray(nl, local_raw.dtype)
        parts.append(post_process_visual_feature(cfg, local_raw, modal, nl, is_anyres=False))
    if global_tokens is not None:
        parts.append(global_tokens)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-2)
