"""Device mesh construction over ICI/DCN.

Axes (replacing the reference's torchrun+DeepSpeed process topology,
SURVEY.md §2.3):

* ``dp``   — pure data parallel (gradient psum rides ICI/DCN).
* ``fsdp`` — data parallel with parameter/optimizer sharding (ZeRO-3
  equivalent: params sharded at rest, all-gathered by XLA per layer).
* ``tp``   — tensor parallel over attention heads / MLP columns.

Batch is sharded over dp×fsdp; params over fsdp (rows) and tp (cols).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

MESH_AXES = ("dp", "fsdp", "tp")


def create_mesh(
    dp: Optional[int] = None,
    fsdp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, fsdp, tp) mesh. ``dp=None`` → use all remaining devices.

    Axis order puts tp innermost so tensor-parallel collectives ride the
    fastest ICI links (see jax-ml.github.io/scaling-book).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        assert n % (fsdp * tp) == 0, f"{n} devices not divisible by fsdp*tp={fsdp * tp}"
        dp = n // (fsdp * tp)
    assert dp * fsdp * tp == n, f"dp*fsdp*tp={dp * fsdp * tp} != {n} devices"
    dev_array = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(dev_array, MESH_AXES)


def single_device_mesh() -> Mesh:
    return create_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
