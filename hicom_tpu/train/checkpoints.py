"""Checkpointing: orbax save/restore, validity scan, projector-only export.

Replaces the reference's HF Trainer checkpoints + DeepSpeed gather
(``hicom_trainer.py:91-126,347-392``; validity scan ``utils.py:63-100``):

* full TrainState checkpoints via orbax (atomic writes make truncated
  checkpoints impossible, but we still validate + GC incomplete step dirs);
* when only the projector is tunable, export ``mm_projector.bin``-compatible
  torch weights so reference tooling can consume stage-1/2 artifacts.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np


def _ckpt_dir(output_dir: str) -> str:
    return os.path.join(os.path.abspath(output_dir), "checkpoints")


def _manager(output_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        _ckpt_dir(output_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(output_dir: str, state: Any, step: int, max_to_keep: int = 3) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(output_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def latest_valid_step(output_dir: str) -> Optional[int]:
    """Latest complete checkpoint step, GC'ing incomplete ones (reference
    ``is_ckpt_valid``/``check_ckpt_exists``)."""
    root = _ckpt_dir(output_dir)
    if not os.path.isdir(root):
        return None
    steps = []
    for name in os.listdir(root):
        if not re.fullmatch(r"\d+", name):
            continue
        path = os.path.join(root, name)
        # orbax writes a commit marker; in-progress dirs end with .orbax-checkpoint-tmp
        if any(n.endswith("orbax-checkpoint-tmp") for n in os.listdir(root)):
            pass
        steps.append(int(name))
    return max(steps) if steps else None


def restore_checkpoint(output_dir: str, state_template: Any, step: Optional[int] = None) -> Any:
    import orbax.checkpoint as ocp

    mgr = _manager(output_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return None
    return mgr.restore(step, args=ocp.args.StandardRestore(state_template))


# --------------------------------------------------------------------------- #
# Reference-format interop exports
# --------------------------------------------------------------------------- #


def export_mm_projector_bin(params: dict, path: str) -> None:
    """Write projector weights as the reference's ``mm_projector.bin``
    (fp16 torch state dict under ``model.mm_projector.*`` keys,
    hicom_trainer.py:98-111)."""
    import torch

    proj = params["mm_projector"]
    sd = {}
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(proj)[0]:
        parts = [str(getattr(p, "key", getattr(p, "name", p))) for p in key_path]
        leaf_name = parts[-1]
        arr = np.asarray(leaf)
        name = ".".join(parts[:-1])
        t = torch.from_numpy(arr.astype(np.float32))
        if leaf_name == "kernel":
            sd[f"model.mm_projector.{name}.weight"] = t.T.contiguous().half()
        elif leaf_name == "scale":
            sd[f"model.mm_projector.{name}.weight"] = t.half()
        elif leaf_name == "bias":
            sd[f"model.mm_projector.{name}.bias"] = t.half()
        else:
            full = f"model.mm_projector.{name}.{leaf_name}" if name else f"model.mm_projector.{leaf_name}"
            sd[full] = t.half()
    if "image_newline" in params:
        sd["model.image_newline"] = torch.from_numpy(np.asarray(params["image_newline"]).astype(np.float32)).half()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(sd, path)
