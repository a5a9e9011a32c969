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


_MANAGERS: dict = {}  # persistent per-dir managers so async commits survive calls


def _manager(output_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    key = (_ckpt_dir(output_dir), max_to_keep)
    if key not in _MANAGERS:
        _MANAGERS[key] = ocp.CheckpointManager(
            key[0],
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )
    return _MANAGERS[key]


def save_checkpoint(output_dir: str, state: Any, step: int, max_to_keep: int = 3,
                    wait: bool = False) -> None:
    """Async by default: orbax snapshots device arrays and commits on a
    background thread, so the train loop keeps stepping during the write (the
    ZeRO-gather + rank-0 torch.save in the reference's ``_save_checkpoint``
    blocks training instead, hicom_trainer.py:347-392). A subsequent save —
    or ``finalize_checkpoints`` at train end — joins the pending commit;
    ``wait=True`` restores blocking semantics."""
    import orbax.checkpoint as ocp

    mgr = _manager(output_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()


def finalize_checkpoints(output_dir: str) -> None:
    """Join any pending async checkpoint commit (call before process exit /
    before reading the checkpoint back)."""
    for (root, _), mgr in list(_MANAGERS.items()):
        if root == _ckpt_dir(output_dir):
            mgr.wait_until_finished()


def latest_valid_step(output_dir: str) -> Optional[int]:
    """Latest complete checkpoint step, GC'ing incomplete ones (reference
    ``is_ckpt_valid``/``check_ckpt_exists``, utils.py:63-100).

    Orbax renames in-progress dirs from ``<step>.orbax-checkpoint-tmp-*`` on
    commit; on filesystems without atomic rename an interrupted save can leave
    a tmp sibling or an empty step dir. Both are deleted here so resume never
    restores a truncated checkpoint.
    """
    import shutil

    # Join any in-flight async commit first: its in-progress tmp dir would
    # otherwise look like a crash leftover and be GC'd mid-write (and the
    # just-saved step would be invisible to an immediate resume).
    finalize_checkpoints(output_dir)
    root = _ckpt_dir(output_dir)
    if not os.path.isdir(root):
        return None
    entries = os.listdir(root)
    steps = []
    for name in entries:
        if ".orbax-checkpoint-tmp" in name:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
            continue
        if not re.fullmatch(r"\d+", name):
            continue
        path = os.path.join(root, name)
        has_tmp_sibling = any(t.startswith(f"{name}.orbax-checkpoint-tmp") for t in entries)
        if has_tmp_sibling or not os.listdir(path):
            shutil.rmtree(path, ignore_errors=True)
            continue
        steps.append(int(name))
    return max(steps) if steps else None


def restore_checkpoint(output_dir: str, state_template: Any, step: Optional[int] = None) -> Any:
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_valid_step(output_dir)  # validity scan + GC before resume
    mgr = _manager(output_dir)
    if step is None:
        return None
    return mgr.restore(step, args=ocp.args.StandardRestore(state_template))


# --------------------------------------------------------------------------- #
# Reference-format interop exports
# --------------------------------------------------------------------------- #


def export_mm_projector_bin(params: dict, path: str) -> None:
    """Write projector weights as the reference's ``mm_projector.bin``
    (fp16 torch state dict under ``model.mm_projector.*`` keys,
    hicom_trainer.py:98-111). Key mapping delegates to
    ``weights.flax_to_torch_state`` — one converter, no drift."""
    import torch

    from ..weights import flax_to_torch_state

    sd = {
        k: torch.from_numpy(v.astype(np.float32)).half()
        for k, v in flax_to_torch_state(params["mm_projector"], "model.mm_projector.").items()
    }
    if "image_newline" in params:
        sd["model.image_newline"] = torch.from_numpy(np.asarray(params["image_newline"]).astype(np.float32)).half()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(sd, path)
