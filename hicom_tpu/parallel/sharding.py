"""Parameter/activation sharding rules.

Replaces the reference's DeepSpeed ZeRO configs (``scripts/zero*.json``) with
explicit PartitionSpecs: XLA inserts the all-gathers/reduce-scatters that
DeepSpeed does by hand. Rules are (path-regex → PartitionSpec) applied to the
flattened param tree; any rule whose axis sizes don't divide the param dims
falls back to replication, so the same rules work on 1, 8, or 256 chips.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Order matters: first match wins. Paths are "/"-joined param tree keys.
DEFAULT_RULES: List[Tuple[str, P]] = [
    # --- decoder, nn.scan layout (leading layer axis stays unsharded) ---
    (r"language_model/model/layers/layer/.*(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel$", P(None, "fsdp", "tp")),
    (r"language_model/model/layers/layer/.*(o_proj|down_proj)/kernel$", P(None, "tp", "fsdp")),
    (r"language_model/model/layers/layer/.*", P()),
    # --- decoder (Qwen2 / Llama), unrolled layout ---
    # hidden-sharded (not vocab-sharded): the lookup output and its backward
    # scatter-add are then natively tp-sharded on D, matching the decoder's
    # qkv layouts — avoids an involuntary (b, L, D) reshard per train step
    (r"language_model/.*embed_tokens/embedding$", P("fsdp", "tp")),
    (r"language_model/.*(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel$", P("fsdp", "tp")),
    (r"language_model/.*(o_proj|down_proj)/kernel$", P("tp", "fsdp")),
    (r"language_model/lm_head/kernel$", P("fsdp", "tp")),
    (r"language_model/.*(layernorm|norm)/scale$", P()),
    (r"language_model/.*bias$", P()),
    # --- vision tower / guide encoder: fsdp-shard the big matrices ---
    (r"(vision_tower|guide_encoder)/.*(q_proj|k_proj|v_proj|fc1)/kernel$", P("fsdp", "tp")),
    (r"(vision_tower|guide_encoder)/.*(out_proj|fc2)/kernel$", P("tp", "fsdp")),
    (r"(vision_tower|guide_encoder)/.*embedding$", P(None, "fsdp")),
    (r"(vision_tower|guide_encoder)/.*head/kernel$", P("fsdp", None)),
    # --- projector: small; shard readout rows on fsdp ---
    (r"mm_projector/.*kernel$", P("fsdp", None)),
    # everything else replicated
    (r".*", P()),
]


def _spec_fits(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> bool:
    if len(spec) > len(shape):
        return False
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        axes = (axis,) if isinstance(axis, str) else axis
        size = 1
        for a in axes:
            size *= mesh.shape[a]
        if dim % size != 0:
            return False
    return True


def spec_for_path(path: str, shape: Tuple[int, ...], mesh: Mesh, rules=None) -> P:
    rules = rules or DEFAULT_RULES
    for pattern, spec in rules:
        if re.search(pattern, path):
            return spec if _spec_fits(spec, shape, mesh) else P()
    return P()


def path_str(path_entries) -> str:
    parts = []
    for p in path_entries:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_shardings(params: Any, mesh: Mesh, rules=None) -> Any:
    """NamedSharding pytree matching ``params``.

    Works on any pytree whose leaf paths *contain* the param path — in
    particular a whole TrainState: AdamW moment paths include the param path,
    so they inherit the param's sharding; scalars hit the replicate catch-all.
    """

    def one(path_entries, leaf):
        path = path_str(path_entries)
        shape = getattr(leaf, "shape", ())
        return NamedSharding(mesh, spec_for_path(path, shape, mesh, rules))

    return jax.tree_util.tree_map_with_path(one, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over dp×fsdp."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_tree(batch: Any, mesh: Mesh) -> Any:
    """Apply batch sharding to every array leaf (leading axis = batch)."""
    bs = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, bs), batch)


def make_global_batch(local_batch: Any, mesh: Mesh) -> Any:
    """Host-local batch slice → global sharded arrays.

    Single-process: plain device_put (== shard_batch_tree). Multi-host: each
    process contributes its 1/process_count slice of the global batch via
    ``jax.make_array_from_process_local_data`` — no cross-host data exchange
    (the hosts' slices land on their own devices; collectives only see
    gradients). Replaces the reference's torch DistributedSampler + NCCL path.
    """
    if jax.process_count() == 1:
        return shard_batch_tree(local_batch, mesh)
    bs = batch_sharding(mesh)
    import numpy as np

    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(bs, np.asarray(x)), local_batch
    )
