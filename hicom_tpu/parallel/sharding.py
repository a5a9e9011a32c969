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
    # tower embeddings replicate: d-sharding the table makes the token gather
    # emit d-sharded activations that collide with the batch-sharded layers
    # (XLA "involuntary full rematerialization" per layer, fwd + bwd); the
    # tables are small (≤ tens of MB) so replication is the right trade
    (r"(vision_tower|guide_encoder)/.*embedding$", P()),
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


_HOST_OFFLOAD_OK: Optional[bool] = None


def supports_host_offload() -> bool:
    """True when the backend can compile computations whose inputs/outputs
    live in ``pinned_host`` memory (TPU/GPU XLA memory-placement pass; the CPU
    backend lacks the annotate_device_placement lowering)."""
    global _HOST_OFFLOAD_OK
    if _HOST_OFFLOAD_OK is None:
        try:
            dev = jax.devices()[0]
            mesh = Mesh([dev], ("probe",))
            host = NamedSharding(mesh, P(), memory_kind="pinned_host")
            x = jax.device_put(jax.numpy.ones((8,)), host)
            jax.jit(lambda v: v * 2, in_shardings=host, out_shardings=host)(x)
            _HOST_OFFLOAD_OK = True
        except Exception:
            _HOST_OFFLOAD_OK = False
    return _HOST_OFFLOAD_OK


def host_offload_shardings(shardings: Any) -> Any:
    """Map every NamedSharding leaf to ``pinned_host`` memory — used on the
    optimizer-state subtree for ZeRO-offload-style training (the TPU-native
    analogue of the reference's ``scripts/zero3_offload.json``: Adam moments
    rest in host RAM; XLA streams them across PCIe around each update)."""
    return jax.tree.map(
        lambda s: s.with_memory_kind("pinned_host") if isinstance(s, NamedSharding) else s,
        shardings,
    )


def constrain_batch_activation(x):
    """``with_sharding_constraint`` pinning an activation's leading batch axis
    to (dp, fsdp) and replicating the rest — a no-op outside a mesh context
    (single-device tests/eval) or when the batch doesn't divide.

    Used on the guide-encoder hidden states: without it XLA's backward pass
    picks a conflicting layout and falls into "involuntary full
    rematerialization" (replicate-then-reshard) per layer — wasted HBM + ICI
    (observed in MULTICHIP_r01 dryrun on ``guide_encoder/.../layer_norm1``)."""
    try:
        from jax.interpreters import pxla

        mesh = pxla.thread_resources.env.physical_mesh
        if mesh.empty or "dp" not in mesh.shape or "fsdp" not in mesh.shape:
            return x
        spec = P(("dp", "fsdp"))
        if not _spec_fits(spec, x.shape, mesh):
            return x
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
    except Exception:
        return x


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
