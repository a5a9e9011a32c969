"""Pipeline parallelism over the decoder's layer axis (GPipe-style).

The reference has no pipeline parallelism (SURVEY.md §2.3 — its scaling story
is torchrun DP + DeepSpeed ZeRO). This is a beyond-reference scaling axis for
decoders whose layers don't fit one chip even sharded: the ``scan_layers``
param tree is stacked on a leading layer axis, so pipeline stages are just a
``P("pp")`` sharding of that axis — stage r holds layers [r·L/S, (r+1)·L/S).

Execution is the classic microbatch rotation inside one ``shard_map``: at
step t, stage r runs microbatch t−r through its local layers (``lax.scan``
over the local stacked params) and hands the activation to stage r+1 with a
ring ``ppermute`` — the fill/drain bubble is the usual (S−1)/(S−1+M) overhead
and compute/communication overlap is left to XLA's latency-hiding scheduler.
Everything is differentiable (``ppermute``/``cond``/``scan`` have transposes),
so the same function serves pipeline-parallel training.

Embedding, final norm and lm_head are tiny next to the layer stack and run
replicated outside the pipeline body.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

Array = jnp.ndarray


def create_pp_mesh(pp: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D ("pp",) mesh; combine with dp/tp by building your own Mesh with a
    "pp" axis and passing it to :func:`pipeline_prefill`."""
    if devices is None:
        devices = jax.devices()
    if pp is None:
        pp = len(devices)
    assert len(devices) >= pp
    return Mesh(np.asarray(devices[:pp]), ("pp",))


def pipeline_prefill(
    config,
    lm_params: dict,  # Qwen2ForCausalLM params WITH scan_layers=True
    embeds: Array,  # (b, L, D) post-splice embeddings
    positions: Array,  # (b, L)
    mesh: Mesh,
    axis: str = "pp",
    num_microbatches: Optional[int] = None,
    dtype: Any = jnp.bfloat16,
) -> Array:
    """Cache-less forward (training / prefill) with layers sharded over ``axis``.

    Returns post-norm hidden states (b, L, D) replicated over the pp axis —
    feed to ``Qwen2ForCausalLM.logits`` / the loss. Requires
    ``config.scan_layers`` param layout (leading layer axis) with
    ``num_hidden_layers % pp == 0`` and ``b % num_microbatches == 0``.
    """
    from ..models.qwen2 import DecoderLayer, RMSNorm

    S = mesh.shape[axis]
    M = num_microbatches or S
    b, L, D = embeds.shape
    assert config.num_hidden_layers % S == 0, (
        f"{config.num_hidden_layers} layers not divisible by pp={S}")
    assert b % M == 0, f"batch {b} not divisible by microbatches {M}"
    mb = b // M

    layer_stack = lm_params["model"]["layers"]["layer"]
    layer = DecoderLayer(config, dtype=dtype)

    x_mb = embeds.astype(dtype).reshape(M, mb, L, D)
    pos_mb = positions.reshape(M, mb, L)

    def body(local_layers, x_mb, pos_mb):
        r = jax.lax.axis_index(axis)

        def run_local(x, pos):
            def one(h, p):
                h, _, _ = layer.apply({"params": p}, h, pos, None, None, None,
                                      None, False, True, None)
                return h, None

            return jax.lax.scan(one, x, local_layers)[0]

        buf = jnp.zeros((mb, L, D), dtype)
        pos_buf = jnp.zeros((mb, L), positions.dtype)
        outs = jnp.zeros((M, mb, L, D), dtype)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def step(t, carry):
            buf, pos_buf, outs = carry
            inj = jnp.minimum(t, M - 1)
            x_in = jnp.where(r == 0,
                             jax.lax.dynamic_index_in_dim(x_mb, inj, keepdims=False),
                             buf)
            pos_in = jnp.where(r == 0,
                               jax.lax.dynamic_index_in_dim(pos_mb, inj, keepdims=False),
                               pos_buf)
            live = (t >= r) & (t - r < M)
            y = jax.lax.cond(live, lambda x: run_local(x, pos_in), lambda x: x, x_in)
            oi = jnp.clip(t - (S - 1), 0, M - 1)
            outs = jax.lax.cond(
                (r == S - 1) & live,
                lambda o: jax.lax.dynamic_update_index_in_dim(o, y, oi, 0),
                lambda o: o,
                outs,
            )
            buf, pos_buf = jax.lax.ppermute((y, pos_in), axis, perm)
            return buf, pos_buf, outs

        _, _, outs = jax.lax.fori_loop(0, S + M - 1, step, (buf, pos_buf, outs))
        # only the last stage wrote outs (zeros elsewhere) → psum replicates
        return jax.lax.psum(outs, axis)

    outs = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(layer_stack, x_mb, pos_mb)

    hidden = outs.reshape(b, L, D)
    norm = RMSNorm(config.rms_norm_eps, dtype=dtype)
    return norm.apply({"params": lm_params["model"]["norm"]}, hidden)
