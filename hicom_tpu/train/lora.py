"""LoRA adapters as a parameter-tree overlay.

The reference wraps the model with peft (``train.py:619-635``; targets = all LLM
linears except projector/tower, ``hicom_trainer.py:75-88``). Here LoRA is a
functional overlay: low-rank (A, B) factors live in their own pytree; the loss
function merges ``W_eff = W + (alpha/r) * A @ B`` at trace time, so only the
factors receive gradients/optimizer state (the ZeRO-dominant cost), while XLA
fuses the merge into the matmuls.

Adapters export to the peft-compatible ``adapter_model.bin`` layout so
reference tooling can merge them.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# peft-equivalent default targets: decoder linears, never projector/tower/embeds
DEFAULT_TARGET = r"language_model/.*(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj)/kernel$"


def _paths(tree):
    from ..parallel.sharding import path_str

    return [(path_str(p), v) for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]]


def target_kernels(params: Any, target_regex: str = DEFAULT_TARGET) -> Dict[str, Tuple[int, int]]:
    """{path: (in_dim, out_dim)} of kernels LoRA attaches to.

    Quantized decoder layouts are understood directly: ``kernel_q`` (int8,
    (in, out)) and ``kernel_nf4`` (packed uint8, (in/2, out)) leaves map to
    their fp ``.../kernel`` path with the unpacked dims, so adapters can be
    initialized against a quantized base tree without ever materializing the
    fp decoder (the QLoRA side-path, :func:`lora_interceptor`)."""
    out = {}
    for path, leaf in _paths(params):
        if getattr(leaf, "ndim", 0) != 2:
            continue
        if re.search(target_regex, path):
            out[path] = tuple(leaf.shape)
            continue
        for suffix, row_expand in (("kernel_q", 1), ("kernel_nf4", 2)):
            if path.endswith("/" + suffix):
                fp_path = path[: -len(suffix)] + "kernel"
                if re.search(target_regex, fp_path):
                    out[fp_path] = (leaf.shape[0] * row_expand, leaf.shape[1])
    return out


def init_lora_params(
    params: Any,
    rank: int = 8,
    rng: Optional[jax.Array] = None,
    target_regex: str = DEFAULT_TARGET,
    dtype=jnp.float32,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """{path: {"a": (in, r) kaiming-ish, "b": (r, out) zeros}} — B zero-init so
    the overlay starts as identity (peft convention)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    targets = target_kernels(params, target_regex)
    assert targets, (
        "no LoRA target kernels matched — stacked (scan-layers) or quantized "
        "params have no 2-D decoder kernels; train LoRA on the unrolled fp tree"
    )
    keys = jax.random.split(rng, max(len(targets), 1))
    out = {}
    for (path, (din, dout)), key in zip(sorted(targets.items()), keys):
        a = jax.random.normal(key, (din, rank), dtype) * (1.0 / np.sqrt(din))
        b = jnp.zeros((rank, dout), dtype)
        out[path] = {"a": a, "b": b}
    return out


def apply_lora(params: Any, lora: Dict[str, Dict[str, jnp.ndarray]], alpha: float = 16.0, rank: int = 8) -> Any:
    """Merged parameter tree: W + (alpha/rank) * A @ B at targeted kernels."""
    scaling = alpha / rank
    flat = jax.tree_util.tree_flatten_with_path(params)
    from ..parallel.sharding import path_str

    leaves, treedef = flat
    merged = []
    consumed = set()
    for path_entries, leaf in leaves:
        path = path_str(path_entries)
        if path in lora:
            ab = lora[path]
            delta = (ab["a"] @ ab["b"]) * scaling
            merged.append(leaf + delta.astype(leaf.dtype))
            consumed.add(path)
        else:
            merged.append(leaf)
    unmatched = set(lora) - consumed
    assert not unmatched, (
        f"{len(unmatched)} LoRA keys matched no base param (quantized/stacked "
        f"tree? merge the adapter BEFORE quantize/stack): {sorted(unmatched)[:3]}..."
    )
    return jax.tree_util.tree_unflatten(treedef, merged)


def make_lora_loss_fn(base_loss_fn: Callable, params: Any, alpha: float = 16.0, rank: int = 8):
    """Wrap a loss(params, batch) into loss(lora, batch) with frozen base params."""

    def loss_fn(lora, batch):
        return base_loss_fn(apply_lora(params, lora, alpha, rank), batch)

    return loss_fn


def lora_interceptor(lora: Dict[str, Dict[str, jnp.ndarray]], alpha: float = 16.0,
                     rank: int = 8, compute_dtype=jnp.bfloat16):
    """``flax.linen.intercept_methods`` hook implementing the QLoRA side-path:
    ``y = base(x) + (alpha/rank) * (x @ A) @ B`` on targeted linears.

    Unlike :func:`apply_lora` (which merges ``W + s·AB`` into fp kernels and
    therefore needs the full fp decoder in the traced program), the base
    module is untouched — a QUANTIZED decoder (QuantDense / QuantDense4,
    models/qwen2.py) keeps int8/NF4 kernels resident and dequantizes INSIDE
    each layer's ``nn.remat`` boundary, so backward re-derives one layer's fp
    kernels at a time instead of holding all of them (13 GB at 7B dims —
    measured XLA compile OOM, r4). This is the reference's bitsandbytes
    Linear4bit+LoRA decomposition (``train.py:567-587``) done the JAX way.

    Adapter matmuls run in ``compute_dtype`` (fp32 masters stay in the
    optimizer — standard mixed precision; the side-path is ~r/d of base
    FLOPs, and bf16 keeps it on the fast MXU path)."""
    scaling = alpha / rank
    by_module = {k[: -len("/kernel")]: v for k, v in lora.items()}

    def interceptor(next_fn, args, kwargs, context):
        y = next_fn(*args, **kwargs)
        if context.method_name != "__call__" or not args:
            return y
        ab = by_module.get("/".join(context.module.path))
        if ab is None:
            return y
        x = args[0].astype(compute_dtype)
        delta = (x @ ab["a"].astype(compute_dtype)) @ ab["b"].astype(compute_dtype)
        return y + (delta * jnp.asarray(scaling, compute_dtype)).astype(y.dtype)

    return interceptor


def make_qlora_loss_fn(base_loss_fn: Callable, params: Any, alpha: float = 16.0, rank: int = 8,
                       compute_dtype=jnp.bfloat16):
    """loss(lora, batch) over a FROZEN — typically quantized — base tree: the
    adapter contribution is injected per-linear by :func:`lora_interceptor`,
    never merged into kernels. Use with a model whose text config has
    ``quantization="nf4"``/``"int8"`` and ``remat=True`` for the
    one-chip-7B memory profile. ``compute_dtype`` sets the adapter side-path
    matmul dtype — pass fp32 for fp32 base compute so the two paths agree."""
    import flax.linen as nn

    def loss_fn(lora, batch):
        with nn.intercept_methods(
                lora_interceptor(lora, alpha, rank, compute_dtype=compute_dtype)):
            return base_loss_fn(params, batch)

    return loss_fn


def estimate_qlora_memory(text_config, bits: int = 4, rank: int = 64,
                          batch_tokens: int = 4096) -> Dict[str, float]:
    """Analytic HBM footprint (GiB) of QLoRA training at given decoder dims —
    the sizing check the reference delegates to bitsandbytes empirically
    (``train.py:567-587``). Returns a breakdown; "total" is the at-rest
    figure (weights + adapters + Adam moments + embeds/lm_head bf16), to
    which activations (bounded by remat to ~one layer) are added."""
    tc = text_config
    d, ff = tc.hidden_size, tc.intermediate_size
    kv = tc.num_key_value_heads * tc.head_dim
    q = tc.num_attention_heads * tc.head_dim
    per_layer = d * q + 2 * d * kv + q * d + 3 * d * ff  # attn + swiglu linears
    linear_params = tc.num_hidden_layers * per_layer
    embed_params = tc.vocab_size * d * (1 if tc.tie_word_embeddings else 2)

    wbytes = linear_params * (0.5 if bits == 4 else 1)
    # scale accounting is CONSERVATIVE (f32): the real path stores quant
    # scales in the compute dtype (cli.py cast_frozen — bf16 halves this
    # term), so the estimate upper-bounds actual HBM
    if bits == 4:
        wbytes += linear_params / 64 * 4  # per-64-group scales
    else:
        wbytes += tc.num_hidden_layers * (q + 2 * kv + d + 3 * ff) * 4  # per-col scales
    n_targets = tc.num_hidden_layers * 7
    lora_params = sum(
        rank * (din + dout)
        for din, dout in [(d, q), (d, kv), (d, kv), (q, d), (d, ff), (d, ff), (ff, d)]
    ) * tc.num_hidden_layers
    abytes = lora_params * 4          # f32 adapters
    obytes = lora_params * 8          # Adam m+v
    ebytes = embed_params * 2         # bf16 embeds + lm_head (frozen)
    # activations: remat bounds live activations to ~one layer's worth
    # (hidden + q/k/v + ff intermediates) per microbatch token
    act = batch_tokens * (4 * d + 2 * ff) * 2
    gib = 1024 ** 3
    out = {"weights_gib": wbytes / gib, "adapters_gib": abytes / gib,
           "optimizer_gib": obytes / gib, "embeds_gib": ebytes / gib,
           "activations_gib": act / gib, "n_lora_targets": n_targets}
    out["total_gib"] = sum(v for k, v in out.items() if k.endswith("_gib"))
    return out


def export_peft_adapter(lora: Dict[str, Dict[str, jnp.ndarray]], path: str, alpha: float = 16.0, rank: int = 8):
    """Write peft-layout adapter weights: ``base_model.model.<torch path>.
    lora_A.weight`` (r, in) / ``lora_B.weight`` (out, r) fp32 + config json."""
    import json
    import os

    import torch

    sd = {}
    for p, ab in lora.items():
        torch_path = p.replace("language_model/", "").replace("/kernel", "").replace("/", ".")
        torch_path = re.sub(r"layers_(\d+)", r"layers.\1", torch_path)
        sd[f"base_model.model.{torch_path}.lora_A.weight"] = torch.from_numpy(
            np.asarray(ab["a"], np.float32).T.copy()
        )
        sd[f"base_model.model.{torch_path}.lora_B.weight"] = torch.from_numpy(
            np.asarray(ab["b"], np.float32).T.copy()
        )
    os.makedirs(path, exist_ok=True)
    torch.save(sd, os.path.join(path, "adapter_model.bin"))
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump({"peft_type": "LORA", "r": rank, "lora_alpha": alpha,
                   "target_modules": ["q_proj", "k_proj", "v_proj", "o_proj",
                                      "gate_proj", "up_proj", "down_proj"]}, f)


def load_peft_adapter(path: str) -> Tuple[Dict[str, Dict[str, jnp.ndarray]], float, int]:
    """Read a peft adapter directory back into the overlay format."""
    import json
    import os

    import torch

    with open(os.path.join(path, "adapter_config.json")) as f:
        cfg = json.load(f)
    sd = torch.load(os.path.join(path, "adapter_model.bin"), map_location="cpu", weights_only=True)
    lora: Dict[str, Dict[str, jnp.ndarray]] = {}
    for key, val in sd.items():
        m = re.match(r"base_model\.model\.(.*)\.lora_([AB])\.weight", key)
        if not m:
            continue
        torch_path, which = m.groups()
        p = "language_model/" + re.sub(r"layers\.(\d+)", r"layers_\1", torch_path).replace(".", "/") + "/kernel"
        lora.setdefault(p, {})[{"A": "a", "B": "b"}[which]] = jnp.asarray(val.float().numpy().T)
    return lora, float(cfg.get("lora_alpha", 16)), int(cfg.get("r", 8))
