"""LoRA overlay tests: identity at init, trains, round-trips through peft format."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from hicom_tpu.config import tiny_test_config
from hicom_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
from hicom_tpu.models.hicom import HIComModel
from hicom_tpu.train.lora import (
    apply_lora,
    export_peft_adapter,
    init_lora_params,
    load_peft_adapter,
    make_lora_loss_fn,
    target_kernels,
)
from hicom_tpu.train.train_step import make_loss_fn


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    model = HIComModel(config=cfg)
    rng = np.random.default_rng(0)
    img = cfg.vision_config.image_size
    ids = rng.integers(5, cfg.text_config.vocab_size, (2, 10))
    ids[:, 1] = VIDEO_TOKEN_INDEX
    labels = np.array(ids)
    labels[:, :3] = IGNORE_INDEX
    batch = {
        "input_ids": jnp.asarray(ids),
        "frames": jnp.asarray(rng.standard_normal((2, 2, 3, img, img)).astype(np.float32)),
        "labels": jnp.asarray(labels),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["input_ids"], batch["frames"],
                           labels=batch["labels"], modal="video")
    return cfg, model, variables["params"], batch


def test_lora_targets_decoder_linears_only(setup):
    _, _, params, _ = setup
    targets = target_kernels(params)
    assert targets and all(p.startswith("language_model/") for p in targets)
    assert not any("mm_projector" in p or "vision_tower" in p for p in targets)


def test_lora_identity_at_init_and_trains(setup):
    cfg, model, params, batch = setup
    lora = init_lora_params(params, rank=4)

    base_loss = make_loss_fn(model, modal="video")
    merged = apply_lora(params, lora, alpha=16, rank=4)
    l0 = float(base_loss(params, batch)[0])
    l0_merged = float(base_loss(merged, batch)[0])
    assert abs(l0 - l0_merged) < 1e-5  # B zero-init → identity overlay

    loss_fn = make_lora_loss_fn(base_loss, params, alpha=16, rank=4)
    tx = optax.adam(5e-3)
    opt_state = tx.init(lora)
    step = jax.jit(lambda lora, opt_state, batch: _step(lora, opt_state, batch))

    def _step(lora, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora, batch)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(lora, updates), opt_state, loss

    losses = []
    for _ in range(4):
        lora, opt_state, loss = step(lora, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_dequantize_decoder_roundtrip(setup):
    """quantize → traced dequantize reproduces fp kernels within quant error
    (int8 per-column; NF4 per-64-group codebook)."""
    from hicom_tpu.models.qwen2 import dequantize_decoder_params, quantize_decoder_params

    _, _, params, _ = setup
    lm = jax.device_get(params["language_model"])
    for mode, tol in (("int8", 0.02), ("nf4", 0.2)):
        q = quantize_decoder_params(lm, mode)
        deq = jax.jit(lambda t: dequantize_decoder_params(t, jnp.float32))(
            jax.tree.map(jnp.asarray, q))

        def compare(a, b):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            assert np.abs(a - b).max() / scale < tol, (mode, np.abs(a - b).max(), scale)

        flat_fp = jax.tree_util.tree_leaves_with_path(lm)
        flat_dq = dict(jax.tree_util.tree_leaves_with_path(deq))
        n_kernels = 0
        for path, leaf in flat_fp:
            if path in flat_dq and getattr(leaf, "ndim", 0) == 2 and "kernel" in str(path[-1]):
                compare(leaf, flat_dq[path])
                n_kernels += 1
        assert n_kernels > 0


def test_qlora_loss_decreases(setup):
    """QLoRA: frozen int8 base dequantized at trace time + LoRA adapters —
    identity at init (up to quantization error) and loss decreases training
    only the adapters (reference train.py:567-635)."""
    from hicom_tpu.models.qwen2 import dequantize_decoder_params, quantize_decoder_params

    cfg, model, params, batch = setup
    lora = init_lora_params(params, rank=4)
    base_loss = make_loss_fn(model, modal="video")

    q_lm = jax.tree.map(jnp.asarray,
                        quantize_decoder_params(jax.device_get(params["language_model"]), "int8"))
    frozen_rest = {k: v for k, v in params.items() if k != "language_model"}

    def loss_fn(lora, batch):
        fp = {**frozen_rest, "language_model": dequantize_decoder_params(q_lm, jnp.float32)}
        return base_loss(apply_lora(fp, lora, 16, 4), batch)

    tx = optax.adam(5e-3)
    opt_state = tx.init(lora)

    @jax.jit
    def step(lora, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora, batch)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(lora, updates), opt_state, loss

    losses = []
    for _ in range(4):
        lora, opt_state, loss = step(lora, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_qlora_memory_7b_fits_16gb():
    """Flagship Qwen2.5-7B dims with NF4 base + rank-64 adapters must fit one
    16GB v5e chip — the capability the reference needs an 80GB A100 for."""
    from hicom_tpu.config import Qwen2Config
    from hicom_tpu.train.lora import estimate_qlora_memory

    tc = Qwen2Config(vocab_size=152064, hidden_size=3584, intermediate_size=18944,
                     num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
                     head_dim=128, rope_theta=1000000.0)
    est = estimate_qlora_memory(tc, bits=4, rank=64, batch_tokens=4096)
    assert est["total_gib"] < 12.0, est  # headroom under 16GB for runtime buffers
    est8 = estimate_qlora_memory(tc, bits=8, rank=64)
    assert est8["total_gib"] < 14.0, est8


def test_peft_adapter_roundtrip(setup, tmp_path):
    _, _, params, _ = setup
    rng = jax.random.PRNGKey(1)
    lora = init_lora_params(params, rank=4, rng=rng)
    # perturb b so it's nonzero
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    export_peft_adapter(lora, str(tmp_path / "adapter"), alpha=16, rank=4)
    restored, alpha, rank = load_peft_adapter(str(tmp_path / "adapter"))
    assert alpha == 16 and rank == 4
    assert set(restored) == set(lora)
    for p in lora:
        np.testing.assert_allclose(np.asarray(restored[p]["a"]), np.asarray(lora[p]["a"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(restored[p]["b"]), np.asarray(lora[p]["b"]), rtol=1e-6)


def test_target_kernels_quant_layout(setup):
    """target_kernels resolves kernel_q/kernel_nf4 storage to the fp paths and
    unpacked dims, so adapters init against a quantized base tree directly."""
    from hicom_tpu.models.qwen2 import quantize_decoder_shapes

    _, _, params, _ = setup
    fp_targets = target_kernels(params)
    shapes = jax.eval_shape(lambda: params)
    for mode in ("int8", "nf4"):
        q_shapes = {**dict(shapes),
                    "language_model": quantize_decoder_shapes(dict(shapes)["language_model"], mode)}
        q_targets = target_kernels(q_shapes)
        assert q_targets == fp_targets, (mode, set(fp_targets) ^ set(q_targets))


def test_qlora_interceptor_matches_merged(setup):
    """The side-path (y + s·(xA)B, lora_interceptor) equals the merged overlay
    (x·(W + s·AB), apply_lora) on an fp base, up to fp association order."""
    import flax.linen as nn

    from hicom_tpu.train.lora import lora_interceptor

    cfg, model, params, batch = setup
    lora = init_lora_params(params, rank=4, rng=jax.random.PRNGKey(3))
    lora = jax.tree.map(lambda x: x + 0.01, lora)  # nonzero B → nontrivial overlay
    base_loss = make_loss_fn(model, modal="video")

    l_merged = float(base_loss(apply_lora(params, lora, 16, 4), batch)[0])
    with nn.intercept_methods(lora_interceptor(lora, 16, 4, compute_dtype=jnp.float32)):
        l_side = float(base_loss(params, batch)[0])
    assert abs(l_merged - l_side) < 1e-4 * max(1.0, abs(l_merged)), (l_merged, l_side)


def test_qlora_interceptor_quant_base_trains(setup):
    """QLoRA the memory-safe way: QUANTIZED decoder modules (dequant inside the
    per-layer remat boundary) + interceptor side-path. Identity at init (B=0)
    and loss decreases training only the adapters; grads reach every target."""
    import dataclasses as dc

    from hicom_tpu.models.qwen2 import quantize_decoder_params
    from hicom_tpu.train.lora import make_qlora_loss_fn

    cfg, model, params, batch = setup
    qcfg = dc.replace(cfg, text_config=dc.replace(cfg.text_config,
                                                  quantization="int8", remat=True))
    qmodel = HIComModel(config=qcfg)
    q_lm = jax.tree.map(jnp.asarray,
                        quantize_decoder_params(jax.device_get(params["language_model"]), "int8"))
    frozen = {**{k: v for k, v in params.items() if k != "language_model"},
              "language_model": q_lm}

    lora = init_lora_params(frozen, rank=4)  # targets resolved from the QUANT tree
    base_loss = make_loss_fn(qmodel, modal="video")
    loss_fn = make_qlora_loss_fn(base_loss, frozen, alpha=16, rank=4)

    # identity at init: side-path is zero (B=0) → equals the plain quant-base loss
    l_base = float(base_loss(frozen, batch)[0])
    l_init = float(loss_fn(lora, batch)[0])
    assert abs(l_base - l_init) < 1e-5 * max(1.0, abs(l_base)), (l_base, l_init)

    tx = optax.adam(5e-3)
    opt_state = tx.init(lora)

    @jax.jit
    def step(lora, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora, batch)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(lora, updates), opt_state, loss, grads

    losses = []
    for i in range(4):
        lora, opt_state, loss, grads = step(lora, opt_state, batch)
        losses.append(float(loss))
        if i == 0:  # B=0 ⇒ dL/dA = 0, but every B must see a gradient
            gb = [float(jnp.abs(g["b"]).max()) for g in jax.tree.leaves(
                {k: v for k, v in grads.items()}, is_leaf=lambda x: isinstance(x, dict) and "b" in x)]
            assert all(g > 0 for g in gb), "a LoRA target got no gradient through the interceptor"
    assert losses[-1] < losses[0], losses
