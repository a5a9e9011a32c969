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
