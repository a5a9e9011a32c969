"""Anyres image feature merging tests (vs reference mm_utils + torch ops)."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")
from reference_loader import load_reference

torch = pytest.importorskip("torch")


def test_unpad_bounds_matches_reference():
    load_reference()
    from hicom.mm_utils import unpad_image as ref_unpad

    from hicom_tpu.models.anyres import unpad_bounds

    rng = np.random.default_rng(0)
    for (gh, gw), osize in [((8, 8), (100, 50)), ((8, 8), (50, 100)), ((12, 8), (300, 300)), ((4, 12), (640, 480))]:
        x = rng.standard_normal((5, gh, gw)).astype(np.float32)  # (C, H, W)
        ref = ref_unpad(torch.from_numpy(x), osize).numpy()
        hs, ws = unpad_bounds((gh, gw), osize)
        got = x[:, hs, ws]
        np.testing.assert_allclose(got, ref)


def test_grid_shape_matches_reference():
    load_reference()
    import re as _re

    import hicom.mm_utils as ref_mm

    # The reference forgot `import re` in mm_utils (its anyres range-syntax
    # path raises NameError and hicom_arch falls back to a 2x2 grid). Inject
    # it to compare against the INTENDED behavior, which we implement.
    ref_mm.re = _re
    ref_shape = ref_mm.get_anyres_image_grid_shape

    from hicom_tpu.data.image import get_anyres_image_grid_shape

    pin = "(1x1),...,(6x6)"
    for size in [(800, 600), (333, 1000), (64, 64), (2000, 100)]:
        assert get_anyres_image_grid_shape(size, pin, 384) == ref_shape(size, pin, 384)


@pytest.mark.parametrize("merge", ["spatial_unpad", "spatial_maxpool2x2", "spatial"])
def test_anyres_merge_modes(merge):
    """Merged grid matches a direct torch reconstruction of the reference ops."""
    from hicom_tpu.models.anyres import process_anyres_image_feature

    rng = np.random.default_rng(1)
    hw, d = 4, 6
    nh, nw = 2, 3
    image_size = (3 * 384, 2 * 384)  # (w, h) → grid 3x2 at pinpoints
    feats = rng.standard_normal((1 + nh * nw, hw, hw, d)).astype(np.float32)
    cfg = types.SimpleNamespace(
        mm_patch_merge_type=merge,
        image_aspect_ratio="anyres",
        image_grid_pinpoints="(1x1),...,(6x6)",
    )
    out = process_anyres_image_feature(jnp.asarray(feats), image_size, cfg, 384)
    assert out["base"].shape == (hw, hw, d)
    patch = np.asarray(out["patch"])

    # torch reconstruction
    grid = torch.from_numpy(feats[1:]).reshape(nh, nw, hw, hw, d)
    stitched = grid.permute(4, 0, 2, 1, 3).reshape(d, nh * hw, nw * hw)
    if merge == "spatial_maxpool2x2":
        ref = torch.nn.functional.max_pool2d(stitched, 2).permute(1, 2, 0).numpy()
    elif merge == "spatial_unpad":
        from hicom.mm_utils import unpad_image

        ref = unpad_image(stitched, image_size).permute(1, 2, 0).numpy()
    else:
        ref = stitched.permute(1, 2, 0).numpy()
    np.testing.assert_allclose(patch, ref, rtol=1e-6, atol=1e-6)


def test_anyres_max_downscale():
    from hicom_tpu.models.anyres import process_anyres_image_feature

    rng = np.random.default_rng(2)
    hw, d = 8, 4
    nh = nw = 3
    feats = rng.standard_normal((1 + nh * nw, hw, hw, d)).astype(np.float32)
    cfg = types.SimpleNamespace(
        mm_patch_merge_type="spatial_unpad",
        image_aspect_ratio="anyres_max_4",  # 3x3 grid exceeds 4 units → downscale
        image_grid_pinpoints="(1x1),...,(6x6)",
    )
    out = process_anyres_image_feature(jnp.asarray(feats), (3 * 384, 3 * 384), cfg, 384)
    h, w = out["patch"].shape[:2]
    assert h * w <= 4 * hw * hw * 1.3  # within the 1.1x tolerance band


def test_end_to_end_anyres_mm_infer(tmp_path):
    """Tiny HICom with anyres config: encode_anyres + generate from visual embeds."""
    from hicom_tpu.api import HICom
    from hicom_tpu.config import tiny_test_config
    from hicom_tpu.models.hicom import HIComModel

    cfg = tiny_test_config(
        image_aspect_ratio="anyres_max_4",
        mm_patch_merge_type="spatial_unpad",
        image_grid_pinpoints="(1x1),...,(3x3)",
        mm_newline_position="one_token",
    )
    model = HIComModel(config=cfg)
    rng = np.random.default_rng(0)
    img = cfg.vision_config.image_size
    crops = rng.standard_normal((5, 3, img, img)).astype(np.float32)  # base + 2x2 grid
    ids = rng.integers(5, cfg.text_config.vocab_size, (1, 8))
    ids[0, 1] = -200  # image sentinel
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(crops[None, :1]), modal="image")
    runtime = HICom(config=cfg, model=model, params=variables["params"],
                    eos_token_id=cfg.text_config.eos_token_id, cache_len=128)

    visual = runtime.encode_anyres(crops, (2 * img, 2 * img))
    assert visual.ndim == 2 and visual.shape[1] == cfg.text_config.hidden_size
    out = runtime.generate(ids, visual_embeds=visual[None], modal="image", max_new_tokens=4)
    assert out.shape == (1, 4)


def test_anyres_train_step_batched_matches_single():
    """The anyres TRAIN path (static plan, vmapped batch — hicom_arch.py:216-269
    trained by mlp2x_gelu_anyres.sh) produces per-row tokens identical to the
    per-sample eval path, and gradients flow to the projector."""
    from hicom_tpu.config import tiny_test_config
    from hicom_tpu.models.anyres import make_anyres_plan
    from hicom_tpu.models.hicom import HIComModel
    from hicom_tpu.train.train_step import make_loss_fn

    cfg = tiny_test_config(
        image_aspect_ratio="anyres_max_4",
        mm_patch_merge_type="spatial_unpad",
        image_grid_pinpoints="(1x1),...,(3x3)",
        mm_projector_type="mlp2x_gelu",
        mm_newline_position="one_token",
    )
    model = HIComModel(config=cfg)
    rng = np.random.default_rng(0)
    img = cfg.vision_config.image_size
    plan = make_anyres_plan((2 * img, 2 * img), cfg, img)
    assert plan is not None and (plan.nh, plan.nw) == (2, 2)
    n = plan.nh * plan.nw + 1
    frames = rng.standard_normal((2, n, 3, img, img)).astype(np.float32)
    L = 10
    ids = rng.integers(5, cfg.text_config.vocab_size, (2, L))
    ids[:, 1] = -200  # image sentinel
    labels = np.array(ids)
    labels[:, :3] = -100

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(frames),
                           modal="image", anyres_plan=plan)
    params = variables["params"]

    # forward: token count matches the plan
    logits, _, _ = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(frames),
                               modal="image", anyres_plan=plan)
    V = plan.token_count(has_newline=True)
    assert logits.shape[1] == L - 1 + V, (logits.shape, V)

    # parity: batched path row 0 == single-sample eval path
    single = model.apply({"params": params}, jnp.asarray(frames[0]), plan, None,
                         method=HIComModel.encode_visual_anyres_plan)
    sized = model.apply({"params": params}, jnp.asarray(frames[0]), (2 * img, 2 * img), None,
                        method=HIComModel.encode_visual_anyres)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sized), rtol=1e-6)

    # gradient flows through tower + projector under the plan
    loss_fn = make_loss_fn(model, modal="image", anyres_plan=plan)
    batch = {"input_ids": jnp.asarray(ids), "frames": jnp.asarray(frames),
             "labels": jnp.asarray(labels)}
    (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
    gproj = jax.tree.leaves(grads["mm_projector"])
    gtower = jax.tree.leaves(grads["vision_tower"])
    assert any(float(jnp.abs(g).max()) > 0 for g in gproj)
    assert any(float(jnp.abs(g).max()) > 0 for g in gtower)


def test_anyres_dataset_batches_group_by_plan(tmp_path):
    """iter_batches groups anyres image samples by merge plan (PIL-header
    geometry), so every batch carries exactly one static anyres_plan."""
    import json as _json

    from PIL import Image

    from hicom_tpu.data.processor import SiglipImagePreprocessor
    from hicom_tpu.train.dataset import Collator, DataArguments, SupervisedDataset, iter_batches

    pytest.importorskip("transformers")
    from tests.test_train_cli import write_tokenizer

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    rng = np.random.default_rng(0)
    # two geometry families: wide (2x1-ish) and square (2x2 grid)
    for i, (w, h) in enumerate([(160, 60), (160, 60), (100, 100), (100, 100)]):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(img_dir / f"{i}.png")
        rows.append({"image": f"{i}.png", "conversations": [
            {"from": "human", "value": "<image> describe the picture"},
            {"from": "gpt", "value": "a red cat"},
        ]})
    data_json = tmp_path / "data.json"
    data_json.write_text(_json.dumps(rows))
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    write_tokenizer(str(tok_dir))
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(str(tok_dir))
    args = DataArguments(
        data_path=[str(data_json)], data_folder=str(img_dir),
        image_aspect_ratio="anyres_max_4",
        # literal list: the "(1x1),...,(NxN)" range syntax asserts standard ViT
        # sizes (reference mm_utils.py:395), which a 56px test tower is not
        image_grid_pinpoints="[[56, 56], [56, 112], [112, 56], [112, 112]]",
        mm_patch_merge_type="spatial_unpad", image_size=56, patch_size=14,
    )
    ds = SupervisedDataset(tokenizer, args, SiglipImagePreprocessor(size=(56, 56)))
    assert ds._anyres_train
    plans = {ds.anyres_plan_of(i) for i in range(4)}
    assert len(plans) == 2, plans

    batches = list(iter_batches(ds, Collator(tokenizer, args), batch_size=2, seed=0))
    assert len(batches) == 2
    seen = set()
    for b in batches:
        assert "anyres_plan" in b and b["frames"].shape[0] == 2
        # crops padded to the batch plan's grid + base
        seen.add(b["anyres_plan"])
    assert len(seen) == 2
