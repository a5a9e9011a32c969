"""Training data pipeline and checkpointing tests."""

import json
import os

import numpy as np
import pytest

from hicom_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX, VIDEO_TOKEN_INDEX
from hicom_tpu.train.dataset import (
    Collator,
    DataArguments,
    SupervisedDataset,
    load_mixture,
    modality_length_grouped_indices,
    preprocess_chat,
    preprocess_plain,
    split_guide_format,
)


class FakeTokenizer:
    """Word-level tokenizer with a simple chat template."""

    pad_token_id = 0

    def __call__(self, text, add_special_tokens=False):
        class R:
            pass

        r = R()
        r.input_ids = [hash(w) % 1000 + 10 for w in text.split()]
        return r

    def apply_chat_template(self, messages, tokenize=False, add_generation_prompt=False):
        s = ""
        for m in messages:
            s += f"<|{m['role']}|> {m['content']} <|end|> "
        if add_generation_prompt:
            s += "<|assistant|> "
        return s.strip()


def test_preprocess_plain_masks_modal_token():
    tok = FakeTokenizer()
    sources = [[{"from": "human", "value": "<image>"}, {"from": "gpt", "value": "a red cat"}]]
    ids, labels = preprocess_plain(sources, tok, "<image>")
    assert IMAGE_TOKEN_INDEX in ids[0]
    pos = list(ids[0]).index(IMAGE_TOKEN_INDEX)
    assert labels[0][pos] == IGNORE_INDEX
    assert (labels[0] != IGNORE_INDEX).sum() == 3  # caption supervised


def test_preprocess_chat_masks_instructions():
    tok = FakeTokenizer()
    sources = [[
        {"from": "human", "value": "<video>\nwhat happens ?"},
        {"from": "gpt", "value": "a dog runs"},
        {"from": "human", "value": "then ?"},
        {"from": "gpt", "value": "it jumps"},
    ]]
    ids, labels = preprocess_chat(sources, tok, "<video>")
    # both instructions masked, both answers (+ turn ends) supervised
    n_supervised = (labels[0] != IGNORE_INDEX).sum()
    assert n_supervised > 0
    assert labels[0][list(ids[0]).index(VIDEO_TOKEN_INDEX)] == IGNORE_INDEX

    # guided mode: only the last turn supervised
    ids_g, labels_g = preprocess_chat(sources, tok, "<video>", process_guided=True)
    assert (labels_g[0] != IGNORE_INDEX).sum() < n_supervised


def test_mixture_sampling(tmp_path):
    rows = [{"id": i, "conversations": []} for i in range(10)]
    j1 = tmp_path / "a.json"
    j1.write_text(json.dumps(rows))
    yml = tmp_path / "mix.yaml"
    yml.write_text(
        f"datasets:\n"
        f"  - json_path: {j1}\n    sampling_strategy: first:3\n"
        f"  - json_path: {j1}\n    sampling_strategy: end:2\n"
        f"  - json_path: {j1}\n    sampling_strategy: random:50%\n"
    )
    out = load_mixture([str(yml)])
    assert len(out) == 3 + 2 + 5
    assert [r["id"] for r in out[:3]] == [0, 1, 2]
    assert [r["id"] for r in out[3:5]] == [8, 9]


def test_guide_split():
    rows = [{
        "video": "v.mp4",
        "conversations": [
            {"from": "human", "value": "q1"},
            {"from": "gpt", "value": "a1"},
            {"from": "human", "value": "q2"},
            {"from": "gpt", "value": "a2"},
        ],
    }]
    out = split_guide_format(rows)
    assert len(out) == 2
    assert len(out[0]["conversations"]) == 2
    assert len(out[1]["conversations"]) == 4
    assert out[0]["conversations"][0]["value"].startswith("<video>")


def test_dataset_and_collator(tmp_path):
    from PIL import Image

    from hicom_tpu.data.processor import SiglipImagePreprocessor

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(3):
        Image.fromarray(np.random.default_rng(i).integers(0, 255, (30, 40, 3), dtype=np.uint8)).save(
            img_dir / f"{i}.png"
        )
    rows = [
        {"image": f"{i}.png", "conversations": [
            {"from": "human", "value": "<image>\ndescribe"},
            {"from": "gpt", "value": f"picture number {i}"},
        ]}
        for i in range(3)
    ] + [{"conversations": [{"from": "human", "value": "hi"}, {"from": "gpt", "value": "hello"}]}]
    jpath = tmp_path / "data.json"
    jpath.write_text(json.dumps(rows))

    args = DataArguments(data_path=[str(jpath)], data_folder=str(img_dir), image_size=56, length_bucket=16)
    proc = SiglipImagePreprocessor(size=(56, 56))
    ds = SupervisedDataset(FakeTokenizer(), args, proc)
    assert len(ds) == 4
    item = ds[0]
    assert item["frames"].shape == (1, 3, 56, 56)
    assert item["modal"] == "image"

    coll = Collator(FakeTokenizer(), args)
    batch = coll([ds[0], ds[1]])
    assert batch["input_ids"].shape[1] % 16 == 0
    assert batch["frames"].shape[0] == 2
    assert batch["attention_mask"].dtype == bool
    assert (batch["labels"][~batch["attention_mask"]] == IGNORE_INDEX).all()


def test_multi_image_dataset_collator_train(tmp_path):
    """A list under "image" with one <image> tag per turn → K single-image
    crops, K sentinels, collator emits (b, K, 3, H, W) + multi_image flag, and
    the train loss consumes the batch (reference train.py:420-439, 525-530)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from hicom_tpu.config import tiny_test_config
    from hicom_tpu.data.processor import SiglipImagePreprocessor
    from hicom_tpu.models.hicom import HIComModel
    from hicom_tpu.train.train_step import make_loss_fn

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(2):
        Image.fromarray(np.random.default_rng(i).integers(0, 255, (30, 40, 3), dtype=np.uint8)).save(
            img_dir / f"{i}.png"
        )
    rows = [
        {"image": ["0.png", "1.png"], "conversations": [
            {"from": "human", "value": "<image> first picture"},
            {"from": "gpt", "value": "ok"},
            {"from": "human", "value": "<image> compare with this"},
            {"from": "gpt", "value": "they differ"},
        ]},
        {"image": "0.png", "conversations": [
            {"from": "human", "value": "<image> describe"},
            {"from": "gpt", "value": "a picture"},
        ]},
    ]
    jpath = tmp_path / "data.json"
    jpath.write_text(json.dumps(rows))

    args = DataArguments(data_path=[str(jpath)], data_folder=str(img_dir), image_size=56, length_bucket=16)
    ds = SupervisedDataset(FakeTokenizer(), args, SiglipImagePreprocessor(size=(56, 56)))

    multi_item = ds[0]
    assert multi_item["num_images"] == 2
    assert multi_item["frames"].shape == (2, 3, 56, 56)
    assert (multi_item["input_ids"] == IMAGE_TOKEN_INDEX).sum() == 2

    coll = Collator(FakeTokenizer(), args)
    batch = coll([ds[0], ds[1]])
    assert batch["multi_image"] is True
    assert batch["frames"].shape == (2, 2, 3, 56, 56)
    # single-image-only batches keep the flag off
    assert coll([ds[1], ds[1]])["multi_image"] is False

    # the flagged batch drives the training loss end-to-end
    cfg = tiny_test_config()
    model = HIComModel(config=cfg)
    ids = np.where(batch["input_ids"] >= 0, batch["input_ids"] % cfg.text_config.vocab_size,
                   batch["input_ids"])
    labels = np.where(batch["labels"] >= 0, batch["labels"] % cfg.text_config.vocab_size,
                      batch["labels"])
    jbatch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.asarray(batch["attention_mask"]),
        "frames": jnp.asarray(batch["frames"]),
    }
    variables = HIComModel(config=cfg).init(
        jax.random.PRNGKey(0), jbatch["input_ids"], jbatch["frames"], modal="image", multi_image=True
    )
    loss_fn = make_loss_fn(model, modal="image", multi_image=True)
    loss, metrics = loss_fn(variables["params"], jbatch)
    assert np.isfinite(float(loss))
    assert int(metrics["target_tokens"]) > 0


def test_modality_grouped_indices():
    lengths = [10, -5, 8, -7, 12, -3]  # 3 image, 3 text
    order = modality_length_grouped_indices(lengths, batch_size=2, world_size=1, seed=0)
    assert sorted(order) == list(range(6))
    modal = ["img" if lengths[i] > 0 else "txt" for i in order]
    # groups are contiguous by modality
    assert modal in (["img"] * 3 + ["txt"] * 3, ["txt"] * 3 + ["img"] * 3)


def test_projector_bin_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from hicom_tpu.config import tiny_test_config
    from hicom_tpu.models.projector import HIComProjector
    from hicom_tpu.train.checkpoints import export_mm_projector_bin
    from hicom_tpu.weights import convert_projector_state, load_torch_bin

    cfg = tiny_test_config()
    model = HIComProjector(config=cfg)
    rng = np.random.default_rng(0)
    ff = jnp.asarray(rng.standard_normal((2, 4, 4, cfg.mm_hidden_size)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), ff, None, None, "video")
    params = {"mm_projector": variables["params"]}

    path = str(tmp_path / "mm_projector.bin")
    export_mm_projector_bin(params, path)
    restored = convert_projector_state(load_torch_bin(path))

    flat_a = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(restored)[0]
    assert len(flat_a) == len(flat_b)
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_allclose(np.asarray(va, np.float16), vb.astype(np.float16), rtol=1e-3, atol=1e-3)


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from hicom_tpu.train.checkpoints import restore_checkpoint, save_checkpoint
    from hicom_tpu.train.train_step import TrainState

    state = TrainState(
        params={"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
        opt_state={"mu": {"w": jnp.ones((2, 3))}},
        step=jnp.int32(7),
    )
    save_checkpoint(str(tmp_path), state, step=7)
    restored = restore_checkpoint(str(tmp_path), state)
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.asarray(state.params["w"]))
    assert int(restored.step) == 7


def test_hf_checkpoint_export_roundtrip(tmp_path):
    """Export params as a reference-layout SFT checkpoint → load_model → same logits."""
    import jax
    import jax.numpy as jnp

    from hicom_tpu.config import tiny_test_config
    from hicom_tpu.constants import VIDEO_TOKEN_INDEX
    from hicom_tpu.models.hicom import HIComModel
    from hicom_tpu.weights import export_hf_checkpoint
    from hicom_tpu.api import load_model
    import json, os

    cfg = tiny_test_config(use_guide="direct")
    model = HIComModel(config=cfg)
    rng = np.random.default_rng(0)
    img = cfg.vision_config.image_size
    frames = jnp.asarray(rng.standard_normal((1, 2, 3, img, img)).astype(np.float32))
    ids = rng.integers(5, cfg.text_config.vocab_size, (1, 8))
    ids[0, 1] = VIDEO_TOKEN_INDEX
    gids = jnp.asarray(rng.integers(1, cfg.guide_text_config.vocab_size, (1, 8)))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), frames, guide_ids=gids, modal="video")
    params = variables["params"]
    ref_logits, _, _ = model.apply({"params": params}, jnp.asarray(ids), frames, guide_ids=gids, modal="video")

    out = tmp_path / "export"
    export_hf_checkpoint(dict(params), cfg, str(out), dtype="float32")
    # tower config dir so load_model can reconstruct vision/guide configs
    import dataclasses
    tower_dir = tmp_path / "tower"
    tower_dir.mkdir()
    with open(tower_dir / "config.json", "w") as f:
        json.dump({"model_type": "siglip",
                   "vision_config": dataclasses.asdict(cfg.vision_config),
                   "text_config": dataclasses.asdict(cfg.guide_text_config)}, f)
    # point the exported config at the tower dir
    with open(out / "config.json") as f:
        d = json.load(f)
    d["mm_vision_tower"] = str(tower_dir)
    with open(out / "config.json", "w") as f:
        json.dump(d, f)

    runtime = load_model(str(out), dtype="float32", cache_len=64)
    got_logits, _, _ = runtime.model.apply(
        {"params": runtime.params}, jnp.asarray(ids), frames, guide_ids=gids, modal="video"
    )
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4)


def test_multihost_batch_slicing(tmp_path):
    """Two simulated hosts walking the same seed yield complementary slices of
    each global batch with host-independent shapes (multi-host data loading)."""
    from PIL import Image

    from hicom_tpu.data.processor import SiglipImagePreprocessor
    from hicom_tpu.train.dataset import iter_batches

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(8):
        Image.fromarray(np.random.default_rng(i).integers(0, 255, (20, 20, 3), dtype=np.uint8)).save(
            img_dir / f"{i}.png"
        )
    rows = [
        {"image": f"{i}.png", "conversations": [
            {"from": "human", "value": f"<image>\nquestion {i} " + "pad " * (i % 3)},
            {"from": "gpt", "value": f"answer {i}"},
        ]}
        for i in range(8)
    ]
    jpath = tmp_path / "data.json"
    jpath.write_text(json.dumps(rows))
    args = DataArguments(data_path=[str(jpath)], data_folder=str(img_dir),
                         image_size=28, length_bucket=8, model_max_length=64)
    proc = SiglipImagePreprocessor(size=(28, 28))
    ds = SupervisedDataset(FakeTokenizer(), args, proc)

    def collect(pi, pc):
        coll = Collator(FakeTokenizer(), args, fixed_length=32, fixed_frames=1)
        return list(iter_batches(ds, coll, batch_size=4, seed=1,
                                 process_index=pi, process_count=pc))

    full = collect(0, 1)
    h0 = collect(0, 2)
    h1 = collect(1, 2)
    assert len(full) == len(h0) == len(h1) == 2
    for bf, b0, b1 in zip(full, h0, h1):
        assert b0["input_ids"].shape == b1["input_ids"].shape == (2, 32)
        assert b0["frames"].shape == b1["frames"].shape
        np.testing.assert_array_equal(np.concatenate([b0["input_ids"], b1["input_ids"]]),
                                      bf["input_ids"])
        np.testing.assert_array_equal(np.concatenate([b0["frames"], b1["frames"]]),
                                      bf["frames"])


def test_hf_export_unstacks_scan_layers(tmp_path):
    """Exporting a scan-layers (stacked) state writes per-layer reference keys,
    identical to exporting the unstacked params."""
    import jax

    from hicom_tpu.config import tiny_test_config
    from hicom_tpu.models.hicom import HIComModel
    from hicom_tpu.weights import export_hf_checkpoint, load_safetensors, stack_decoder_layers

    cfg = tiny_test_config()
    rng = np.random.default_rng(0)
    img = cfg.vision_config.image_size
    ids = rng.integers(5, cfg.text_config.vocab_size, (1, 6))
    import jax.numpy as jnp
    frames = jnp.asarray(rng.standard_normal((1, 2, 3, img, img)).astype(np.float32))
    params = dict(HIComModel(config=cfg).init(
        jax.random.PRNGKey(0), jnp.asarray(ids), frames, modal="video")["params"])

    export_hf_checkpoint(params, cfg, str(tmp_path / "flat"), dtype="float32")
    stacked = dict(params)
    stacked["language_model"] = stack_decoder_layers(params["language_model"])
    export_hf_checkpoint(stacked, cfg, str(tmp_path / "stacked"), dtype="float32")

    a = load_safetensors(str(tmp_path / "flat" / "model.safetensors"))
    b = load_safetensors(str(tmp_path / "stacked" / "model.safetensors"))
    assert set(a) == set(b)
    assert any(".layers.0." in k for k in b)
    assert not any(".layers.layer." in k for k in b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_clip_tower_export_roundtrip(tmp_path):
    """CLIP-tower SFT export reloads through the api's key extraction with
    identical params (the siglip-only key fixer used to scramble clip keys)."""
    import jax
    import jax.numpy as jnp

    from hicom_tpu.config import HIComConfig, tiny_test_config
    from hicom_tpu.models.clip import ClipTextConfig, ClipVisionConfig
    from hicom_tpu.models.hicom import HIComModel
    from hicom_tpu.weights import (
        assert_tree_match, convert_clip_text, convert_clip_vision, convert_decoder,
        export_hf_checkpoint, load_safetensors,
    )

    VIS = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
               num_attention_heads=4, image_size=56, patch_size=14, projection_dim=48)
    TXT = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
               num_attention_heads=4, vocab_size=99, max_position_embeddings=16,
               projection_dim=48)
    tiny = tiny_test_config()
    cfg = HIComConfig(
        text_config=tiny.text_config,
        vision_config=ClipVisionConfig(**VIS),
        guide_text_config=ClipTextConfig(**TXT),
        mm_vision_tower="clip-vit-large-patch14-336",
        mm_projector_type="local43_global8",
        use_guide="direct",
        projector_qk_dim=48,
        dtype="float32",
    )
    model = HIComModel(config=cfg)
    rng = np.random.default_rng(1)
    ids = rng.integers(5, cfg.text_config.vocab_size, (1, 8))
    frames = jnp.asarray(rng.standard_normal((1, 2, 3, 56, 56)).astype(np.float32))
    gids = jnp.asarray(rng.integers(0, 99, (1, 12)))
    params = dict(model.init(jax.random.PRNGKey(0), jnp.asarray(ids), frames,
                             guide_ids=gids, modal="video")["params"])

    export_hf_checkpoint(params, cfg, str(tmp_path), dtype="float32")
    sd = load_safetensors(str(tmp_path / "model.safetensors"))
    # replicate api.load_model's SFT extraction
    tower_sd = {}
    for k, v in sd.items():
        if k.startswith("model.vision_tower.vision_tower."):
            tower_sd[k[len("model.vision_tower.vision_tower."):]] = v
        elif k.startswith("model.vision_tower.guide_encoder."):
            tower_sd[k[len("model.vision_tower.guide_encoder."):]] = v
    assert tower_sd, "no tower keys exported"
    vt = convert_clip_vision(tower_sd)
    ge = convert_clip_text(tower_sd)
    assert_tree_match(params["vision_tower"], vt)
    assert_tree_match(params["guide_encoder"], ge)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params["vision_tower"])[0],
        jax.tree_util.tree_flatten_with_path(vt)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(ka))


def test_preprocess_parity_with_reference():
    """Exact input_ids/labels parity with the reference's preprocess /
    preprocess_plain / preprocess_multimodal (train.py:159-262) using the same
    word-level chat-template tokenizer on both sides."""
    import copy

    from tests.reference_loader import load_reference_train

    from hicom_tpu.train.dataset import normalize_modal_tag, preprocess_chat, preprocess_plain

    ref_train = load_reference_train()
    tok = FakeTokenizer()

    # plain (pretrain): modal token + caption
    plain_src = [[{"from": "human", "value": "<image>"},
                  {"from": "gpt", "value": "a red cat sits"}]]
    ours_ids, ours_labels = preprocess_plain(copy.deepcopy(plain_src), tok, "<image>")
    theirs = ref_train.preprocess_plain(copy.deepcopy(plain_src), tok, "<image>")
    np.testing.assert_array_equal(ours_ids[0], theirs["input_ids"][0].numpy())
    np.testing.assert_array_equal(ours_labels[0], theirs["labels"][0].numpy())

    # chat: multi-turn with modal token, both guided and unguided masking
    chat_src = [[
        {"from": "human", "value": "<video>\nwhat happens in the clip ?"},
        {"from": "gpt", "value": "a dog runs across the yard"},
        {"from": "human", "value": "and then ?"},
        {"from": "gpt", "value": "it jumps over the fence"},
    ]]
    for guided in (False, True):
        ours_ids, ours_labels = preprocess_chat(
            copy.deepcopy(chat_src), tok, "<video>", process_guided=guided)
        theirs = ref_train.preprocess(
            copy.deepcopy(chat_src), tok, "<video>", process_guided=guided)
        np.testing.assert_array_equal(
            ours_ids[0], theirs["input_ids"][0].numpy(), err_msg=f"ids guided={guided}")
        np.testing.assert_array_equal(
            ours_labels[0], theirs["labels"][0].numpy(), err_msg=f"labels guided={guided}")

    # leading non-human turn is skipped (reference train.py:201-203)
    skew_src = [[{"from": "gpt", "value": "stray"}] + copy.deepcopy(chat_src[0])]
    ours_ids, ours_labels = preprocess_chat(copy.deepcopy(skew_src), tok, "<video>")
    theirs = ref_train.preprocess(copy.deepcopy(skew_src), tok, "<video>")
    np.testing.assert_array_equal(ours_ids[0], theirs["input_ids"][0].numpy())
    np.testing.assert_array_equal(ours_labels[0], theirs["labels"][0].numpy())

    # preprocess_multimodal: tag moved to head + newline normalization
    mm_src = [[{"from": "human", "value": "tell me about <video> please"},
               {"from": "gpt", "value": "ok"}]]

    class DA:
        is_multimodal = True

    theirs_mm = ref_train.preprocess_multimodal(copy.deepcopy(mm_src), DA(), "<video>")
    ours_mm = normalize_modal_tag(copy.deepcopy(mm_src), "<video>")
    assert ours_mm == theirs_mm
