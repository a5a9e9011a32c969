"""Full-stack API test: reference-format checkpoint on disk → model_init → mm_infer."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VIS = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
           num_attention_heads=4, image_size=56, patch_size=14)
TXT = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
           num_attention_heads=4, vocab_size=99, max_position_embeddings=16, projection_size=64)
QWEN = dict(vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
            rope_theta=10000.0, tie_word_embeddings=False)


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """Builds an SFT-layout checkpoint with reference key naming."""
    root = tmp_path_factory.mktemp("ckpt")
    tower_dir = root / "siglip-so400m-patch14-384"  # name keyed for geometry only
    ckpt_dir = root / "HICom_tiny_sft"
    tower_dir.mkdir()
    ckpt_dir.mkdir()

    # tower dir: config.json for vision/text config resolution + a tiny guide
    # tokenizer so guide-enabled eval paths work offline
    with open(tower_dir / "config.json", "w") as f:
        json.dump({"model_type": "siglip", "vision_config": VIS, "text_config": TXT}, f)
    from tokenizers import Tokenizer as _Tk, models as _tm, pre_tokenizers as _pt

    gvocab = {"<unk>": 0, "<pad>": 1, "</s>": 2}
    for gi, gw in enumerate(["what", "is", "in", "the", "video", "image", "color", "?", "a", "cat"]):
        gvocab[gw] = 3 + gi
    gtk = _Tk(_tm.WordLevel(gvocab, unk_token="<unk>"))
    gtk.pre_tokenizer = _pt.Whitespace()
    gtk.save(str(tower_dir / "tokenizer.json"))
    with open(tower_dir / "tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast", "unk_token": "<unk>",
                   "pad_token": "<pad>", "eos_token": "</s>", "model_max_length": 16}, f)

    torch.manual_seed(0)
    hf_llm = transformers.Qwen2ForCausalLM(transformers.Qwen2Config(**QWEN)).eval()
    hf_vis = transformers.SiglipVisionModel(transformers.SiglipVisionConfig(**VIS)).eval()
    hf_txt = transformers.SiglipTextModel(transformers.SiglipTextConfig(**TXT)).eval()

    # Projector weights are synthesized from our flax module and saved under
    # reference naming (torch↔flax round-trip itself is covered by the
    # projector parity tests, which use the reference's real dims).
    import jax
    import jax.numpy as jnp

    from hicom_tpu.config import HIComConfig, Qwen2Config, SiglipTextConfig, SiglipVisionConfig
    from hicom_tpu.models.projector import HIComProjector

    jcfg = HIComConfig(
        text_config=Qwen2Config(**{k: v for k, v in QWEN.items() if k != "tie_word_embeddings"}, head_dim=16),
        vision_config=SiglipVisionConfig(**VIS),
        guide_text_config=SiglipTextConfig(**TXT),
        mm_vision_tower=str(tower_dir),
        mm_projector_type="local43_global32",
        use_guide="direct",
        num_frames=4,
        dtype="float32",
    )
    jproj = HIComProjector(config=jcfg)
    rng = np.random.default_rng(0)
    ff = jnp.asarray(rng.standard_normal((2, 4, 4, VIS["hidden_size"])).astype(np.float32))
    ge = jnp.asarray(rng.standard_normal((TXT["projection_size"],)).astype(np.float32))
    jvars = jproj.init(jax.random.PRNGKey(7), ff, ff, ge, "video")

    def flax_to_torch(tree, prefix):
        out = {}
        for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]:
            path = [str(getattr(p, "key", getattr(p, "name", p))) for p in k]
            leaf = path[-1]
            arr = torch.from_numpy(np.asarray(v))
            name = ".".join(path[:-1])
            if leaf == "kernel":
                out[f"{prefix}{name}.weight"] = arr.T.contiguous()
            elif leaf == "scale":
                out[f"{prefix}{name}.weight"] = arr
            elif leaf == "bias":
                out[f"{prefix}{name}.bias"] = arr
            else:
                out[f"{prefix}{name}.{leaf}" if name else f"{prefix}{leaf}"] = arr
        return out

    sd = {}
    sd.update({k: v for k, v in hf_llm.state_dict().items()})
    sd.update({f"model.vision_tower.vision_tower.{k}": v for k, v in hf_vis.state_dict().items()})
    sd.update({f"model.vision_tower.guide_encoder.{k}": v for k, v in hf_txt.state_dict().items()})
    sd.update(flax_to_torch(jvars["params"], "model.mm_projector."))

    from safetensors.torch import save_file

    save_file({k: v.contiguous() for k, v in sd.items()}, str(ckpt_dir / "model.safetensors"))

    cfg_json = dict(
        model_type="hicom_qwen2",
        **{k: v for k, v in QWEN.items()},
        head_dim=16,
        eos_token_id=2,
        pad_token_id=0,
        mm_vision_tower=str(tower_dir),
        mm_projector_type="local43_global32",
        mm_vision_select_layer=-2,
        use_guide="direct",
        num_frames=4,
        mm_hidden_size=VIS["hidden_size"],
    )
    with open(ckpt_dir / "config.json", "w") as f:
        json.dump(cfg_json, f)

    # tiny word-level tokenizer with a chat template
    from tokenizers import Tokenizer, models as tok_models, pre_tokenizers

    vocab = {"<unk>": 0, "<pad>": 1, "</s>": 2}
    for i, w in enumerate(["what", "is", "in", "the", "video", "?", "a", "cat", "USER:", "ASSISTANT:", "<video>"]):
        vocab[w] = 3 + i
    tk = Tokenizer(tok_models.WordLevel(vocab, unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.Whitespace()
    tk.save(str(ckpt_dir / "tokenizer.json"))
    with open(ckpt_dir / "tokenizer_config.json", "w") as f:
        json.dump({
            "tokenizer_class": "PreTrainedTokenizerFast",
            "unk_token": "<unk>", "pad_token": "<pad>", "eos_token": "</s>",
            "chat_template": "{% for m in messages %}{{ m['content'] }}\n{% endfor %}{% if add_generation_prompt %}ASSISTANT:{% endif %}",
        }, f)
    return str(ckpt_dir)


def test_model_init_and_mm_infer(checkpoint):
    from hicom_tpu.api import mm_infer, model_init

    model, processor, tokenizer = model_init(checkpoint, dtype="float32", cache_len=256)
    assert model.config.use_guide == "direct"
    assert "video" in processor and "image" in processor

    rng = np.random.default_rng(0)
    video = rng.standard_normal((4, 3, 56, 56)).astype(np.float32)
    guide_ids = rng.integers(1, TXT["vocab_size"], (1, 16))
    out = mm_infer(
        video, "what is in the video ?", model, tokenizer,
        modal="video", guide_ids=guide_ids, max_new_tokens=6,
    )
    assert isinstance(out, str)


def test_processor_pipeline(checkpoint, tmp_path):
    from PIL import Image

    from hicom_tpu.api import model_init

    model, processor, tokenizer = model_init(checkpoint, dtype="float32", cache_len=256)
    img_path = tmp_path / "img.png"
    Image.fromarray(np.random.default_rng(1).integers(0, 255, (40, 64, 3), dtype=np.uint8)).save(img_path)
    pixels, sizes = processor["image"](str(img_path))
    assert pixels.shape == (1, 3, 56, 56)
    assert sizes == [(64, 40)]

    # video from ndarray frames
    frames = np.random.default_rng(2).integers(0, 255, (6, 32, 32, 3), dtype=np.uint8)
    vid = processor["video"](frames)
    assert vid.shape[1:] == (3, 56, 56)


def test_model_init_device_preprocess(checkpoint):
    """model_init(device_preprocess=True) swaps the video processor for the
    on-chip pad+resize+normalize (ops/preprocess.py): same pixels as the host
    path within PIL's 8.8 fixed-point noise, and mm_infer runs end to end on
    raw uint8 frames."""
    from hicom_tpu.api import mm_infer, model_init
    from hicom_tpu.ops.preprocess import DeviceSiglipPreprocessor

    model, proc_host, tokenizer = model_init(checkpoint, dtype="float32", cache_len=256)
    model_d, proc_dev, _ = model_init(checkpoint, dtype="float32", cache_len=256,
                                      device_preprocess=True)
    assert isinstance(proc_dev["video"].keywords["processor"], DeviceSiglipPreprocessor)

    frames = np.random.default_rng(3).integers(0, 255, (4, 40, 64, 3), dtype=np.uint8)
    host_px = np.asarray(proc_host["video"](frames))
    dev_px = np.asarray(proc_dev["video"](frames))
    assert dev_px.shape == host_px.shape
    assert np.abs(dev_px - host_px).max() <= 2.1 / 255 / 0.5

    gids = np.random.default_rng(4).integers(1, TXT["vocab_size"], (1, 16))
    out = mm_infer(proc_dev["video"](frames), "what is in the video ?", model_d,
                   tokenizer, modal="video", guide_ids=gids, max_new_tokens=4)
    assert isinstance(out, str)


def test_mm_infer_batch_matches_single(checkpoint):
    from hicom_tpu.api import mm_infer, mm_infer_batch, model_init

    model, processor, tokenizer = model_init(checkpoint, dtype="float32", cache_len=256)
    rng = np.random.default_rng(3)
    vids = [rng.standard_normal((4, 3, 56, 56)).astype(np.float32) for _ in range(2)]
    instructs = ["what is in the video ?", "describe the video a cat"]
    gids = rng.integers(1, TXT["vocab_size"], (2, 16))

    batched = mm_infer_batch(vids, instructs, model, tokenizer, modal="video",
                             guide_ids=gids, max_new_tokens=5)
    # guide path: pass precomputed ids through single-sample calls
    singles = []
    for v, q, g in zip(vids, instructs, gids):
        singles.append(mm_infer(v, q, model, tokenizer, modal="video",
                                guide_ids=g[None], max_new_tokens=5))
    assert isinstance(batched, list) and len(batched) == 2
    assert all(isinstance(s, str) for s in batched + singles)


def test_mm_serve_matches_mm_infer(checkpoint):
    """Continuous-batching string API: responses equal per-request mm_infer
    (greedy) for mixed video/text requests sharing 2 slots."""
    from hicom_tpu.api import mm_infer, mm_serve, model_init

    model, processor, tokenizer = model_init(checkpoint, dtype="float32", cache_len=256)
    rng = np.random.default_rng(7)
    vids = [rng.standard_normal((4, 3, 56, 56)).astype(np.float32) for _ in range(2)]
    gids = rng.integers(1, TXT["vocab_size"], (2, 16))
    samples = [
        {"tensor": vids[0], "instruct": "what is in the video ?", "guide_ids": gids[0]},
        {"modal": "text", "instruct": "describe a cat"},
        {"tensor": vids[1], "instruct": "what color ?", "guide_ids": gids[1]},
    ]
    served = mm_serve(samples, model, tokenizer, modal="video", n_slots=2,
                      cache_len=256, sync_steps=3, prompt_buckets=(32, 64),
                      max_new_tokens=6)
    spec = mm_serve(samples, model, tokenizer, modal="video", n_slots=2,
                    cache_len=256, sync_steps=3, prompt_buckets=(32, 64),
                    max_new_tokens=6, spec_k=3)
    assert spec == served  # speculative serving: same strings
    singles = [
        mm_infer(vids[0], "what is in the video ?", model, tokenizer,
                 modal="video", guide_ids=gids[0][None], max_new_tokens=6),
        mm_infer(None, "describe a cat", model, tokenizer, modal="text",
                 max_new_tokens=6),
        mm_infer(vids[1], "what color ?", model, tokenizer,
                 modal="video", guide_ids=gids[1][None], max_new_tokens=6),
    ]
    assert served == singles


def test_eval_runner_image_vqa_end_to_end(checkpoint, tmp_path):
    """Drive the eval runner CLI on the tiny checkpoint (image VQA benchmark)."""
    from PIL import Image

    from hicom_tpu.eval import runner

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(5)
    questions = []
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)).save(img_dir / f"q{i}.png")
        questions.append({"question_id": i, "image": f"q{i}.png",
                          "text": "what color ?\nAnswer the question using a single word or phrase."})
    qfile = tmp_path / "questions.jsonl"
    qfile.write_text("\n".join(json.dumps(q) for q in questions))
    afile = tmp_path / "answers.jsonl"

    runner.main([
        "--benchmark", "image_vqa", "--sub-benchmark", "pope",
        "--model-path", checkpoint,
        "--image-folder", str(img_dir),
        "--question-file", str(qfile),
        "--answer-file", str(afile),
        "--dtype", "float32",
        "--max-new-tokens", "4",
    ])
    rows = [json.loads(line) for line in open(afile)]
    assert len(rows) == 2
    assert {r["question_id"] for r in rows} == {0, 1}
    assert all("text" in r and "answer_id" in r for r in rows)

    # idempotency guardrail
    runner.main([
        "--benchmark", "image_vqa", "--sub-benchmark", "pope",
        "--model-path", checkpoint,
        "--image-folder", str(img_dir),
        "--question-file", str(qfile),
        "--answer-file", str(afile),
        "--dtype", "float32", "--skip-existing",
    ])


def test_mm_infer_long_video_sequence_parallel(checkpoint, monkeypatch):
    """HICOM_SEQ_PARALLEL=1 routes video encode through the sharded path and
    produces the same text as the single-pass path (8 virtual devices)."""
    import jax

    from hicom_tpu.api import mm_infer, model_init

    assert len(jax.devices()) == 8
    model, _, tokenizer = model_init(checkpoint, dtype="float32", cache_len=256)
    rng = np.random.default_rng(1)
    video = rng.standard_normal((32, 3, 56, 56)).astype(np.float32)  # 8 dev x 4, T=4
    guide_ids = rng.integers(1, TXT["vocab_size"], (1, 16))

    monkeypatch.setenv("HICOM_SEQ_PARALLEL", "0")
    ref = mm_infer(video, "what is in the video ?", model, tokenizer,
                   modal="video", guide_ids=guide_ids, max_new_tokens=6)
    monkeypatch.setenv("HICOM_SEQ_PARALLEL", "1")
    got = mm_infer(video, "what is in the video ?", model, tokenizer,
                   modal="video", guide_ids=guide_ids, max_new_tokens=6)
    assert got == ref


def test_mm_infer_int8_kv_cache(checkpoint):
    """kv_cache_int8=True flows through model_init → generate and matches the
    fp32-cache output on the tiny model."""
    from hicom_tpu.api import mm_infer, model_init

    rng = np.random.default_rng(2)
    video = rng.standard_normal((4, 3, 56, 56)).astype(np.float32)
    guide_ids = rng.integers(1, TXT["vocab_size"], (1, 16))

    model, _, tokenizer = model_init(checkpoint, dtype="float32", cache_len=256)
    ref = mm_infer(video, "what color ?", model, tokenizer, modal="video",
                   guide_ids=guide_ids, max_new_tokens=6)
    model_q, _, tokenizer = model_init(checkpoint, dtype="float32", cache_len=256,
                                       kv_cache_int8=True)
    got = mm_infer(video, "what color ?", model_q, tokenizer, modal="video",
                   guide_ids=guide_ids, max_new_tokens=6)
    assert got == ref


def test_mm_infer_batch_data_parallel_mesh(checkpoint):
    """shard_for_eval: batched generation sharded over the 8-device mesh
    produces the same texts as the unsharded path."""
    import jax

    from hicom_tpu.api import mm_infer_batch, model_init

    assert len(jax.devices()) == 8
    rng = np.random.default_rng(3)
    videos = [rng.standard_normal((4, 3, 56, 56)).astype(np.float32) for _ in range(8)]
    questions = [f"what is in the video {i} ?" for i in range(8)]
    gids = rng.integers(1, TXT["vocab_size"], (8, 16))

    model, _, tokenizer = model_init(checkpoint, dtype="float32", cache_len=256)
    ref = mm_infer_batch(videos, questions, model, tokenizer, modal="video",
                         guide_ids=gids, max_new_tokens=5)
    mesh = model.shard_for_eval()
    assert mesh.devices.size == 8
    got = mm_infer_batch(videos, questions, model, tokenizer, modal="video",
                         guide_ids=gids, max_new_tokens=5)
    assert got == ref


def test_generate_auto_grows_cache(checkpoint):
    """Prompts longer than cache_len no longer crash: the cache auto-sizes
    from the spliced length (long-video headroom)."""
    from hicom_tpu.api import mm_infer, model_init

    model, _, tokenizer = model_init(checkpoint, dtype="float32", cache_len=64)
    rng = np.random.default_rng(4)
    video = rng.standard_normal((4, 3, 56, 56)).astype(np.float32)
    guide_ids = rng.integers(1, TXT["vocab_size"], (1, 16))
    # visual tokens (local43+global32 on 4f) + prompt easily exceed 64 slots
    out = mm_infer(video, "tell me everything about the video " * 4, model, tokenizer,
                   modal="video", guide_ids=guide_ids, max_new_tokens=4)
    assert isinstance(out, str)


def test_load_w8a8s_tower_and_calibrate(checkpoint):
    """Static-quant tower serving path: load_model(load_w8a8_tower=mode) maps
    the checkpoint's fp tower to the w8a8s layout (act_scale params at 1.0),
    HICom.calibrate_tower fills the scales from a representative clip, and
    mm_infer then runs the quantized tower end to end."""
    import jax

    from hicom_tpu.api import mm_infer, model_init

    hc, processor, tokenizer = model_init(checkpoint, dtype="float32", cache_len=256,
                                          load_w8a8_tower="w8a8s_mlp_qkv")
    assert hc.config.vision_config.quantization == "w8a8s_mlp_qkv"
    ones = [p for p, v in jax.tree_util.tree_leaves_with_path(hc.params["vision_tower"])
            if "act_scale" in str(p)]
    assert ones, "static mode must create act_scale params"

    rng = np.random.default_rng(7)
    video = rng.standard_normal((1, 4, 3, 56, 56)).astype(np.float32)
    gids = rng.integers(1, TXT["vocab_size"], (1, 16))
    hc.calibrate_tower(video, guide_ids=gids)
    for p, v in jax.tree_util.tree_leaves_with_path(hc.params["vision_tower"]):
        if "act_scale" in str(p):
            assert not np.allclose(np.asarray(v), 1.0), p

    out = mm_infer(video[0], "what is in the video ?", hc, tokenizer,
                   modal="video", guide_ids=gids, max_new_tokens=4)
    assert isinstance(out, str)


def test_load_w8a8s_decoder_autocalibrates(checkpoint):
    """Static-quant DECODER serving path (VERDICT r4 next-1): load_model(
    dec_quant="w8a8s") maps the fp decoder to the int8+act_scale layout and
    keeps pruned fp kernels for the SmoothQuant refit; the first multimodal
    generate auto-calibrates (act_scale != 1.0, fp copies freed) and decoding
    agrees with the fp model's greedy tokens on the tiny checkpoint."""
    import jax

    from hicom_tpu.api import mm_infer, model_init

    hc, processor, tokenizer = model_init(checkpoint, dtype="float32", cache_len=256,
                                          dec_quant="w8a8s")
    assert hc.config.text_config.quantization == "w8a8s"
    assert hc._fp_dec_kernels is not None
    scales = [v for p, v in jax.tree_util.tree_leaves_with_path(hc.params["language_model"])
              if "act_scale" in str(p)]
    assert scales and all(np.allclose(np.asarray(v), 1.0) for v in scales)

    fp_model, _, _ = model_init(checkpoint, dtype="float32", cache_len=256)
    rng = np.random.default_rng(9)
    video = rng.standard_normal((4, 3, 56, 56)).astype(np.float32)
    gids = rng.integers(1, TXT["vocab_size"], (1, 16))
    out = mm_infer(video, "what is in the video ?", hc, tokenizer,
                   modal="video", guide_ids=gids, max_new_tokens=6)
    assert hc._dec_calibrated and hc._fp_dec_kernels is None
    for p, v in jax.tree_util.tree_leaves_with_path(hc.params["language_model"]):
        if "act_scale" in str(p):
            assert not np.allclose(np.asarray(v), 1.0), p
    ref = mm_infer(video, "what is in the video ?", fp_model, tokenizer,
                   modal="video", guide_ids=gids, max_new_tokens=6)
    assert out == ref, (out, ref)


def test_mm_infer_spec_decode_parity(checkpoint, monkeypatch):
    """HICOM_SPEC_DECODE routes mm_infer through the speculative loop with
    identical greedy output text."""
    from hicom_tpu.api import mm_infer, model_init

    model, processor, tokenizer = model_init(checkpoint, dtype="float32", cache_len=256)
    rng = np.random.default_rng(5)
    video = rng.standard_normal((4, 3, 56, 56)).astype(np.float32)
    guide_ids = rng.integers(1, TXT["vocab_size"], (1, 16))
    base = mm_infer(video, "describe the video .", model, tokenizer,
                    modal="video", guide_ids=guide_ids, max_new_tokens=12)
    monkeypatch.setenv("HICOM_SPEC_DECODE", "4")
    spec = mm_infer(video, "describe the video .", model, tokenizer,
                    modal="video", guide_ids=guide_ids, max_new_tokens=12)
    assert spec == base
