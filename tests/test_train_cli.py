"""End-to-end trainer CLI test: tiny base LLM + tower + dataset → steps + ckpt."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

VIS = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
           num_attention_heads=4, image_size=56, patch_size=14)
TXT = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
           num_attention_heads=4, vocab_size=99, max_position_embeddings=16)
QWEN = dict(vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
            rope_theta=10000.0, tie_word_embeddings=False)


def write_tokenizer(dirpath):
    from tokenizers import Tokenizer, models as tok_models, pre_tokenizers

    vocab = {"<unk>": 0, "<pad>": 1, "</s>": 2}
    for i, w in enumerate(["describe", "the", "picture", "a", "red", "cat", "dog", "number",
                           "<image>", "<video>", "hi", "hello", "0", "1", "2", "3"]):
        vocab[w] = 3 + i
    tk = Tokenizer(tok_models.WordLevel(vocab, unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.Whitespace()
    tk.save(os.path.join(dirpath, "tokenizer.json"))
    with open(os.path.join(dirpath, "tokenizer_config.json"), "w") as f:
        json.dump({
            "tokenizer_class": "PreTrainedTokenizerFast",
            "unk_token": "<unk>", "pad_token": "<pad>", "eos_token": "</s>",
            "chat_template": "{% for m in messages %}{{ m['content'] }}\n{% endfor %}{% if add_generation_prompt %}ASSISTANT:{% endif %}",
        }, f)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("traincli")
    llm_dir = root / "qwen_tiny"
    tower_dir = root / "siglip_tiny"
    torch.manual_seed(0)
    transformers.Qwen2ForCausalLM(transformers.Qwen2Config(**QWEN)).save_pretrained(llm_dir)
    write_tokenizer(str(llm_dir))
    transformers.SiglipModel(
        transformers.SiglipConfig(
            vision_config=VIS, text_config=dict(projection_size=64, **TXT)
        )
    ).save_pretrained(tower_dir)

    from PIL import Image

    img_dir = root / "imgs"
    img_dir.mkdir()
    rows = []
    for i in range(8):
        Image.fromarray(np.random.default_rng(i).integers(0, 255, (30, 40, 3), dtype=np.uint8)).save(
            img_dir / f"{i}.png"
        )
        rows.append({"image": f"{i}.png", "conversations": [
            {"from": "human", "value": "<image> describe the picture"},
            {"from": "gpt", "value": f"a red cat number {i % 4}"},
        ]})
    data_json = root / "data.json"
    data_json.write_text(json.dumps(rows))
    return dict(root=root, llm=str(llm_dir), tower=str(tower_dir), data=str(data_json), imgs=str(img_dir))


def test_train_cli_two_stage(setup):
    from hicom_tpu.train.cli import main

    out1 = str(setup["root"] / "stage1")
    main([
        "--model-path", setup["llm"],
        "--vision-tower", setup["tower"],
        "--mm-projector-type", "local43_global32",
        "--mm-tunable-parts", "mm_projector",
        "--is-pretraining",
        "--data-path", setup["data"],
        "--data-folder", setup["imgs"],
        "--learning-rate", "1e-3",
        "--num-train-epochs", "1",
        "--per-device-train-batch-size", "1",
        "--dp", "8", "--fsdp", "1", "--tp", "1",
        "--output-dir", out1,
        "--dtype", "float32",
        "--save-steps", "10",
        "--logging-steps", "1",
        "--warmup-ratio", "0",
    ])
    assert os.path.exists(os.path.join(out1, "mm_projector.bin"))
    assert os.path.isdir(os.path.join(out1, "checkpoints"))

    # stage 2: resume projector weights from stage 1, train with 2D mesh
    out2 = str(setup["root"] / "stage2")
    main([
        "--model-path", setup["llm"],
        "--vision-tower", setup["tower"],
        "--mm-projector-type", "local43_global32",
        "--mm-tunable-parts", "mm_projector,language_model",
        "--pretrain-weights", os.path.join(out1, "mm_projector.bin"),
        "--data-path", setup["data"],
        "--data-folder", setup["imgs"],
        "--learning-rate", "1e-4",
        "--num-train-epochs", "1",
        "--per-device-train-batch-size", "1",
        "--dp", "2", "--fsdp", "2", "--tp", "2",
        "--output-dir", out2,
        "--dtype", "float32",
        "--save-steps", "10",
        "--logging-steps", "1",
        "--warmup-ratio", "0",
    ])
    assert os.path.isdir(os.path.join(out2, "checkpoints"))


def test_train_cli_qlora(setup):
    """--bits 4 + --lora-enable: NF4-frozen base, adapter-only training
    (reference train.py:567-587 kbit prep + 606-635 LoRA-over-quantized)."""
    import json as _json
    import os

    from hicom_tpu.train.cli import main

    out = str(setup["root"] / "qlora")
    main([
        "--model-path", setup["llm"],
        "--vision-tower", setup["tower"],
        "--mm-projector-type", "local43_global32",
        "--mm-tunable-parts", "language_model",
        "--lora-enable", "--lora-r", "4", "--lora-alpha", "8", "--bits", "4",
        "--data-path", setup["data"],
        "--data-folder", setup["imgs"],
        "--learning-rate", "1e-2",
        "--num-train-epochs", "2",
        "--per-device-train-batch-size", "1",
        "--dp", "8", "--fsdp", "1", "--tp", "1",
        "--output-dir", out,
        "--dtype", "float32",
        "--logging-steps", "1",
        "--warmup-ratio", "0",
    ])
    assert os.path.exists(os.path.join(out, "adapter_model.bin"))
    rows = [_json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert rows[-1]["loss"] < rows[0]["loss"], [r["loss"] for r in rows]


def test_train_cli_bits_requires_lora():
    import pytest as _pytest

    from hicom_tpu.train.cli import main

    with _pytest.raises(SystemExit):
        main(["--model-path", "x", "--data-path", "y", "--output-dir", "z", "--bits", "4"])


def test_train_cli_lora(setup):
    import os

    from hicom_tpu.train.cli import main

    out = str(setup["root"] / "lora")
    main([
        "--model-path", setup["llm"],
        "--vision-tower", setup["tower"],
        "--mm-projector-type", "local43_global32",
        "--mm-tunable-parts", "language_model",
        "--lora-enable", "--lora-r", "4", "--lora-alpha", "8",
        "--data-path", setup["data"],
        "--data-folder", setup["imgs"],
        "--learning-rate", "1e-3",
        "--num-train-epochs", "1",
        "--per-device-train-batch-size", "1",
        "--dp", "8", "--fsdp", "1", "--tp", "1",
        "--output-dir", out,
        "--dtype", "float32",
        "--logging-steps", "1",
        "--warmup-ratio", "0",
    ])
    assert os.path.exists(os.path.join(out, "adapter_model.bin"))
    assert os.path.exists(os.path.join(out, "adapter_config.json"))

    from hicom_tpu.train.lora import load_peft_adapter

    lora, alpha, rank = load_peft_adapter(out)
    assert rank == 4 and alpha == 8 and len(lora) > 0
