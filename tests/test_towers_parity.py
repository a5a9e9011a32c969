"""Parity tests: flax SigLIP / Qwen2 vs randomly-initialized HF torch models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from hicom_tpu import config as hcfg
from hicom_tpu.models.qwen2 import KVCache, Qwen2ForCausalLM
from hicom_tpu.models.siglip import SiglipTextEncoder, SiglipVisionTower
from hicom_tpu.weights import assert_tree_match, convert_decoder, convert_siglip_text, convert_siglip_vision

VIS = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=3,
           num_attention_heads=4, image_size=56, patch_size=14)
TXT = dict(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
           num_attention_heads=4, vocab_size=99, max_position_embeddings=16)


def test_siglip_vision_parity():
    hf_cfg = transformers.SiglipVisionConfig(**VIS)
    torch.manual_seed(0)
    hf = transformers.SiglipVisionModel(hf_cfg).eval()

    pixels = np.random.default_rng(0).uniform(-1, 1, (2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(pixels), output_hidden_states=True)
    ref_feat = out.hidden_states[-2].numpy().reshape(2, 4, 4, 64)
    last = out.last_hidden_state
    with torch.no_grad():
        embeds = (last + hf.vision_model.head.mlp(hf.vision_model.head.layernorm(last))).numpy().reshape(2, 4, 4, 64)

    cfg = hcfg.SiglipVisionConfig(**VIS)
    model = SiglipVisionTower(config=cfg, select_layer=-2)
    params = convert_siglip_vision({k: v.numpy() for k, v in hf.state_dict().items()})
    expected = model.init(jax.random.PRNGKey(0), jnp.asarray(pixels))["params"]
    assert_tree_match(expected, params)
    feat, emb = model.apply({"params": params}, jnp.asarray(pixels))
    np.testing.assert_allclose(np.asarray(feat), ref_feat, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(emb), embeds, rtol=2e-4, atol=2e-4)


def test_siglip_text_parity():
    hf_cfg = transformers.SiglipTextConfig(projection_size=48, **TXT)
    torch.manual_seed(1)
    hf = transformers.SiglipTextModel(hf_cfg).eval()

    ids = np.random.default_rng(1).integers(0, 99, (2, 16))
    with torch.no_grad():
        out = hf(torch.from_numpy(ids))
    ref_pooled = out.pooler_output.numpy()
    with torch.no_grad():
        ref_tokens = hf.text_model.head(out.last_hidden_state).numpy()

    cfg = hcfg.SiglipTextConfig(projection_size=48, **TXT)
    model = SiglipTextEncoder(config=cfg)
    params = convert_siglip_text({k: v.numpy() for k, v in hf.state_dict().items()})
    expected = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    assert_tree_match(expected, params)
    pooled, per_token = model.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(per_token), ref_tokens, rtol=2e-4, atol=2e-4)


QWEN = dict(vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
            rope_theta=10000.0, tie_word_embeddings=False)


def _build_qwen_pair(seed=2):
    hf_cfg = transformers.Qwen2Config(**QWEN)
    torch.manual_seed(seed)
    hf = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    cfg = hcfg.Qwen2Config(head_dim=16, attention_bias=True, rms_norm_eps=1e-6, **QWEN)
    model = Qwen2ForCausalLM(config=cfg)
    params = convert_decoder({k: v.numpy() for k, v in hf.state_dict().items()})
    return hf, model, params, cfg


def test_qwen2_forward_parity():
    hf, model, params, cfg = _build_qwen_pair()
    ids = np.random.default_rng(2).integers(0, 128, (2, 11))
    with torch.no_grad():
        ref_logits = hf(torch.from_numpy(ids)).logits.numpy()

    positions = jnp.broadcast_to(jnp.arange(11)[None], (2, 11))
    bound = model.bind({"params": params})
    embeds = bound.embed(jnp.asarray(ids))
    expected = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), positions,
        method=lambda m, i, p: m(m.embed(i), p),
    )["params"]
    assert_tree_match(expected, params)
    logits, _ = model.apply({"params": params}, embeds, positions)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=3e-4, atol=3e-4)


def test_qwen2_kv_cache_decode_matches_full_forward():
    _, model, params, cfg = _build_qwen_pair()
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 128, (1, 9))
    bound = model.bind({"params": params})
    embeds = bound.embed(jnp.asarray(ids))

    # full forward (no cache)
    positions = jnp.arange(9)[None]
    full_logits, _ = model.apply({"params": params}, embeds, positions)

    # prefill first 6, then decode 3 single tokens
    cache = KVCache.zeros(cfg.num_hidden_layers, 1, cfg.num_key_value_heads, 16, cfg.head_dim, jnp.float32)
    logits_p, cache = model.apply({"params": params}, embeds[:, :6], jnp.arange(6)[None], cache)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(full_logits[:, :6]), rtol=2e-4, atol=2e-4)
    for t in range(6, 9):
        step_logits, cache = model.apply(
            {"params": params}, embeds[:, t : t + 1], jnp.array([[t]]), cache
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, t]), rtol=2e-4, atol=2e-4
        )
    assert int(cache.length[0]) == 9


def test_qwen2_int8_kv_cache_decode():
    """int8 KV cache (per-slot absmax): decode tracks the fp32-cache logits
    closely and greedy argmax is unchanged on the tiny model."""
    _, model, params, cfg = _build_qwen_pair()
    rng = np.random.default_rng(5)
    ids = rng.integers(0, 128, (1, 9))
    bound = model.bind({"params": params})
    embeds = bound.embed(jnp.asarray(ids))

    def run(quantized):
        cache = KVCache.zeros(cfg.num_hidden_layers, 1, cfg.num_key_value_heads, 16,
                              cfg.head_dim, jnp.float32, quantized=quantized)
        logits, cache = model.apply({"params": params}, embeds[:, :6], jnp.arange(6)[None], cache)
        outs = [logits[:, -1]]
        for t in range(6, 9):
            step, cache = model.apply({"params": params}, embeds[:, t:t + 1], jnp.array([[t]]), cache)
            outs.append(step[:, 0])
        assert (cache.k_scale is not None) == quantized
        return jnp.stack(outs, axis=1)

    ref = run(False)
    got = run(True)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(got, -1)), np.asarray(jnp.argmax(ref, -1)))
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 0.05, f"int8 cache rel err {err}"

    # scanned layers with int8 cache track the unrolled int8 run exactly
    import dataclasses

    from hicom_tpu.weights import stack_decoder_layers

    scan_model = Qwen2ForCausalLM(config=dataclasses.replace(cfg, scan_layers=True))
    scan_params = stack_decoder_layers(params)
    cache = KVCache.zeros(cfg.num_hidden_layers, 1, cfg.num_key_value_heads, 16,
                          cfg.head_dim, jnp.float32, quantized=True)
    lp, cache = scan_model.apply({"params": scan_params}, embeds[:, :6], jnp.arange(6)[None], cache)
    outs = [lp[:, -1]]
    for t in range(6, 9):
        step, cache = scan_model.apply({"params": scan_params}, embeds[:, t:t + 1],
                                       jnp.array([[t]]), cache)
        outs.append(step[:, 0])
    np.testing.assert_allclose(np.asarray(jnp.stack(outs, axis=1)), np.asarray(got),
                               rtol=1e-5, atol=1e-5)


def test_qwen2_padding_mask():
    """Right-padded batch rows must produce the same logits as unpadded rows."""
    _, model, params, cfg = _build_qwen_pair()
    rng = np.random.default_rng(4)
    ids = rng.integers(1, 128, (1, 7))
    bound = model.bind({"params": params})

    positions = jnp.arange(7)[None]
    logits_ref, _ = model.apply({"params": params}, bound.embed(jnp.asarray(ids)), positions)

    padded = np.concatenate([ids, np.zeros((1, 3), dtype=ids.dtype)], axis=1)
    mask = jnp.asarray(np.concatenate([np.ones((1, 7)), np.zeros((1, 3))], axis=1).astype(bool))
    logits_pad, _ = model.apply(
        {"params": params}, bound.embed(jnp.asarray(padded)), jnp.arange(10)[None], padding_mask=mask
    )
    np.testing.assert_allclose(
        np.asarray(logits_pad[:, :7]), np.asarray(logits_ref), rtol=2e-4, atol=2e-4
    )


LLAMA = dict(vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
             num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=128,
             rope_theta=10000.0, tie_word_embeddings=False)


def test_llama_forward_parity():
    """The same decoder module serves Llama (no QKV bias, rope 1e4)."""
    hf_cfg = transformers.LlamaConfig(**LLAMA)
    torch.manual_seed(5)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = hcfg.LlamaConfig(head_dim=16, attention_bias=False, rms_norm_eps=1e-6, **LLAMA)
    model = Qwen2ForCausalLM(config=cfg)
    params = convert_decoder({k: v.numpy() for k, v in hf.state_dict().items()})

    ids = np.random.default_rng(5).integers(0, 128, (2, 9))
    with torch.no_grad():
        ref_logits = hf(torch.from_numpy(ids)).logits.numpy()
    positions = jnp.broadcast_to(jnp.arange(9)[None], (2, 9))
    expected = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), positions,
        method=lambda m, i, p: m(m.embed(i), p),
    )["params"]
    assert_tree_match(expected, params)
    bound = model.bind({"params": params})
    logits, _ = model.apply({"params": params}, bound.embed(jnp.asarray(ids)), positions)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=3e-4, atol=3e-4)


def test_int8_weight_only_quantization():
    """QuantDense decoder ≈ fp decoder within int8 absmax error; int8 storage."""
    import dataclasses

    from hicom_tpu.models.qwen2 import quantize_decoder_params

    _, model, params, cfg = _build_qwen_pair(seed=7)
    qcfg = dataclasses.replace(cfg, quantization="int8")
    qmodel = Qwen2ForCausalLM(config=qcfg)
    qparams = quantize_decoder_params(params)

    # tree structure matches the quantized module
    ids = np.random.default_rng(7).integers(0, 128, (1, 12))
    positions = jnp.arange(12)[None]
    expected = qmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), positions,
        method=lambda m, i, p: m(m.embed(i), p),
    )["params"]
    assert_tree_match(expected, qparams)

    bound = model.bind({"params": params})
    embeds = bound.embed(jnp.asarray(ids))
    fp_logits, _ = model.apply({"params": params}, embeds, positions)
    q_logits, _ = qmodel.apply({"params": qparams}, embeds, positions)

    # int8 storage actually used
    k = qparams["model"]["layers_0"]["self_attn"]["q_proj"]["kernel_q"]
    assert k.dtype == np.int8
    # argmax agreement + bounded drift for a tiny random model
    np.testing.assert_array_equal(
        np.argmax(np.asarray(fp_logits), -1), np.argmax(np.asarray(q_logits), -1)
    )
    rel = np.abs(np.asarray(q_logits) - np.asarray(fp_logits)).max() / (np.abs(np.asarray(fp_logits)).max() + 1e-9)
    assert rel < 0.05, rel


def test_w8a8_decoder_prefill_modes():
    """Serving w8a8 decoder ("w8a8": all linears; "w8a8_mlp": gate/up/down
    only, attention fp): quantize_decoder_params layouts slot in and logits
    track fp within int8 tolerance."""
    import dataclasses

    from hicom_tpu.models.qwen2 import quantize_decoder_params

    _, model, params, cfg = _build_qwen_pair(seed=11)
    ids = np.random.default_rng(11).integers(0, 128, (1, 12))
    positions = jnp.arange(12)[None]
    bound = model.bind({"params": params})
    embeds = bound.embed(jnp.asarray(ids))
    fp_logits, _ = model.apply({"params": params}, embeds, positions)

    for mode in ("w8a8", "w8a8_mlp"):
        qcfg = dataclasses.replace(cfg, quantization=mode)
        qmodel = Qwen2ForCausalLM(config=qcfg)
        qparams = quantize_decoder_params(params, mode=mode)
        expected = qmodel.init(
            jax.random.PRNGKey(0), jnp.asarray(ids), positions,
            method=lambda m, i, p: m(m.embed(i), p),
        )["params"]
        assert_tree_match(expected, qparams)
        attn0 = qparams["model"]["layers_0"]["self_attn"]
        if mode == "w8a8_mlp":
            assert "kernel" in attn0["q_proj"]  # attention stays fp
        else:
            assert "kernel_q" in attn0["q_proj"]
        q_logits, _ = qmodel.apply({"params": qparams}, embeds, positions)
        np.testing.assert_array_equal(
            np.argmax(np.asarray(fp_logits), -1), np.argmax(np.asarray(q_logits), -1))
        rel = np.abs(np.asarray(q_logits) - np.asarray(fp_logits)).max() / (
            np.abs(np.asarray(fp_logits)).max() + 1e-9)
        assert rel < 0.08, (mode, rel)


def test_w8a8s_decoder_static_calibrated():
    """Static-scale w8a8 decoder ("w8a8s"/"w8a8s_mlp", VERDICT r4 next-1):
    quantize_decoder_params emits act_scale/act_smooth beside each int8
    kernel (layout == model.init), a '+calib' forward sows per-site absmax,
    fill_act_scales writes the scales, and the static forward then tracks fp
    within int8 tolerance — same recipe as the tower's w8a8s path
    (models/quant.py W8A8DenseS), now on the decoder's serving prefill."""
    import dataclasses

    from hicom_tpu.models.qwen2 import quantize_decoder_params
    from hicom_tpu.models.quant import fill_act_scales

    _, model, params, cfg = _build_qwen_pair(seed=13)
    ids = np.random.default_rng(13).integers(0, 128, (1, 12))
    positions = jnp.arange(12)[None]
    bound = model.bind({"params": params})
    embeds = bound.embed(jnp.asarray(ids))
    fp_logits, _ = model.apply({"params": params}, embeds, positions)

    for mode in ("w8a8s", "w8a8s_mlp"):
        qparams = quantize_decoder_params(params, mode=mode)
        qcfg = dataclasses.replace(cfg, quantization=mode)
        qmodel = Qwen2ForCausalLM(config=qcfg)
        expected = qmodel.init(
            jax.random.PRNGKey(0), jnp.asarray(ids), positions,
            method=lambda m, i, p: m(m.embed(i), p),
        )["params"]
        assert_tree_match(expected, qparams)
        mlp0 = qparams["model"]["layers_0"]["mlp"]
        assert float(mlp0["gate_proj"]["act_scale"]) == 1.0  # uncalibrated

        # calibration twin: dynamic absmax quantization + sown amax
        ccfg = dataclasses.replace(cfg, quantization=mode + "+calib")
        cmodel = Qwen2ForCausalLM(config=ccfg)
        (_, _), mut = cmodel.apply({"params": qparams}, embeds, positions,
                                   mutable=["calib"])
        qparams = fill_act_scales(qparams, jax.device_get(mut["calib"]))
        assert float(qparams["model"]["layers_0"]["mlp"]["gate_proj"]["act_scale"]) != 1.0

        q_logits, _ = qmodel.apply({"params": qparams}, embeds, positions)
        np.testing.assert_array_equal(
            np.argmax(np.asarray(fp_logits), -1), np.argmax(np.asarray(q_logits), -1))
        rel = np.abs(np.asarray(q_logits) - np.asarray(fp_logits)).max() / (
            np.abs(np.asarray(fp_logits)).max() + 1e-9)
        assert rel < 0.08, (mode, rel)


def test_scan_layers_matches_unrolled():
    """nn.scan decoder (stacked params) == unrolled decoder == HF torch."""
    import dataclasses

    from hicom_tpu.models.qwen2 import KVCache
    from hicom_tpu.weights import stack_decoder_layers, unstack_decoder_layers

    hf, model, params, cfg = _build_qwen_pair(seed=9)
    scan_cfg = dataclasses.replace(cfg, scan_layers=True)
    scan_model = Qwen2ForCausalLM(config=scan_cfg)
    scan_params = stack_decoder_layers(params)

    ids = np.random.default_rng(9).integers(0, 128, (2, 11))
    positions = jnp.broadcast_to(jnp.arange(11)[None], (2, 11))
    with torch.no_grad():
        ref_logits = hf(torch.from_numpy(ids)).logits.numpy()

    expected = scan_model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), positions,
        method=lambda m, i, p: m(m.embed(i), p),
    )["params"]
    assert_tree_match(expected, scan_params)

    embeds = scan_model.bind({"params": scan_params}).embed(jnp.asarray(ids))
    logits, _ = scan_model.apply({"params": scan_params}, embeds, positions)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=3e-4, atol=3e-4)

    # cache decode parity with the unrolled model
    cache = KVCache.zeros(cfg.num_hidden_layers, 2, cfg.num_key_value_heads, 16, cfg.head_dim, jnp.float32)
    lp, cache = scan_model.apply({"params": scan_params}, embeds[:, :6], positions[:, :6], cache)
    np.testing.assert_allclose(np.asarray(lp), ref_logits[:, :6], rtol=3e-4, atol=3e-4)
    step, cache = scan_model.apply({"params": scan_params}, embeds[:, 6:7], positions[:, 6:7], cache)
    np.testing.assert_allclose(np.asarray(step[:, 0]), ref_logits[:, 6], rtol=3e-4, atol=3e-4)

    # stack/unstack round trip
    rt = unstack_decoder_layers(scan_params)
    flat_a = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_flatten_with_path(rt)[0]}
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_allclose(np.asarray(flat_a[k]), np.asarray(flat_b[k]))


def test_nf4_weight_only_quantization():
    """QuantDense4 (packed NF4 + group scales) ≈ fp decoder; 4-bit storage
    (the reference's bnb load_4bit analogue, model/__init__.py:58-68)."""
    import dataclasses

    from hicom_tpu.models.qwen2 import NF4_CODEBOOK, NF4_GROUP, quantize_decoder_params

    _, model, params, cfg = _build_qwen_pair(seed=8)
    qcfg = dataclasses.replace(cfg, quantization="nf4")
    qmodel = Qwen2ForCausalLM(config=qcfg)
    qparams = quantize_decoder_params(params, mode="nf4")

    ids = np.random.default_rng(8).integers(0, 128, (1, 12))
    positions = jnp.arange(12)[None]
    expected = qmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), positions,
        method=lambda m, i, p: m(m.embed(i), p),
    )["params"]
    assert_tree_match(expected, qparams)

    # packed storage: half the rows, uint8
    kq = qparams["model"]["layers_0"]["self_attn"]["q_proj"]["kernel_nf4"]
    kf = params["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert kq.dtype == np.uint8 and kq.shape[0] == kf.shape[0] // 2

    # dequantized weight is the nearest-codebook reconstruction
    scale = qparams["model"]["layers_0"]["self_attn"]["q_proj"]["kernel_scale"]
    lo, hi = kq & 0xF, kq >> 4
    codes = np.stack([lo, hi], 1).reshape(kf.shape[0], -1)
    w = NF4_CODEBOOK[codes] * np.repeat(scale, NF4_GROUP, axis=0)[: kf.shape[0]]
    group_absmax = np.abs(np.asarray(kf)).reshape(-1, NF4_GROUP, kf.shape[1]).max(1)
    step = np.repeat(group_absmax, NF4_GROUP, axis=0)  # worst-case bin width bound
    assert np.all(np.abs(w - np.asarray(kf)) <= 0.2 * step + 1e-8)

    bound = model.bind({"params": params})
    embeds = bound.embed(jnp.asarray(ids))
    fp_logits, _ = model.apply({"params": params}, embeds, positions)
    q_logits, _ = qmodel.apply({"params": qparams}, embeds, positions)
    # nf4 is lossier than int8: check relative closeness rather than argmax
    rel = float(jnp.linalg.norm(q_logits - fp_logits) / jnp.linalg.norm(fp_logits))
    assert rel < 0.15, f"nf4 rel err {rel}"


def test_flash_decode_matches_einsum_path(monkeypatch):
    """HICOM_FLASH_DECODE=interpret: the fused decode kernel (fp and int8
    caches) reproduces the einsum decode path."""
    _, model, params, cfg = _build_qwen_pair(seed=11)
    rng = np.random.default_rng(11)
    ids = rng.integers(0, 128, (2, 9))
    bound = model.bind({"params": params})
    embeds = bound.embed(jnp.asarray(ids))
    # right-padded rows: row 1 has only 5 real tokens
    pm = np.ones((2, 6), bool)
    pm[1, 5:] = False

    def run(quantized):
        cache = KVCache.zeros(cfg.num_hidden_layers, 2, cfg.num_key_value_heads, 16,
                              cfg.head_dim, jnp.float32, quantized=quantized)
        _, cache = model.apply({"params": params}, embeds[:, :6], jnp.arange(6)[None], cache,
                               padding_mask=jnp.asarray(pm))
        outs = []
        for t in range(6, 9):
            step, cache = model.apply({"params": params}, embeds[:, t:t + 1],
                                      jnp.array([[t], [t - 1]]), cache)
            outs.append(step[:, 0])
        return jnp.stack(outs, axis=1)

    for quantized in (False, True):
        monkeypatch.delenv("HICOM_FLASH_DECODE", raising=False)
        ref = run(quantized)
        monkeypatch.setenv("HICOM_FLASH_DECODE", "interpret")
        got = run(quantized)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4,
                                   err_msg=f"quantized={quantized}")


def test_siglip_scan_layers_parity():
    """scan_layers towers: stacked-param scanned encoder == unrolled encoder
    bit-for-bit (vision tap -2 incl. head, guide text pooled+fine)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from hicom_tpu.config import SiglipTextConfig, SiglipVisionConfig
    from hicom_tpu.models.siglip import SiglipTextEncoder, SiglipVisionTower
    from hicom_tpu.weights import stack_encoder_layers, unstack_encoder_layers

    vcfg = SiglipVisionConfig(hidden_size=64, intermediate_size=96, num_hidden_layers=3,
                              num_attention_heads=4, image_size=28, patch_size=14)
    tower = SiglipVisionTower(config=vcfg, select_layer=-2)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((2, 3, 28, 28)).astype(np.float32))
    params = tower.init(jax.random.PRNGKey(0), px)["params"]
    feats, embeds = tower.apply({"params": params}, px)

    scfg = dataclasses.replace(vcfg, scan_layers=True)
    stacked = stack_encoder_layers(params)
    tower_s = SiglipVisionTower(config=scfg, select_layer=-2)
    feats_s, embeds_s = tower_s.apply({"params": stacked}, px)
    np.testing.assert_allclose(np.asarray(feats_s), np.asarray(feats), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(embeds_s), np.asarray(embeds), rtol=1e-6, atol=1e-6)

    # round-trip for HF export
    rt = unstack_encoder_layers(stacked)
    for (pa, a), (pb, b) in zip(sorted(jax.tree_util.tree_leaves_with_path(params), key=lambda kv: str(kv[0])),
                                sorted(jax.tree_util.tree_leaves_with_path(rt), key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    tcfg = SiglipTextConfig(hidden_size=64, intermediate_size=96, num_hidden_layers=3,
                            num_attention_heads=4, vocab_size=64, max_position_embeddings=16,
                            projection_size=64)
    enc = SiglipTextEncoder(config=tcfg)
    ids = jnp.asarray(rng.integers(0, 64, (2, 12)))
    mask = jnp.asarray(rng.random((2, 12)) > 0.3).astype(np.int32)
    tp = enc.init(jax.random.PRNGKey(1), ids, mask)["params"]
    pooled, per_tok = enc.apply({"params": tp}, ids, mask)
    enc_s = SiglipTextEncoder(config=dataclasses.replace(tcfg, scan_layers=True))
    pooled_s, per_tok_s = enc_s.apply({"params": stack_encoder_layers(tp)}, ids, mask)
    np.testing.assert_allclose(np.asarray(pooled_s), np.asarray(pooled), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(per_tok_s), np.asarray(per_tok), rtol=1e-6, atol=1e-6)


def test_w8a8_tower_close_to_fp():
    """w8a8 serving tower (int8 act × int8 weight, int32 MXU accumulation —
    models/quant.py) stays within standard int8 tolerance of the fp tower:
    per-channel weight scales + per-row dynamic activation scales."""
    import dataclasses

    from hicom_tpu.models.quant import quantize_tower_params

    cfg = hcfg.SiglipVisionConfig(**VIS)
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((2, 3, 56, 56)).astype(np.float32))
    fp = SiglipVisionTower(config=cfg, dtype=jnp.float32)
    vars_fp = fp.init(jax.random.PRNGKey(0), px)
    f_fp, e_fp = fp.apply(vars_fp, px)

    qcfg = dataclasses.replace(cfg, quantization="w8a8")
    qt = SiglipVisionTower(config=qcfg, dtype=jnp.float32)
    qparams = quantize_tower_params(jax.device_get(vars_fp["params"]))
    f_q, e_q = qt.apply({"params": jax.tree.map(jnp.asarray, qparams)}, px)

    a, b = np.asarray(f_fp).ravel(), np.asarray(f_q).ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    rel = float(np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9))
    assert cos > 0.999 and rel < 0.03, (cos, rel)
    # head path also runs (head MLP quantized under w8a8 serving modes)
    assert e_q.shape == e_fp.shape
    ha, hb = np.asarray(e_fp).ravel(), np.asarray(e_q).ravel()
    hcos = float(np.dot(ha, hb) / (np.linalg.norm(ha) * np.linalg.norm(hb)))
    assert hcos > 0.999, hcos


def test_w8a8_mlp_qkv_tower_mode():
    """Intermediate serving mode (fc1/fc2 + q/k/v int8, out_proj fp): params
    from quantize_tower_params(mode=w8a8_mlp_qkv) slot in and track fp."""
    import dataclasses

    from hicom_tpu.models.quant import quantize_tower_params

    cfg = hcfg.SiglipVisionConfig(**VIS)
    rng = np.random.default_rng(3)
    px = jnp.asarray(rng.standard_normal((2, 3, 56, 56)).astype(np.float32))
    fp = SiglipVisionTower(config=cfg, dtype=jnp.float32)
    vars_fp = fp.init(jax.random.PRNGKey(0), px)
    f_fp, _ = fp.apply(vars_fp, px)

    qparams = quantize_tower_params(jax.device_get(vars_fp["params"]), mode="w8a8_mlp_qkv")
    # out_proj kernels must remain fp (bf16-compatible nn.Dense layout)
    l0 = qparams["encoder"]["layers_0"]
    assert "kernel" in l0["self_attn"]["out_proj"]
    assert "kernel_q" in l0["self_attn"]["q_proj"] and "kernel_q" in l0["mlp"]["fc1"]
    assert "kernel_q" in qparams["head_mlp"]["fc1"]

    qcfg = dataclasses.replace(cfg, quantization="w8a8_mlp_qkv")
    qt = SiglipVisionTower(config=qcfg, dtype=jnp.float32)
    f_q, _ = qt.apply({"params": jax.tree.map(jnp.asarray, qparams)}, px)
    a, b = np.asarray(f_fp).ravel(), np.asarray(f_q).ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999, cos


def test_w8a8_tower_scan_layers_matches_unrolled():
    """w8a8 + scan_towers compose: stacked quantized params give identical
    outputs to the unrolled quantized tower."""
    import dataclasses

    from hicom_tpu.models.quant import quantize_tower_params
    from hicom_tpu.weights import stack_encoder_layers

    cfg = hcfg.SiglipVisionConfig(**VIS)
    rng = np.random.default_rng(1)
    px = jnp.asarray(rng.standard_normal((1, 3, 56, 56)).astype(np.float32))
    fp = SiglipVisionTower(config=cfg, dtype=jnp.float32)
    qparams = quantize_tower_params(jax.device_get(fp.init(jax.random.PRNGKey(0), px)["params"]))

    qcfg = dataclasses.replace(cfg, quantization="w8a8")
    un = SiglipVisionTower(config=qcfg, dtype=jnp.float32)
    f_un, _ = un.apply({"params": jax.tree.map(jnp.asarray, qparams)}, px)

    scfg = dataclasses.replace(qcfg, scan_layers=True)
    sc = SiglipVisionTower(config=scfg, dtype=jnp.float32)
    stacked = stack_encoder_layers(qparams)
    f_sc, _ = sc.apply({"params": jax.tree.map(jnp.asarray, stacked)}, px)
    np.testing.assert_allclose(np.asarray(f_un), np.asarray(f_sc), rtol=1e-5, atol=1e-5)


def test_w8a8s_static_tower_calibration():
    """Static-scale w8a8 (``w8a8s*``): calibrated per-tensor activation scales
    replace the per-call dynamic absmax so the quantize is pure elementwise
    (models/quant.py:quantize_static). A '+calib' forward sows per-site absmax
    into the 'calib' collection; fill_act_scales writes them into the param
    tree; the served static tower then tracks fp, and the calibration forward
    itself matches the served forward on the calibration batch."""
    import dataclasses

    from hicom_tpu.models.quant import fill_act_scales, quantize_tower_params

    cfg = hcfg.SiglipVisionConfig(**VIS)
    rng = np.random.default_rng(5)
    px = jnp.asarray(rng.standard_normal((2, 3, 56, 56)).astype(np.float32))
    fp = SiglipVisionTower(config=cfg, dtype=jnp.float32)
    vars_fp = fp.init(jax.random.PRNGKey(0), px)
    f_fp, e_fp = fp.apply(vars_fp, px)

    qparams = quantize_tower_params(jax.device_get(vars_fp["params"]), mode="w8a8s")
    l0 = qparams["encoder"]["layers_0"]
    # quantize sites: q/k/v share one hoisted ActQuant; every self-quantizing
    # dense carries a flat act_scale beside its kernel_q
    assert "act_scale" in l0["mlp"]["fc1"] and "act_scale" in l0["mlp"]["fc2"]
    assert "act_scale" in l0["self_attn"]["out_proj"]
    assert "act_scale" in l0["self_attn"]["qkv_quant"]
    assert "act_scale" not in l0["self_attn"]["q_proj"]
    qparams = jax.tree.map(jnp.asarray, qparams)

    ccfg = dataclasses.replace(cfg, quantization="w8a8s+calib")
    ct = SiglipVisionTower(config=ccfg, dtype=jnp.float32)
    (f_c, _), mut = ct.apply({"params": qparams}, px, mutable=["calib"])
    filled = fill_act_scales(qparams, jax.device_get(mut["calib"]))
    # every act_scale must have been written (left nowhere at the 1.0 init)
    for path, leaf in jax.tree_util.tree_leaves_with_path(filled):
        if "act_scale" in str(path):
            assert not np.allclose(np.asarray(leaf), 1.0), path

    scfg = dataclasses.replace(cfg, quantization="w8a8s")
    st = SiglipVisionTower(config=scfg, dtype=jnp.float32)
    f_s, e_s = st.apply({"params": filled}, px)
    # served static == calibration forward on the calibration batch (same
    # scales, same int8 math; only fusion order differs)
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_c), rtol=1e-5, atol=1e-5)
    a, b = np.asarray(f_fp).ravel(), np.asarray(f_s).ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    rel = float(np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9))
    assert cos > 0.999 and rel < 0.04, (cos, rel)
    ha, hb = np.asarray(e_fp).ravel(), np.asarray(e_s).ravel()
    hcos = float(np.dot(ha, hb) / (np.linalg.norm(ha) * np.linalg.norm(hb)))
    assert hcos > 0.999, hcos

    # w8a8s_mlp_qkv coverage: out_proj stays an fp Dense, no out-site scale
    mq = quantize_tower_params(jax.device_get(vars_fp["params"]), mode="w8a8s_mlp_qkv")
    m0 = mq["encoder"]["layers_0"]
    assert "kernel" in m0["self_attn"]["out_proj"] and "act_scale" in m0["self_attn"]["qkv_quant"]


def test_w8a8s_tower_scan_layers_matches_unrolled():
    """Static quant composes with scan_layers: calibration sows a stacked
    (layer-axis) calib collection whose fill matches the unrolled tower."""
    import dataclasses

    from hicom_tpu.models.quant import fill_act_scales, quantize_tower_params
    from hicom_tpu.weights import stack_encoder_layers

    cfg = hcfg.SiglipVisionConfig(**VIS)
    rng = np.random.default_rng(6)
    px = jnp.asarray(rng.standard_normal((1, 3, 56, 56)).astype(np.float32))
    fp = SiglipVisionTower(config=cfg, dtype=jnp.float32)
    qparams = quantize_tower_params(
        jax.device_get(fp.init(jax.random.PRNGKey(0), px)["params"]), mode="w8a8s")
    qparams = jax.tree.map(jnp.asarray, qparams)

    # calibrate on the UNROLLED tower, fill, then compare unrolled vs scanned
    ccfg = dataclasses.replace(cfg, quantization="w8a8s+calib")
    _, mut = SiglipVisionTower(config=ccfg, dtype=jnp.float32).apply(
        {"params": qparams}, px, mutable=["calib"])
    filled = fill_act_scales(qparams, jax.device_get(mut["calib"]))

    scfg = dataclasses.replace(cfg, quantization="w8a8s")
    f_un, _ = SiglipVisionTower(config=scfg, dtype=jnp.float32).apply({"params": filled}, px)
    sccfg = dataclasses.replace(scfg, scan_layers=True)
    f_sc, _ = SiglipVisionTower(config=sccfg, dtype=jnp.float32).apply(
        {"params": jax.tree.map(jnp.asarray, stack_encoder_layers(jax.device_get(filled)))}, px)
    np.testing.assert_allclose(np.asarray(f_un), np.asarray(f_sc), rtol=1e-5, atol=1e-5)

    # scanned calibration sows per-layer amax on the layer axis and fills the
    # stacked act_scale params directly
    sccal = dataclasses.replace(sccfg, quantization="w8a8s+calib")
    stacked = jax.tree.map(jnp.asarray, stack_encoder_layers(jax.device_get(qparams)))
    _, smut = SiglipVisionTower(config=sccal, dtype=jnp.float32).apply(
        {"params": stacked}, px, mutable=["calib"])
    sfilled = fill_act_scales(stacked, jax.device_get(smut["calib"]))
    f_sc2, _ = SiglipVisionTower(config=sccfg, dtype=jnp.float32).apply({"params": sfilled}, px)
    np.testing.assert_allclose(np.asarray(f_sc2), np.asarray(f_un), rtol=1e-5, atol=1e-5)
