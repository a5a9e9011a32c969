"""Multi-device tests on the virtual 8-CPU mesh: sharded init + train steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hicom_tpu.config import tiny_test_config
from hicom_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
from hicom_tpu.models.hicom import HIComModel
from hicom_tpu.parallel import create_mesh, param_shardings
from hicom_tpu.parallel.sharding import shard_batch_tree
from hicom_tpu.train.optimizer import build_optimizer, is_tunable, lr_group, trainable_param_count
from hicom_tpu.train.train_step import TrainState, create_sharded_state, make_train_step


def make_batch(cfg, b=8, t=2, L=10, seed=0):
    rng = np.random.default_rng(seed)
    img = cfg.vision_config.image_size
    ids = rng.integers(5, cfg.text_config.vocab_size, (b, L))
    ids[:, 1] = VIDEO_TOKEN_INDEX
    labels = np.array(ids)
    labels[:, :4] = IGNORE_INDEX
    return {
        "input_ids": jnp.asarray(ids),
        "frames": jnp.asarray(rng.standard_normal((b, t, 3, img, img)).astype(np.float32)),
        "attention_mask": jnp.ones((b, L), dtype=bool),
        "labels": jnp.asarray(labels),
    }


def test_sharded_train_two_steps_loss_decreases():
    assert len(jax.devices()) == 8
    mesh = create_mesh(dp=2, fsdp=2, tp=2)
    cfg = tiny_test_config()
    model = HIComModel(config=cfg)
    batch = make_batch(cfg)

    optimizer = build_optimizer(
        jax.eval_shape(
            lambda r: model.init(r, batch["input_ids"], batch["frames"], labels=batch["labels"], modal="video")["params"],
            jax.random.PRNGKey(0),
        ),
        learning_rate=1e-2,
        total_steps=10,
        warmup_ratio=0.0,
        schedule_kind="constant",
        tunable_parts="mm_projector,language_model",
    )

    with mesh:
        state, shardings = create_sharded_state(model, optimizer, mesh, batch, jax.random.PRNGKey(0))
        # params must actually be sharded: q_proj kernel spans 2 tp shards
        qk = state.params["language_model"]["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
        assert len(qk.sharding.device_set) > 1

        step = jax.jit(make_train_step(model, optimizer), donate_argnums=0)
        sharded_batch = shard_batch_tree(batch, mesh)
        state, m1 = step(state, sharded_batch)
        state, m2 = step(state, sharded_batch)
        l1, l2 = float(m1["loss"]), float(m2["loss"])
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l2 < l1, (l1, l2)


def test_offload_optimizer_cpu_fallback_still_trains():
    """--offload-optimizer on a backend without pinned_host placement (CPU)
    must fall back cleanly and keep training; on TPU the same flag rests the
    Adam moments in host memory (scripts/verify_offload_tpu.py checks the
    placement on the real chip)."""
    from hicom_tpu.parallel.sharding import supports_host_offload

    mesh = create_mesh(dp=4, fsdp=2, tp=1)
    cfg = tiny_test_config()
    model = HIComModel(config=cfg)
    batch = make_batch(cfg)
    optimizer = build_optimizer(
        jax.eval_shape(
            lambda r: model.init(r, batch["input_ids"], batch["frames"], labels=batch["labels"], modal="video")["params"],
            jax.random.PRNGKey(0),
        ),
        learning_rate=1e-2, total_steps=10, warmup_ratio=0.0,
        schedule_kind="constant", tunable_parts="mm_projector,language_model",
    )
    with mesh:
        state, shardings = create_sharded_state(
            model, optimizer, mesh, batch, jax.random.PRNGKey(0), offload_optimizer=True)
        step = jax.jit(make_train_step(model, optimizer), donate_argnums=0)
        state, m1 = step(state, shard_batch_tree(batch, mesh))
        assert np.isfinite(float(m1["loss"]))
    if supports_host_offload():
        kinds = {s.memory_kind for s in jax.tree.leaves(shardings.opt_state)
                 if hasattr(s, "memory_kind")}
        assert kinds == {"pinned_host"}


def test_frozen_parts_do_not_move():
    mesh = create_mesh(dp=8, fsdp=1, tp=1)
    cfg = tiny_test_config()
    model = HIComModel(config=cfg)
    batch = make_batch(cfg, b=8)
    params_shape = jax.eval_shape(
        lambda r: model.init(r, batch["input_ids"], batch["frames"], labels=batch["labels"], modal="video")["params"],
        jax.random.PRNGKey(0),
    )
    optimizer = build_optimizer(
        params_shape, learning_rate=1e-2, total_steps=10, warmup_ratio=0.0,
        schedule_kind="constant", tunable_parts="mm_projector",  # LLM + tower frozen
    )
    with mesh:
        state, _ = create_sharded_state(model, optimizer, mesh, batch, jax.random.PRNGKey(0))
        before_llm = np.asarray(state.params["language_model"]["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"])
        before_proj = np.asarray(state.params["mm_projector"]["global_compressor"]["readout"]["0"]["kernel"])
        step = jax.jit(make_train_step(model, optimizer))
        state, _ = step(state, shard_batch_tree(batch, mesh))
    after_llm = np.asarray(state.params["language_model"]["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"])
    after_proj = np.asarray(state.params["mm_projector"]["global_compressor"]["readout"]["0"]["kernel"])
    np.testing.assert_array_equal(before_llm, after_llm)
    assert np.abs(after_proj - before_proj).max() > 0


def test_tunable_matrix_and_lr_groups():
    # freeze matrix (reference train.py:702-738)
    assert is_tunable("mm_projector/local_compressor/readout/0/kernel", "mm_projector")
    assert not is_tunable("mm_projector/local_logit_scale", "mm_projector")
    assert is_tunable("mm_projector/local_logit_scale", "attn_scale", use_guide="direct")
    assert not is_tunable("mm_projector/local_logit_scale", "attn_scale", use_guide="off")
    assert is_tunable("language_model/model/layers_0/mlp/gate_proj/kernel", "language_model")
    assert is_tunable("image_newline", "language_model")
    assert not is_tunable("guide_encoder/head/kernel", "language_model")
    assert is_tunable("guide_encoder/head/kernel", "guide_encoder", use_guide="direct")
    assert is_tunable("vision_tower/encoder/layers_0/mlp/fc1/kernel", "pure_vision_model")
    assert not is_tunable("vision_tower/head_mlp/fc1/kernel", "pure_vision_model")
    assert is_tunable("vision_tower/head_mlp/fc1/kernel", "vision_model_head", use_guide="direct")
    # LR groups (reference hicom_trainer.py:260-268)
    assert lr_group("mm_projector/local_compressor/guide_injector/coarse_proj/0/kernel") == "guide"
    assert lr_group("mm_projector/local_compressor/readout/0/kernel") == "projector"
    assert lr_group("vision_tower/encoder/layers_0/mlp/fc1/kernel") == "vision"
    assert lr_group("language_model/lm_head/kernel") == "base"


def test_long_video_sharded_encode_parity():
    """Sequence-parallel encode (t sharded over 8 devices) == single-pass
    encode_visual, with and without guide injection."""
    from hicom_tpu.parallel.long_video import encode_visual_sharded

    mesh = create_mesh(dp=8)
    t = 32  # 8 devices x t_loc=4, local kernel T=4 divides t_loc
    for use_guide in (None, "direct"):
        cfg = tiny_test_config(use_guide=use_guide) if use_guide else tiny_test_config()
        model = HIComModel(config=cfg)
        rng = np.random.default_rng(3)
        img = cfg.vision_config.image_size
        frames = jnp.asarray(rng.standard_normal((t, 3, img, img)).astype(np.float32))
        gids = None
        if use_guide:
            gids = jnp.asarray(rng.integers(1, cfg.guide_text_config.vocab_size, (1, 8)))
        ids = np.full((1, 4), 7)
        ids[0, 1] = VIDEO_TOKEN_INDEX
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), frames[None],
                               guide_ids=gids, modal="video")
        params = variables["params"]

        guide_embeds = None
        if use_guide:
            guide_embeds = model.apply({"params": params}, gids, method=HIComModel.encode_guide)

        ref = model.apply({"params": params}, frames[None], guide_embeds, "video",
                          method=HIComModel.encode_visual)[0]

        with mesh:
            got = jax.jit(
                lambda p, f, g: encode_visual_sharded(
                    model, p, f, mesh, axis=("dp", "fsdp", "tp"), guide_embeds=g, modal="video"
                )
            )(params, frames, guide_embeds[0] if guide_embeds is not None else None)

        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5,
                                   err_msg=f"use_guide={use_guide}")


def test_long_video_sharded_single_compressor_variants():
    """local-only and global-only projectors through the sharded path."""
    from hicom_tpu.parallel.long_video import encode_visual_sharded

    mesh = create_mesh(dp=8)
    t = 32
    for ptype in ("local43", "global32"):
        cfg = tiny_test_config(mm_projector_type=ptype)
        model = HIComModel(config=cfg)
        rng = np.random.default_rng(4)
        img = cfg.vision_config.image_size
        frames = jnp.asarray(rng.standard_normal((t, 3, img, img)).astype(np.float32))
        ids = np.full((1, 4), 7)
        ids[0, 1] = VIDEO_TOKEN_INDEX
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), frames[None], modal="video")
        params = variables["params"]
        ref = model.apply({"params": params}, frames[None], None, "video",
                          method=HIComModel.encode_visual)[0]
        with mesh:
            got = jax.jit(
                lambda p, f, model=model: encode_visual_sharded(model, p, f, mesh, modal="video")
            )(params, frames)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5,
                                   err_msg=ptype)


def test_ring_attention_matches_sdpa():
    """Ring attention over an 8-device ring == single-device sdpa: causal,
    GQA heads, global kv_lengths."""
    from hicom_tpu.ops.attention import sdpa
    from hicom_tpu.parallel.ring import ring_self_attention

    mesh = create_mesh(dp=8)
    rng = np.random.default_rng(7)
    b, H, KVH, L, d = 2, 4, 2, 128, 16  # L sharded 8 x 16
    q = jnp.asarray(rng.standard_normal((b, H, L, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, KVH, L, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, KVH, L, d)).astype(np.float32))
    lens = jnp.asarray([100, 128], jnp.int32)

    for causal, use_lens in ((True, True), (True, False), (False, True)):
        kw = dict(is_causal=causal)
        if use_lens:
            kw["kv_lengths"] = lens
        ref = sdpa(q, k, v, implementation="einsum", **kw)
        with mesh:
            got = jax.jit(
                lambda q, k, v, kw=kw: ring_self_attention(q, k, v, mesh, axis="dp", **kw)
            )(q, k, v)
        # rows whose kv length is 0 under the mask are undefined in both; all
        # rows here have >=1 valid key (causal row 0 sees key 0; lens >= 100)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5,
                                   err_msg=f"causal={causal} lens={use_lens}")


def test_frozen_stop_gradient_prunes_but_matches():
    """make_loss_fn(tunable_parts=...) stop-gradients frozen leaves (pruning
    their backward at trace time — the frozen tower costs fwd only); the
    TUNABLE gradients must be identical to the unpruned loss."""
    from hicom_tpu.train.train_step import make_loss_fn

    cfg = tiny_test_config()
    model = HIComModel(config=cfg)
    batch = make_batch(cfg, b=2, t=2, L=10)
    params = model.init(jax.random.PRNGKey(0), batch["input_ids"], batch["frames"],
                        labels=batch["labels"], modal="video")["params"]
    parts = "mm_projector,language_model"

    g_full = jax.grad(lambda p: make_loss_fn(model)(p, batch)[0])(params)
    g_pruned = jax.grad(
        lambda p: make_loss_fn(model, tunable_parts=parts)(p, batch)[0])(params)

    for name in ("mm_projector", "language_model"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                    rtol=1e-5, atol=1e-6),
            g_full[name], g_pruned[name])
    # frozen tower grads are exact zeros under the pruned loss
    assert all(float(jnp.max(jnp.abs(x))) == 0.0
               for x in jax.tree_util.tree_leaves(g_pruned["vision_tower"]))
    assert any(float(jnp.max(jnp.abs(x))) > 0.0
               for x in jax.tree_util.tree_leaves(g_full["vision_tower"]))


def test_ring_prefill_matches_direct_prefill():
    """ring_prefill (sequence sharded over 8 devices, per-layer ring
    attention via config.ring_axis) == the single-device decoder prefill:
    last hidden, cache contents, lengths and validity. S=21 exercises the
    divisibility padding (21 → 24 = 8 x 3)."""
    from hicom_tpu.models.qwen2 import KVCache
    from hicom_tpu.parallel.ring import ring_prefill

    cfg = tiny_test_config()
    model = HIComModel(config=cfg)
    batch = make_batch(cfg, b=1, t=2, L=10)
    params = model.init(jax.random.PRNGKey(0), batch["input_ids"], batch["frames"],
                        modal="video")["params"]
    tc = cfg.text_config
    rng = np.random.default_rng(3)
    S, D = 21, tc.hidden_size
    embeds = jnp.asarray(rng.standard_normal((1, S, D)).astype(np.float32)) * 0.1
    positions = jnp.arange(S, dtype=jnp.int32)[None]
    cache_len = 32

    def direct(p, emb, pos):
        def run(m):
            cache = KVCache.zeros(tc.num_hidden_layers, 1, tc.num_key_value_heads,
                                  cache_len, tc.head_dim, jnp.float32)
            return m.language_model.model(emb, pos, cache, prefill_from_empty=True)

        return model.apply({"params": p}, method=run)

    hidden_ref, cache_ref = jax.jit(direct)(params, embeds, positions)
    mesh = create_mesh(dp=8)
    last_hidden, cache = ring_prefill(model, params, embeds, positions, mesh,
                                      "dp", cache_len=cache_len)
    np.testing.assert_allclose(np.asarray(last_hidden[:, 0]),
                               np.asarray(hidden_ref[:, S - 1]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cache.k[:, :, :, :S]),
                               np.asarray(cache_ref.k[:, :, :, :S]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cache.v[:, :, :, :S]),
                               np.asarray(cache_ref.v[:, :, :, :S]), rtol=2e-5, atol=2e-5)
    assert int(cache.length[0]) == S
    np.testing.assert_array_equal(np.asarray(cache.valid),
                                  np.arange(cache_len)[None] < S)


def test_generate_auto_routes_ring_prefill(monkeypatch):
    """HICom.generate routes beyond-bucket prompts through ring_prefill +
    decode_tokens (the public path, VERDICT r2 next-6) and produces the same
    tokens as the single-program generate."""
    from hicom_tpu.api import HICom

    cfg = tiny_test_config()
    model = HIComModel(config=cfg)
    batch = make_batch(cfg, b=1, t=2, L=10)
    params = model.init(jax.random.PRNGKey(0), batch["input_ids"], batch["frames"],
                        modal="video")["params"]
    hicom = HICom(config=cfg, model=model, params=params, eos_token_id=2,
                  cache_len=64)
    ids = np.asarray(batch["input_ids"])
    frames = np.asarray(batch["frames"])

    monkeypatch.setenv("HICOM_RING_PREFILL_MIN", "1000000")
    ref = hicom.generate(ids, frames=frames, modal="video", max_new_tokens=6)
    monkeypatch.setenv("HICOM_RING_PREFILL_MIN", "1")
    hicom_ring = HICom(config=cfg, model=model, params=params, eos_token_id=2,
                       cache_len=64)
    got = hicom_ring.generate(ids, frames=frames, modal="video", max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_remat_gradients_match():
    """--remat (nn.remat on decoder + vision blocks): identical loss and
    gradients, both unrolled and scanned decoders."""
    import dataclasses

    from hicom_tpu.train.train_step import make_loss_fn
    from hicom_tpu.weights import stack_decoder_layers

    cfg = tiny_test_config()
    batch = make_batch(cfg, b=2, t=4, L=12)

    def grads_for(cfg_variant, params_map=lambda p: p):
        model = HIComModel(config=cfg_variant)
        params = params_map(
            HIComModel(config=cfg).init(
                jax.random.PRNGKey(0), batch["input_ids"], batch["frames"],
                labels=batch["labels"], modal="video",
            )["params"]
        )
        loss_fn = make_loss_fn(model, "video")
        (loss, _), g = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        return float(loss), g

    loss_ref, g_ref = grads_for(cfg)
    rcfg = cfg.replace(
        text_config=dataclasses.replace(cfg.text_config, remat=True),
        vision_config=dataclasses.replace(cfg.vision_config, remat=True),
    )
    loss_r, g_r = grads_for(rcfg)
    assert loss_r == loss_ref
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_flatten_with_path(g_ref)[0],
        jax.tree_util.tree_flatten_with_path(g_r)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(ka))

    # scanned + remat compiles and matches the scanned loss
    def stack_map(p):
        p = dict(p)
        p["language_model"] = stack_decoder_layers(p["language_model"])
        return p

    scfg = cfg.replace(text_config=dataclasses.replace(cfg.text_config, scan_layers=True))
    srcfg = cfg.replace(text_config=dataclasses.replace(cfg.text_config, scan_layers=True, remat=True))
    loss_s, _ = grads_for(scfg, stack_map)
    loss_sr, _ = grads_for(srcfg, stack_map)
    np.testing.assert_allclose(loss_sr, loss_s, rtol=1e-6)


def test_pipeline_parallel_prefill_parity():
    """GPipe-style pp over the scan_layers stack: forward AND grads match the
    single-device decoder exactly (4 stages, 2 microbatches per stage batch)."""
    import dataclasses

    from hicom_tpu.models.qwen2 import Qwen2ForCausalLM
    from hicom_tpu.parallel.pipeline import create_pp_mesh, pipeline_prefill

    cfg = dataclasses.replace(
        tiny_test_config().text_config, num_hidden_layers=4, scan_layers=True)
    model = Qwen2ForCausalLM(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b, L = 8, 12
    embeds = jnp.asarray(rng.standard_normal((b, L, cfg.hidden_size)).astype(np.float32))
    positions = jnp.tile(jnp.arange(L)[None], (b, 1))
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, 4)))
    params = model.init(jax.random.PRNGKey(0), embeds, positions)["params"]

    mesh = create_pp_mesh(4, jax.devices()[:4])

    def direct_hidden(p):
        hidden, _ = model.apply({"params": p}, embeds, positions, method=lambda m, e, pos: m.model(e, pos))
        return hidden

    def pp_hidden(p):
        return pipeline_prefill(cfg, p, embeds, positions, mesh,
                                num_microbatches=2, dtype=jnp.float32)

    ref = direct_hidden(params)
    got = jax.jit(pp_hidden)(params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # gradients through the pipeline (pp training viability)
    def loss_direct(p):
        return jnp.sum(direct_hidden(p) ** 2)

    def loss_pp(p):
        return jnp.sum(pp_hidden(p) ** 2)

    g_ref = jax.grad(loss_direct)(params)
    g_pp = jax.grad(loss_pp)(params)
    ref_leaves = jax.tree_util.tree_leaves_with_path(g_ref["model"]["layers"])
    pp_leaves = dict(jax.tree_util.tree_leaves_with_path(g_pp["model"]["layers"]))
    for path, leaf in ref_leaves:
        np.testing.assert_allclose(np.asarray(pp_leaves[path]), np.asarray(leaf),
                                   rtol=5e-4, atol=5e-4, err_msg=str(path))
