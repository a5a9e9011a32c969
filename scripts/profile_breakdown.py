"""Per-stage device-time breakdown of the video pipeline on the real chip.

Stages: SigLIP tower, HICom compression, decoder prefill, single decode step.
Timings use chained in-program repetition + scalar fetch (relay-safe; see
hicom_tpu/profiling.py and CLAUDE.md). Run when a perf question needs to know
WHERE the time goes — e.g. which stage to kernel-optimize next.

Usage: python scripts/profile_breakdown.py [--small] [--frames 32] [--batch 1]
       [--chain 8] [--flash 0|1]
Prints one JSON object with per-stage ms and fractions.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--flash", default=None, help="set HICOM_FLASH_ATTENTION")
    ap.add_argument("--decode-len", type=int, default=1024, help="cache fill for the decode-step timing")
    ap.add_argument("--tower-quant", choices=("none", "w8a8", "w8a8_mlp", "w8a8_mlp_qkv",
                                              "w8a8s", "w8a8s_mlp", "w8a8s_mlp_qkv"),
                    default="none",
                    help="profile the quantized serving tower (models/quant.py); "
                         "w8a8s* arms calibrate act scales untimed first")
    ap.add_argument("--dec-quant", choices=("none", "int8", "w8a8", "w8a8_mlp", "w8a8s"),
                    default="none",
                    help="decoder quantization (pass w8a8 to profile the bench "
                         "headline's serving numerics)")
    args = ap.parse_args()
    if args.flash is not None:
        os.environ["HICOM_FLASH_ATTENTION"] = args.flash

    from bench import tpu_alive

    if not args.small and not tpu_alive():
        print(json.dumps({"error": "TPU relay unreachable"}))
        return

    import jax

    if args.small:
        # sanity mode runs anywhere — don't touch the (possibly dead) relay
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from hicom_tpu.config import HIComConfig, Qwen2Config, SiglipTextConfig, SiglipVisionConfig, tiny_test_config
    from hicom_tpu.constants import VIDEO_TOKEN_INDEX
    from hicom_tpu.models.hicom import HIComModel
    from hicom_tpu.models.qwen2 import KVCache
    from hicom_tpu.profiling import device_time

    if args.small:
        cfg = tiny_test_config(use_guide="direct", dtype="bfloat16")
        t = 4
    else:
        cfg = HIComConfig(
            text_config=Qwen2Config(
                vocab_size=151936, hidden_size=1536, intermediate_size=8960,
                num_hidden_layers=28, num_attention_heads=12, num_key_value_heads=2,
                head_dim=128, rope_theta=1000000.0,
                quantization=None if args.dec_quant == "none" else args.dec_quant,
            ),
            vision_config=SiglipVisionConfig(
                quantization=None if args.tower_quant == "none" else args.tower_quant),
            guide_text_config=SiglipTextConfig(),
            mm_vision_tower="google/siglip-so400m-patch14-384",
            mm_projector_type="local43_global32",
            use_guide="direct",
            num_frames=args.frames,
            dtype="bfloat16",
        )
        t = args.frames

    model = HIComModel(config=cfg)
    rng = np.random.default_rng(0)
    img = cfg.vision_config.image_size
    b, L = args.batch, 48
    ids = rng.integers(5, cfg.text_config.vocab_size, (b, L))
    ids[:, 2] = VIDEO_TOKEN_INDEX
    input_ids = jnp.asarray(ids)
    frames = jnp.asarray(rng.standard_normal((b, t, 3, img, img)).astype(np.float32), dtype=jnp.bfloat16)
    gids = jnp.asarray(rng.integers(1, cfg.guide_text_config.vocab_size, (b, 24)))

    init_ids = input_ids[:1, :8].at[0, 2].set(VIDEO_TOKEN_INDEX)
    shapes = jax.eval_shape(
        lambda r: model.init(r, init_ids, frames[:1, :1], guide_ids=gids[:1], modal="video")["params"],
        jax.random.PRNGKey(0),
    )
    from bench import calibrate_static_decoder, calibrate_static_tower, random_params_like

    # dtype-aware (int8 quantized kernels); serving profiles store floating
    # leaves bf16 as the real load path does (api.py:568) so decode weight
    # streaming isn't inflated by fp32 init storage
    params = random_params_like(shapes, float_dtype=None if args.small else jnp.bfloat16)
    if not args.small and args.tower_quant.startswith("w8a8s"):
        params = calibrate_static_tower(model, cfg, params, frames, gids, args.tower_quant)
    if not args.small and args.dec_quant.startswith("w8a8s"):
        params = calibrate_static_decoder(model, cfg, params, input_ids, frames, gids, args.dec_quant)

    # ---- stage inputs (computed once, then timed per stage) ----
    def stage_tower(params, frames):
        flat = frames.reshape((b * t,) + frames.shape[2:])
        return model.apply({"params": params}, method=lambda m: m.vision_tower(flat))

    feats, embeds = jax.jit(stage_tower)(params, frames)
    feats = jax.tree.map(lambda x: x.reshape((b, t) + x.shape[1:]), feats)
    if embeds is not None:
        embeds = embeds.reshape((b, t) + embeds.shape[1:])

    def stage_guide(params, gids):
        return model.apply({"params": params}, method=lambda m: m.encode_guide(gids))

    ge = jax.jit(stage_guide)(params, gids)

    import flax.linen as nn

    def stage_compress(params, feats, embeds, ge):
        def run(m):
            nl = None
            in_axes = (0, 0 if embeds is not None else None, 0, None, None)
            vp = nn.vmap(lambda mdl, *a: mdl(*a), in_axes=in_axes, out_axes=0,
                         variable_axes={"params": None}, split_rngs={"params": False})
            return vp(m.mm_projector, feats, embeds, ge, "video", nl)

        return model.apply({"params": params}, method=run)

    visual = jax.jit(stage_compress)(params, feats, embeds, ge)

    def stage_prefill(params, input_ids, visual):
        def run(m):
            spliced = m.embed_and_splice(input_ids, visual)
            hidden, _ = m.language_model.model(spliced.embeds, spliced.positions)
            return m.language_model.logits(hidden[:, -1:])

        return model.apply({"params": params}, method=run)

    tc = cfg.text_config
    cache_len = args.decode_len
    cache = KVCache.zeros(tc.num_hidden_layers, b, tc.num_key_value_heads, cache_len,
                          tc.head_dim, jnp.bfloat16)
    # pretend the cache is full up to decode_len-1
    cache = cache._replace(
        length=jnp.full((b,), cache_len - 1, jnp.int32),
        valid=jnp.ones((b, cache_len), bool).at[:, -1].set(False),
    )
    step_emb = jnp.asarray(rng.standard_normal((b, 1, tc.hidden_size)), jnp.bfloat16)

    def stage_decode(params, emb, cache):
        def run(m):
            pos = jnp.full((b, 1), cache_len - 1, jnp.int32)
            hidden, _ = m.language_model.model(emb, pos, cache)
            return m.language_model.logits(hidden)

        return model.apply({"params": params}, method=run)

    def stage_e2e(params, input_ids, frames, gids):
        def run(m):
            ge = m.encode_guide(gids)
            visual = m.encode_visual(frames, ge, "video")
            spliced = m.embed_and_splice(input_ids, visual)
            hidden, _ = m.language_model.model(spliced.embeds, spliced.positions)
            return m.language_model.logits(hidden[:, -1:])

        return model.apply({"params": params}, method=run)

    kw = dict(iters=args.iters, chain=args.chain)
    times = {
        "vision_tower_ms": device_time(stage_tower, params, frames, **kw) * 1e3,
        "guide_encode_ms": device_time(stage_guide, params, gids, **kw) * 1e3,
        "compression_ms": device_time(stage_compress, params, feats, embeds, ge, **kw) * 1e3,
        "splice_prefill_ms": device_time(stage_prefill, params, input_ids, visual, **kw) * 1e3,
        "decode_step_ms": device_time(stage_decode, params, step_emb, cache, **kw) * 1e3,
        "e2e_prefill_ms": device_time(stage_e2e, params, input_ids, frames, gids, **kw) * 1e3,
    }
    total = times["vision_tower_ms"] + times["guide_encode_ms"] + times["compression_ms"] + times["splice_prefill_ms"]
    out = {
        "config": "tiny" if args.small else "so400m+qwen2.5-1.5B" + (
            "" if args.tower_quant == "none" else f"-tower:{args.tower_quant}") + (
            "" if args.dec_quant == "none" else f"-dec:{args.dec_quant}"),
        "batch": b, "frames": t, "chain": args.chain,
        "flash": os.environ.get("HICOM_FLASH_ATTENTION", "1"),
        "times_ms": {k: round(v, 3) for k, v in times.items()},
        "stage_fraction_of_sum": {
            k: round(times[k] / total, 3)
            for k in ("vision_tower_ms", "guide_encode_ms", "compression_ms", "splice_prefill_ms")
        },
        "decode_tokens_per_sec": round(b / (times["decode_step_ms"] / 1e3), 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
