"""Benchmark: end-to-end video compression + prefill throughput on one chip.

Measures the reference's headline pipeline (SURVEY.md §6 / BASELINE.json):
32-frame video → SigLIP-so400m patch encoding → HICom local43+global32
compression (guide=direct) → decoder prefill over [visual; text] tokens →
first-token logits. Reported as frames/sec/chip.

``vs_baseline`` compares against an analytic A100 PyTorch estimate for the
identical computation (bf16 roofline at 45% MFU — generous to the reference,
which runs eval at batch 1 with Python-loop projectors; see BASELINE.md).

Default batch is 4 videos/step — the batched-serving configuration this
framework adds over the reference (which evals at batch 1); ``--batch 1``
reproduces the reference's serving shape. The default serving numerics
(static-calibrated int8-MXU tower MLP+QKV, w8a8 decoder prefill) measure
**194-195 f/s** in healthy windows (BENCH_DEFAULT_r05.json; the chip is
compute-saturated at b=4 — b=8 measured neutral, BENCH_BATCH8_r05.json).
``--modal image`` benches the single-image pipeline; ``--frames 64`` the
beyond-reference long-video shape; ``--decode`` / ``--train`` /
``--from-disk`` the serving-step, train-step and ingest-inclusive modes.

Run: python bench.py            (full size: so400m + Qwen2.5-1.5B decoder)
     python bench.py --small    (CI-sized sanity run)
"""

import argparse
import json
import os
import sys
import time

import numpy as np


CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache.json")


def tpu_alive(timeout_s: "int | None" = None, attempts: "int | None" = None) -> bool:
    """The axon relay can die (remote_compile connection refused); probe in a
    subprocess so a wedged backend can't hang the benchmark driver.

    The default 120s covers jax import + one tiny remote compile (~75s on an
    idle host); when the single host core is contended (e.g. a test suite
    running), raise via HICOM_PROBE_TIMEOUT (shared with __graft_entry__).
    HICOM_SKIP_PROBE=1 performs NO check at all and trusts the caller to have
    verified the relay directly (e.g. scripts/relay_health.py) — the probe
    subprocess itself costs 60-90s on the contended single-core host.

    One immediate bounded retry, NO backoff sleeps (VERDICT r3 weak-1: the old
    3x120s+90s backoff burned ~7 min of the driver budget before any work; a
    relay that is down twice in a row is down for the round — the cached
    fallback is the right answer then). Worst case 2 x timeout_s."""
    import subprocess

    if os.environ.get("HICOM_SKIP_PROBE") == "1":
        return True
    if timeout_s is None:
        timeout_s = int(os.environ.get("HICOM_PROBE_TIMEOUT", "120"))
    if attempts is None:
        attempts = int(os.environ.get("HICOM_PROBE_ATTEMPTS", "2"))

    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; assert float(jnp.sum(jnp.ones((8,8)))) == 64.0"],
                timeout=timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                return True
            sys.stderr.write(f"tpu probe attempt {i + 1}/{attempts} failed (rc={r.returncode})\n")
        except Exception as e:  # noqa: BLE001
            sys.stderr.write(f"tpu probe attempt {i + 1}/{attempts}: {type(e).__name__}\n")
    return False


def relay_health():
    """In-process chip-health figure recorded into every bench JSON so numbers
    are comparable across relay windows (throughput varies ~3x over hours —
    see scripts/relay_health.py). Healthy ≈ 95-100ms / ~127-131 TFLOP/s."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((23328, 1152)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((1152, 4304)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((4304, 1152)), jnp.bfloat16)

    @jax.jit
    def mlp27(x, w1, w2):
        for _ in range(27):
            x = jax.nn.gelu(x @ w1) @ w2
        return jnp.sum(x.astype(jnp.float32))

    float(mlp27(x0, w1, w2))
    t0 = time.perf_counter()
    for _ in range(3):
        float(mlp27(x0, w1, w2))
    dt = (time.perf_counter() - t0) / 3
    fl = 27 * 2 * 23328 * 1152 * 4304 * 2
    return {"mlp27_ms": round(dt * 1e3, 1), "tflops": round(fl / dt / 1e12, 1),
            "healthy": dt < 0.150}


def _cached_fallback(reason: str):
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cached = json.load(f)
        cached["detail"]["stale"] = reason
        # self-describing age (VERDICT r4 weak-1): a consumer must be able to
        # tell a day-old replay from a month-old one, and a silent perf
        # regression must not hide behind an undated cache forever.
        prov = cached["detail"].get("cache_provenance")
        if prov and "run_unix" in prov:
            cached["detail"]["stale_age_hours"] = round(
                (time.time() - prov["run_unix"]) / 3600.0, 1)
            cached["detail"]["stale_run_date"] = prov.get("run_date")
        print(json.dumps(cached))
        return
    print(json.dumps({"metric": "video_frames_per_sec_per_chip_e2e_prefill",
                      "value": 0, "unit": "frames/s", "vs_baseline": 0,
                      "detail": {"error": reason + ", no cached result"}}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="tiny config sanity run")
    ap.add_argument("--batch", type=int, default=4, help="videos per step (4 = batched serving config; 1 = reference shape)")
    ap.add_argument("--model", choices=("1.5b", "7b"), default="1.5b",
                    help="decoder scale; 7b runs the flagship Qwen2.5-7B dims with int8 weight-only (bf16 7B does not fit a 16GB chip)")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--modal", choices=("video", "image"), default="video",
                    help="image: single-image prefill pipeline (T=1 local "
                         "compression → 113 visual tokens, reference "
                         "projector.py:536); use a larger --batch (e.g. 32) "
                         "since one image is 1/32 the tower work of a video")
    ap.add_argument("--iters", type=int, default=16,
                    help="timed iterations (sync_every per group; the headline "
                         "is the median group so >=4 groups ride out one "
                         "co-tenant stall)")
    ap.add_argument("--iters-bf16", type=int, default=8,
                    help="timed iterations for the secondary bf16-numerics arm "
                         "(half the headline's: the headline JSON is already "
                         "printed by then, so this arm only refines "
                         "vs_baseline_bf16 and must fit the driver budget)")
    ap.add_argument("--sync-every", type=int, default=4,
                    help="host sync cadence (the ~30ms relay round trip is "
                         "pure idle; 4 keeps it ~1-2%% of a b=4 group)")
    ap.add_argument("--no-cache", action="store_true", help="don't overwrite the cached result (A/B runs)")
    ap.add_argument("--no-bf16-arm", action="store_true",
                    help="skip the interleaved fp-numerics reference arm "
                         "(default ON so every bench JSON carries both "
                         "vs_baseline and vs_baseline_bf16; skip for quick A/Bs)")
    ap.add_argument("--tower-quant", choices=("none", "w8a8", "w8a8_mlp", "w8a8_mlp_qkv",
                                              "w8a8s", "w8a8s_mlp", "w8a8s_mlp_qkv"),
                    default=os.environ.get("HICOM_TOWER_QUANT", "w8a8s_mlp_qkv"),
                    help="serving-tower quantization (default w8a8s_mlp_qkv: "
                         "int8 MXU for fc1/fc2 + q/k/v with CALIBRATED static "
                         "activation scales so the quantize fuses into the "
                         "producer; out_proj stays fp. Interleaved chip A/B "
                         "2026-08-18: w8a8s_mlp_qkv 195.3 ~= full w8a8s 195.0 "
                         "vs dynamic w8a8_mlp_qkv 177.8 f/s (+9.8%%); 'none' "
                         "= bf16 reference numerics)")
    ap.add_argument("--dec-quant", choices=("none", "int8", "w8a8", "w8a8_mlp",
                                            "w8a8s", "w8a8s_mlp"),
                    default=os.environ.get("HICOM_DEC_QUANT", "w8a8"),
                    help="decoder quantization for the prefill bench (default "
                         "w8a8: int8 MXU serving prefill — chip A/B 177.5 vs "
                         "174.9 f/s on top of w8a8_mlp_qkv tower; w8a8s* = "
                         "static CALIBRATED activation scales so the quantize "
                         "fuses into the producer, as the tower's w8a8s does)")
    ap.add_argument("--decode", action="store_true",
                    help="measure decode steps at b∈{1,4,8} instead of the "
                         "e2e prefill metric (serving throughput table)")
    ap.add_argument("--train", action="store_true",
                    help="measure the sharded train step at the serving shape "
                         "(stage-2 freeze matrix, remat + flash fwd/bwd): "
                         "step ms, target tokens/s, achieved TFLOP/s + MFU")
    ap.add_argument("--kv-int8", action="store_true", help="decode mode: int8 KV cache")
    ap.add_argument("--train-parts", default="mm_projector",
                    help="train mode: mm_tunable_parts freeze matrix. Default "
                         "is the reference's stage-1 projector pretrain — the "
                         "largest stage one 16GB chip holds at 1.5B (full-SFT "
                         "Adam OOMs; that scale is the multi-chip fsdp path)")
    ap.add_argument("--bits", type=int, default=16, choices=(4, 8, 16),
                    help="train mode: QLoRA — NF4 (4) / int8 (8) frozen "
                         "decoder + rank-64 LoRA adapters (the reference's "
                         "kbit SFT, train.py:567-587). This is the only "
                         "decoder-in-the-loop training stage one 16GB chip "
                         "holds at 7B (test_qlora_memory_7b_fits_16gb): "
                         "python bench.py --train --model 7b --bits 4")
    ap.add_argument("--lora-r", type=int, default=64,
                    help="train mode with --bits 4/8: LoRA rank")
    ap.add_argument("--from-disk", action="store_true",
                    help="e2e including HOST INGEST: decode+preprocess real "
                         "mp4s from disk (native reader) while the chip "
                         "computes — the headline can't silently exclude ingest")
    ap.add_argument("--host-preprocess", action="store_true",
                    help="from-disk mode: preprocess on the host (PIL-parity "
                         "C++/PIL path) instead of the default on-device "
                         "pad+resize+normalize (ops/preprocess.py) — the A/B "
                         "for the ~300ms/video host scalar-resize cost")
    args = ap.parse_args()
    args._t0 = time.monotonic()  # driver-budget clock (HICOM_BENCH_BUDGET)
    if args.train and args.model == "7b" and args.bits == 16:
        ap.error("--train at full precision measures the full-finetune step; "
                 "a bf16 7B decoder does not fit one 16GB chip — 7B training "
                 "on one chip is the QLoRA path: add --bits 4 (NF4) or "
                 "--bits 8 (int8)")
    if args.bits != 16 and not args.train:
        ap.error("--bits 4/8 selects the QLoRA train step; it requires --train")

    # --small is a sanity mode: one short probe decides TPU-vs-CPU fast
    # instead of the full 3-attempt backoff (~7 min against a dead relay)
    alive = tpu_alive(timeout_s=90, attempts=1) if args.small else tpu_alive()
    if not args.small and not alive:
        _cached_fallback("TPU relay unreachable; last successful run")
        return
    if args.small and not alive:
        # sanity mode still works with the relay down
        import jax

        jax.config.update("jax_platforms", "cpu")

    # New Pallas paths (grouped-GQA flash etc.) default-on: if anything fails
    # to compile on the real chip, step down to safe flags rather than crash
    # the benchmark (each retry clears jit caches so env gates re-apply).
    runner = (_run_train if args.train else
              _run_decode if args.decode else
              _run_from_disk if args.from_disk else _run)
    for attempt, env in enumerate((
        {},
        {"HICOM_FLASH_GQA": "0"},
        {"HICOM_FLASH_GQA": "0", "HICOM_FLASH_ATTENTION": "0"},
    )):
        os.environ.update(env)
        try:
            runner(args, dict(env))
            return
        except Exception as e:  # noqa: BLE001
            sys.stderr.write(f"bench attempt {attempt} failed ({env}): {type(e).__name__}: {e}\n")
            if getattr(args, "_printed", False):
                return  # a valid headline JSON already landed — don't shadow it
            try:
                import jax

                jax.clear_caches()
            except Exception:
                pass
    _cached_fallback("benchmark failed on-chip at all flag levels; last successful run")


def serving_config(model: str = "1.5b", frames: int = 32, tower_quant: str = None, **overrides):
    """The benchmark/serving model configs, shared with scripts/decode_ab.py.

    "1.5b": so400m + Qwen2.5-1.5B-scale decoder (fits one v5e chip in bf16).
    "7b":   flagship Qwen2.5-7B dims, int8 weight-only decoder.
    ``tower_quant``: None | "w8a8" — int8 serving tower (models/quant.py).
    ``overrides`` update the text config (e.g. kv_cache_int8=True).
    """
    from hicom_tpu.config import HIComConfig, Qwen2Config, SiglipTextConfig, SiglipVisionConfig

    if model == "7b":
        text = dict(
            vocab_size=152064, hidden_size=3584, intermediate_size=18944,
            num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
            head_dim=128, rope_theta=1000000.0, quantization="int8",
        )
    else:
        text = dict(
            vocab_size=151936, hidden_size=1536, intermediate_size=8960,
            num_hidden_layers=28, num_attention_heads=12, num_key_value_heads=2,
            head_dim=128, rope_theta=1000000.0,
        )
    text.update(overrides)
    return HIComConfig(
        text_config=Qwen2Config(**text),
        vision_config=SiglipVisionConfig(quantization=tower_quant),
        guide_text_config=SiglipTextConfig(),
        mm_vision_tower="google/siglip-so400m-patch14-384",
        mm_projector_type="local43_global32",
        use_guide="direct",
        num_frames=frames,
        dtype="bfloat16",
    )



def random_params_like(shapes, float_dtype=None):
    """Random params matching an eval_shape tree, generated on-device in one
    jitted program (never materializes an fp32 host tree; dtype-aware so int8/
    uint8 quantized kernels get integer codes). Shared with scripts/decode_ab.py.

    ``float_dtype``: override the dtype of every FLOATING leaf (int leaves
    keep theirs). Serving/decode benches pass ``jnp.bfloat16`` to mirror the
    real load path — load_pretrained_model casts all floating leaves to the
    serving dtype at device_put (api.py:568) — so init-shape fp32 storage
    never inflates weight-streaming bytes (or HBM: the 7B serving tree is
    14.5 GB fp32 vs ~10.5 GB bf16+int8 on a 16 GB chip). Training modes keep
    the init dtypes (fp32 masters)."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def make(key):
        keys = jax.random.split(key, len(leaves))
        vals = []
        for k, s in zip(keys, leaves):
            if s.dtype in (jnp.int8, jnp.uint8):  # quantized kernels/codes
                vals.append(jax.random.randint(k, s.shape, -120, 120, jnp.int32).astype(s.dtype))
            else:  # weights and (for quantized layers) f32 scales
                dt = float_dtype if float_dtype is not None else s.dtype
                vals.append(jax.random.normal(k, s.shape, jnp.bfloat16).astype(dt) * 0.02)
        return jax.tree_util.tree_unflatten(treedef, vals)

    return make(jax.random.PRNGKey(0))


def calibrate_static_tower(model, cfg, params, frames, gids, tower_quant):
    """Fill the static-quant tower's act_scale params from one calibration
    forward: a '+calib' twin model (identical param tree) quantizes with live
    per-tensor absmax while sowing each site's amax into the 'calib'
    collection (models/quant.py). Runs on a small frame slice — scales are
    shape-independent — so the extra (untimed) compile stays cheap. Shared
    with scripts/tower_quant_ab.py."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from hicom_tpu.models.hicom import HIComModel
    from hicom_tpu.models.quant import fill_act_scales

    ccfg = dataclasses.replace(
        cfg, vision_config=dataclasses.replace(
            cfg.vision_config, quantization=tower_quant + "+calib"))
    cmodel = HIComModel(config=ccfg)
    cf, cg = frames[:1, : min(8, frames.shape[1])], gids[:1]

    @jax.jit
    def calib_fn(params, f, g):
        def run(m):
            ge = m.encode_guide(g)
            visual = m.encode_visual(f, ge, "video")
            return jnp.sum(visual.astype(jnp.float32))

        return cmodel.apply({"params": params}, method=run, mutable=["calib"])

    _, mut = calib_fn(params, cf, cg)
    return fill_act_scales(params, jax.device_get(mut["calib"]))


def calibrate_static_decoder(model, cfg, params, input_ids, frames, gids, dec_quant):
    """Fill the static-quant DECODER's act_scale params (dec "w8a8s*" modes —
    VERDICT r4 next-1): a '+calib' text-config twin runs the real serving
    prefill (guide → visual → splice → decoder) with live per-tensor absmax
    quantization while sowing each W8A8DenseS site's amax, then
    fill_act_scales writes scales/smoothing into the tree. One frame-slice
    forward — per-tensor scales are shape-independent. The tower config is
    left as-is (already calibrated or dynamic), so tower sites sow nothing."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from hicom_tpu.models.hicom import HIComModel
    from hicom_tpu.models.quant import fill_act_scales

    ccfg = dataclasses.replace(
        cfg, text_config=dataclasses.replace(
            cfg.text_config, quantization=dec_quant + "+calib"))
    cmodel = HIComModel(config=ccfg)
    cf = frames[:1, : min(8, frames.shape[1])]

    @jax.jit
    def calib_fn(params, ids, f, g):
        def run(m):
            ge = m.encode_guide(g)
            visual = m.encode_visual(f, ge, "video")
            spliced = m.embed_and_splice(ids, visual)
            hidden, _ = m.language_model.model(spliced.embeds, spliced.positions)
            return jnp.sum(m.language_model.logits(hidden[:, -1:]).astype(jnp.float32))

        return cmodel.apply({"params": params}, method=run, mutable=["calib"])

    _, mut = calib_fn(params, input_ids[:1], cf, gids[:1])
    return fill_act_scales(params, jax.device_get(mut["calib"]))


def _run_train(args, flags):
    """Training-step throughput ON ONE CHIP (VERDICT r2 next-4): so400m
    tower + projector + decoder with remat + flash fwd/bwd, grad-accum 1.

    Default ``--train-parts mm_projector`` is the reference's STAGE-1
    projector pretrain (``scripts/pretrain*.sh``): tower and LM frozen
    (stop_gradient prunes both backwards at trace time), projector trains.
    That is the largest reference training stage a single 16GB chip can hold
    for the 1.5B shape: full-SFT Adam (stage 2, ``--train-parts
    mm_projector,language_model``) peaks at params(10.6GB fp32) +
    grads(9.5GB) + moments(14.3GB) at the update — measured
    RESOURCE_EXHAUSTED at b=4 AND b=2, and host-offloading the moments only
    moves the peak to the update's transient copy. Stage-2 scale is the
    multi-chip fsdp path (dryrun_multichip); the reference itself trains on
    8x80GB A100s.

    ``vs_baseline`` = measured step rate over the analytic A100 model of the
    same step (bf16 roofline @45% MFU — BASELINE.md §baseline-derivation)."""
    import jax
    import jax.numpy as jnp

    from hicom_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
    from hicom_tpu.models.hicom import HIComModel
    from hicom_tpu.train.optimizer import build_optimizer
    from hicom_tpu.train.train_step import TrainState, make_loss_fn, make_train_step

    parts = args.train_parts
    if args.small:  # CPU sanity of the mode itself, not a measurement
        from hicom_tpu.config import tiny_test_config

        cfg = tiny_test_config(use_guide="direct", dtype="float32")
        import dataclasses as _dc

        cfg = cfg.replace(text_config=_dc.replace(cfg.text_config, remat=True))
        b, t, L = 2, 4, 16
    else:
        # QLoRA runs the QUANTIZED decoder modules (QuantDense/QuantDense4):
        # NF4/int8 kernels dequantize INSIDE each layer's remat boundary and
        # adapters ride the lora_interceptor side-path — merging into fp
        # kernels instead keeps the whole 13GB fp decoder alive across
        # fwd+bwd (measured XLA compile OOM at 7B: 27.5G requested).
        over = {"quantization": "nf4" if args.bits == 4 else "int8"} if args.bits != 16 else {}
        cfg = serving_config(args.model, frames=args.frames, remat=True, **over)
        b, t, L = args.batch, args.frames, 48
    model = HIComModel(config=cfg)
    rng = np.random.default_rng(0)
    img = cfg.vision_config.image_size
    requested_b = b

    def make_batch(b):
        ids = rng.integers(5, cfg.text_config.vocab_size, (b, L))
        ids[:, 2] = VIDEO_TOKEN_INDEX
        labels = np.array(ids)
        labels[:, :8] = IGNORE_INDEX
        return {
            "input_ids": jnp.asarray(ids),
            "frames": jnp.asarray(rng.standard_normal((b, t, 3, img, img)).astype(np.float32), jnp.bfloat16),
            "labels": jnp.asarray(labels),
            "guide_ids": jnp.asarray(rng.integers(1, cfg.guide_text_config.vocab_size, (b, 24))),
        }

    batch = make_batch(b)

    shapes = jax.eval_shape(
        lambda r: model.init(r, batch["input_ids"][:1, :8].at[0, 2].set(VIDEO_TOKEN_INDEX),
                             batch["frames"][:1, :1], guide_ids=batch["guide_ids"][:1],
                             labels=batch["labels"][:1, :8], modal="video")["params"],
        jax.random.PRNGKey(0))

    if args.bits != 16:
        # QLoRA (VERDICT r3 next-6): NF4/int8 frozen decoder + LoRA adapters —
        # the reference's kbit SFT (train.py:567-587) and the only decoder-in-
        # the-loop training stage one 16GB chip holds at 7B. The model above
        # was built with quantization=nf4/int8, so `shapes` IS the quantized
        # layout (the fp 7B tree never exists); adapters attach via
        # lora_interceptor (side-path, not merge), keeping dequantization
        # inside the per-layer remat boundary. Frozen floats stored bf16.
        import optax

        from hicom_tpu.train.lora import init_lora_params, lora_interceptor

        qmode = cfg.text_config.quantization or "int8"
        params = random_params_like(shapes, float_dtype=jnp.bfloat16)
        lora = init_lora_params(shapes, rank=args.lora_r, rng=jax.random.PRNGKey(0))
        tx = optax.adamw(1e-4)
        opt_state = jax.jit(tx.init)(lora)
        base_loss = make_loss_fn(model, "video", has_frames=True)
        parts = f"qlora_{qmode}_r{args.lora_r}"

        def qlora_step(carry, params, batch):
            import flax.linen as fnn

            lora_p, opt_st, n = carry

            def loss_fn(lora_p, batch):
                with fnn.intercept_methods(lora_interceptor(lora_p, 16.0, args.lora_r)):
                    return base_loss(params, batch)

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora_p, batch)
            updates, opt_st = tx.update(grads, opt_st, lora_p)
            return (optax.apply_updates(lora_p, updates), opt_st, n + 1), metrics

        jstep = jax.jit(qlora_step, donate_argnums=0)
        state = (lora, opt_state, jnp.zeros((), jnp.int32))
        step = lambda st, b_: jstep(st, params, b_)  # noqa: E731
    else:
        params = random_params_like(shapes)
        optimizer = build_optimizer(
            shapes, learning_rate=1e-5, total_steps=1000, tunable_parts=parts,
            use_guide=cfg.use_guide, schedule_kind="constant")
        opt_state = jax.jit(optimizer.init)(params)
        state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
        step = jax.jit(
            make_train_step(model, optimizer, tunable_parts=parts, use_guide=cfg.use_guide),
            donate_argnums=0)

    health = None
    if not args.small:
        health = relay_health()
        print(f"relay_health: {health}", file=sys.stderr)

    # Compile with batch auto-shrink (VERDICT r4 next-2): the 7B QLoRA step at
    # the default b=4 compiles to ~20.1 GB on the 16 GB chip — rather than
    # dying, halve the batch and retry (params/opt state are b-independent;
    # only the batch is rebuilt, and a compile-time OOM raises before any
    # donated buffer is consumed, so `state` remains valid).
    while True:
        try:
            state, metrics = step(state, batch)
            float(metrics["loss"])  # compile + warm fetch
            break
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            oom = ("RESOURCE_EXHAUSTED" in msg or "resource_exhausted" in msg
                   or "out of memory" in msg.lower() or "exceeds the limit" in msg)
            if not oom or b <= 1:
                raise
            print(f"compile OOM at batch {b}; retrying batch {b // 2} "
                  f"({type(e).__name__}: {msg[:160]})", file=sys.stderr)
            b //= 2
            batch = make_batch(b)
    for _ in range(args.sync_every):  # untimed post-compile group (relay warmup)
        state, metrics = step(state, batch)
    float(metrics["loss"])

    group_dts = []
    for i in range(0, args.iters, args.sync_every):
        n_in_group = min(args.sync_every, args.iters - i)
        g0 = time.perf_counter()
        for _ in range(n_in_group):
            state, metrics = step(state, batch)
        float(metrics["loss"])
        group_dts.append((time.perf_counter() - g0) / n_in_group)
    dt = sorted(group_dts)[len(group_dts) // 2]

    # FLOPs per freeze matrix (optimizer.is_tunable): the tower is the graph
    # ROOT, so frozen tower = forward only (1x; stop_gradient prunes its
    # backward entirely). The decoder+head sit DOWNSTREAM of the trainable
    # projector, so even frozen they pay the activation-backward pass
    # (dL/dx ≈ 1x forward) to carry gradients back to the spliced visual
    # tokens — 2x when frozen, 3x (fwd + dL/dx + dL/dW) when trainable.
    # QLoRA: tower 1x (no grad path reaches it), decoder/head 2x (fwd +
    # activation backward; the adapter dL/dW is rank·(in+out) — negligible).
    vis_mult = 3 if "pure_vision_model" in parts else 1
    lm_mult = 3 if "language_model" in parts else 2
    v, tc = cfg.vision_config, cfg.text_config
    tokens = v.num_patches
    vis_params = v.num_hidden_layers * (4 * v.hidden_size**2 + 2 * v.hidden_size * v.intermediate_size)
    vis = 2 * vis_params * tokens * (b * t) + v.num_hidden_layers * (b * t) * 4 * tokens**2 * v.hidden_size
    Vtok = 680 if not args.small else 36
    S = L - 1 + Vtok
    dec_params = tc.num_hidden_layers * (
        tc.hidden_size * tc.head_dim * (tc.num_attention_heads + 2 * tc.num_key_value_heads)
        + tc.num_attention_heads * tc.head_dim * tc.hidden_size
        + 3 * tc.hidden_size * tc.intermediate_size)
    dec = 2 * dec_params * S * b + tc.num_hidden_layers * b * 2 * S**2 * tc.num_attention_heads * tc.head_dim
    head = 2 * tc.vocab_size * tc.hidden_size * S * b
    flops = vis_mult * vis + lm_mult * (dec + head)  # remat recompute not counted (honest MFU)
    a100_sec = flops / (312e12 * 0.45)
    achieved_tflops = flops / dt / 1e12
    ceiling = max(BF16_CEILING_TFLOPS, (health or {}).get("tflops", 0.0))
    result = {
        "metric": "train_step_target_tokens_per_sec_per_chip",
        "value": round(b * S / dt, 1),
        "unit": "tok/s",
        "vs_baseline": round(a100_sec / dt, 3),
        "detail": {
            "step_ms": round(dt * 1e3, 1),
            "batch_videos": b, "frames_per_video": t, "spliced_len": S,
            "achieved_tflops": round(achieved_tflops, 1),
            "mfu_pct": round(100 * achieved_tflops / ceiling, 1),
            "group_ms": [round(g * 1e3, 1) for g in group_dts],
            "tunable_parts": parts, "remat": True,
            **({"auto_shrunk_from_batch": requested_b} if b != requested_b else {}),
            "config": ("tiny" if args.small else
                       f"so400m+qwen2.5-{args.model}"
                       + (f"-qlora{args.bits}bit" if args.bits != 16 else "")),
            "baseline_model": "analytic A100 bf16 roofline @45% MFU, same step (BASELINE.md §baseline-derivation)",
            "relay_health": health,
            **({"fallback_flags": flags} if flags else {}),
        },
    }
    print(json.dumps(result))


def _run_decode(args, flags):
    """Serving decode-step table at b∈{1,4,8} (one weight stream amortized
    over b sequences — batched decode is near-free until the cache reads
    dominate). ``vs_baseline`` = measured b=1 tok/s over the weight-streaming
    floor (decoder bytes / measured 159 GB/s HBM r+w)."""
    import jax
    import jax.numpy as jnp

    from hicom_tpu.constants import VIDEO_TOKEN_INDEX
    from hicom_tpu.models.hicom import HIComModel
    from hicom_tpu.models.qwen2 import KVCache
    from hicom_tpu.profiling import device_time

    cache_len = 1024
    if args.small:
        # CPU sanity of the mode (the full-size decode table is chip work)
        from hicom_tpu.config import tiny_test_config

        import dataclasses as _dc

        cfg = tiny_test_config(use_guide="direct", dtype="bfloat16")
        cfg = cfg.replace(text_config=_dc.replace(
            cfg.text_config, kv_cache_int8=args.kv_int8))
        cache_len = 128
    else:
        cfg = serving_config(args.model, frames=args.frames, kv_cache_int8=args.kv_int8)
    model = HIComModel(config=cfg)
    tc = cfg.text_config
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, 1000, (1, 8))).at[0, 2].set(VIDEO_TOKEN_INDEX)
    fr = jnp.asarray(rng.standard_normal((1, 1, 3, cfg.vision_config.image_size,
                                          cfg.vision_config.image_size)), jnp.bfloat16)
    gids = jnp.asarray(rng.integers(1, 100, (1, 24)))
    shapes = jax.eval_shape(
        lambda r: model.init(r, ids, fr, guide_ids=gids, modal="video")["params"],
        jax.random.PRNGKey(0))
    # serving dtype: floating leaves bf16, as the real load path stores them
    params = random_params_like(shapes, float_dtype=jnp.bfloat16)
    health = None
    if not args.small:
        health = relay_health()
        print(f"relay_health: {health}", file=sys.stderr)

    def step(params, emb, cache, pos):
        def run(m):
            hidden, c2 = m.language_model.model(emb, pos, cache)
            return m.language_model.logits(hidden), c2

        return model.apply({"params": params}, method=run)

    def feedback(out, a):
        logits, c2 = out
        emb2 = (logits[..., :tc.hidden_size] * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)
        return (a[0], emb2, c2, a[3] + 1)

    rows = []
    for b in (1, 4, 8):
        cache = KVCache.zeros(tc.num_hidden_layers, b, tc.num_key_value_heads,
                              cache_len, tc.head_dim, jnp.bfloat16, quantized=args.kv_int8)
        cache = cache._replace(
            length=jnp.full((b,), cache_len - 64, jnp.int32),
            valid=jnp.broadcast_to(jnp.arange(cache_len)[None, :] < cache_len - 64,
                                   (b, cache_len)),
        )
        emb = jnp.asarray(rng.standard_normal((b, 1, tc.hidden_size)), jnp.bfloat16)
        pos = jnp.full((b, 1), cache_len - 64, jnp.int32)
        t = device_time(step, params, emb, cache, pos, iters=2, chain=8, feedback=feedback)
        rows.append({"batch": b, "ms_per_step": round(t * 1e3, 2),
                     "tok_per_s": round(b / t, 1)})
        print(f"decode b={b}: {rows[-1]}", file=sys.stderr)

    wbytes = 1 if tc.quantization == "int8" else 2
    dec_bytes = tc.num_hidden_layers * (
        tc.hidden_size * tc.head_dim * (tc.num_attention_heads + 2 * tc.num_key_value_heads)
        + tc.num_attention_heads * tc.head_dim * tc.hidden_size
        + 3 * tc.hidden_size * tc.intermediate_size
    ) * wbytes + tc.vocab_size * tc.hidden_size * 2  # bf16 lm_head
    floor_tok_s = 159e9 / dec_bytes  # measured HBM r+w 159 GB/s
    result = {
        "metric": "decode_tok_per_s",
        "value": rows[0]["tok_per_s"],
        "unit": "tok/s@b1",
        "vs_baseline": round(rows[0]["tok_per_s"] / floor_tok_s, 3),
        "detail": {
            "table": rows, "cache_len": cache_len, "kv_int8": bool(args.kv_int8),
            "config": ("tiny" if args.small else
                       "so400m+qwen2.5-7B-int8" if args.model == "7b" else
                       "so400m+qwen2.5-1.5B"),
            "baseline_model": "weight-streaming floor (decoder bytes / 159 GB/s measured HBM)",
            "relay_health": health,
            **({"fallback_flags": flags} if flags else {}),
        },
    }
    print(json.dumps(result))


# measured MXU ceilings of this chip (scripts/int8_matmul_probe.py +
# relay_health, 2026-08-18): sustained bf16 tower-MLP chain ~131 TFLOP/s,
# raw int8 (static-scale) chain ~199.5 TOPS. The live relay_health figure
# supersedes the bf16 constant when higher.
BF16_CEILING_TFLOPS = 131.0
INT8_CEILING_TOPS = 199.5


def flops_components(cfg, b: int, t: int, L: int, small: bool):
    """FLOPs of the measured e2e pipeline split by SITE (tower qkv/out/mlp/
    attention, decoder linears/attention), so quantized arms can report MFU
    against a numerics-matched ceiling: int8-MXU sites ideal at ~199.5 TOPS,
    bf16 sites at the measured ~131 TFLOP/s (VERDICT r3 weak-7 — a single
    bf16 ceiling made quantized MFU read >100%). Compressor+guide are <2%
    and uncounted, as before. Returns (components dict, spliced length S)."""
    v, tc = cfg.vision_config, cfg.text_config
    n = v.num_patches
    vis_tok = n * (b * t)
    per = 2 * v.num_hidden_layers * vis_tok
    comp = {
        "vis_qkv": per * 3 * v.hidden_size ** 2,
        "vis_out": per * v.hidden_size ** 2,
        "vis_mlp": per * 2 * v.hidden_size * v.intermediate_size,
        # tower attention: qk^T + pV = 4·n²·d per layer-frame
        "vis_attn": v.num_hidden_layers * (b * t) * 4 * n ** 2 * v.hidden_size,
    }
    # visual tokens after compression: local43 = ceil(t/4)·9·9 (images hit
    # this with t=1, reference projector.py:536) + 32 global → 113 @ t=1,
    # 680 @ t=32, 1328 @ t=64
    Vtok = 36 if small else (-(-t // 4) * 81 + 32)
    S = L - 1 + Vtok
    comp["dec_qkvo"] = 2 * tc.num_hidden_layers * (
        tc.hidden_size * tc.head_dim * (tc.num_attention_heads + 2 * tc.num_key_value_heads)
        + tc.num_attention_heads * tc.head_dim * tc.hidden_size) * S * b
    comp["dec_mlp"] = 2 * tc.num_hidden_layers * 3 * tc.hidden_size * tc.intermediate_size * S * b
    # decoder causal attention ≈ 2·S²·(H·dh) (qk + pv at half the S² each)
    comp["dec_attn"] = tc.num_hidden_layers * b * 2 * S ** 2 * tc.num_attention_heads * tc.head_dim
    return comp, S


def int8_executed_flops(comp: dict, tower_quant: str, dec_quant: str) -> int:
    """FLOPs that execute as int8 MXU ops under the given quant modes.
    Weight-only 'int8'/'nf4' decoders dequantize to bf16 math → NOT counted."""
    from hicom_tpu.models.quant import parse_tower_quant, quant_covers

    base, _, _ = parse_tower_quant(
        None if tower_quant in (None, "none") else tower_quant)
    int8 = 0
    if base:
        for site, key in (("mlp", "vis_mlp"), ("qkv", "vis_qkv"), ("out", "vis_out")):
            if quant_covers(base, site):
                int8 += comp[key]
    if dec_quant in ("w8a8", "w8a8s"):
        int8 += comp["dec_qkvo"] + comp["dec_mlp"]
    elif dec_quant in ("w8a8_mlp", "w8a8s_mlp"):
        int8 += comp["dec_mlp"]
    return int8


def matched_mfu_pct(total_flops: int, int8_flops: int, dt: float,
                    bf16_ceiling_tflops: float) -> float:
    """Utilization vs the numerics-matched roofline: ideal time = int8 work at
    the int8 ceiling + bf16 work at the bf16 ceiling. Cannot exceed 100 by
    construction (unlike counting int8 ops against the bf16 ceiling)."""
    ideal = (int8_flops / (INT8_CEILING_TOPS * 1e12)
             + (total_flops - int8_flops) / (bf16_ceiling_tflops * 1e12))
    return 100.0 * ideal / dt


# measured full-block flash rate of the tower's d=72 attention (TODO.md r2
# chip A/B: 5.61 ms/layer-batch = 0.314 TFLOP → ~56 TFLOP/s; the 72→128 MXU
# lane pad bounds it near 56% of the bf16 ceiling).
VIS_ATTN_TFLOPS = 56.0


def vs_baseline_cap(comp: dict, int8_flops: int,
                    bf16_ceiling_tflops: float) -> float:
    """Attention-adjusted roofline cap on ``vs_baseline`` for one arm: the
    analytic A100 time divided by this chip's ideal time with int8 sites at
    the raw int8-chain ceiling (~199.5 TOPS), the tower's d=72 attention at
    its measured full-block flash rate (~56 TFLOP/s), and the remaining bf16
    sites at the bf16 chain ceiling. The chain ceilings carry no quantize /
    rescale / softmax epilogues, so the cap is optimistic by construction;
    BASELINE.md §int8-roofline interprets measured/cap per model scale."""
    tot = sum(comp.values())
    vis_attn = comp.get("vis_attn", 0)
    ideal = (int8_flops / (INT8_CEILING_TOPS * 1e12)
             + vis_attn / (VIS_ATTN_TFLOPS * 1e12)
             + (tot - int8_flops - vis_attn) / (bf16_ceiling_tflops * 1e12))
    return (tot / (312e12 * 0.45)) / ideal


def _budget_left(args, default: float = 1200.0) -> float:
    """Seconds left of the driver budget (HICOM_BENCH_BUDGET, default 20 min):
    the secondary bf16 arm is skipped when exhausted — the headline JSON line
    is already printed by then (VERDICT r3 weak-1: rc=124/parsed=null)."""
    budget = float(os.environ.get("HICOM_BENCH_BUDGET", str(default)))
    return budget - (time.monotonic() - getattr(args, "_t0", time.monotonic()))


def _make_arm(args, tower_quant: str, dec_quant: str):
    """Build one numerics arm of the e2e pipeline: (jitted fn, inputs, cfg).

    An "arm" is a fully-independent compiled program + param set for one
    quantization config, so the quantized headline and the bf16 reference
    numerics can be timed interleaved in the same relay window (chip
    throughput varies ~3x across windows — CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    from hicom_tpu.config import tiny_test_config
    from hicom_tpu.constants import VIDEO_TOKEN_INDEX
    from hicom_tpu.models.hicom import HIComModel

    modal = getattr(args, "modal", "video")
    if args.small:
        cfg = tiny_test_config(use_guide="direct", dtype="bfloat16")
        t = 4
    else:
        # "7b": flagship dims; bf16 7B does not fit a 16GB chip, so its
        # fp-reference arm keeps int8 weight-only weights (bf16 MXU math).
        tq = None if tower_quant == "none" else tower_quant
        dq = {} if dec_quant == "none" else {"quantization": dec_quant}
        cfg = serving_config(args.model, frames=args.frames, tower_quant=tq, **dq)
        t = 1 if modal == "image" else args.frames

    from hicom_tpu.constants import IMAGE_TOKEN_INDEX

    sentinel = IMAGE_TOKEN_INDEX if modal == "image" else VIDEO_TOKEN_INDEX
    model = HIComModel(config=cfg)
    rng = np.random.default_rng(0)
    img = cfg.vision_config.image_size
    b, L = args.batch, 48
    ids = rng.integers(5, cfg.text_config.vocab_size, (b, L))
    ids[:, 2] = sentinel
    input_ids = jnp.asarray(ids)
    frames = jnp.asarray(rng.standard_normal((b, t, 3, img, img)).astype(np.float32), dtype=jnp.bfloat16)
    gids = jnp.asarray(rng.integers(1, cfg.guide_text_config.vocab_size, (b, 24)))

    # Random bf16 params straight from eval_shape: avoids materializing the
    # fp32 init tree (2B params would be 8GB on a 16GB chip).
    init_ids = input_ids[:1, :8].at[0, 2].set(sentinel)
    shapes = jax.eval_shape(
        lambda r: model.init(r, init_ids, frames[:1, :1], guide_ids=gids[:1], modal=modal)["params"],
        jax.random.PRNGKey(0),
    )
    params = random_params_like(shapes, float_dtype=jnp.bfloat16)
    if not args.small and tower_quant.startswith("w8a8s"):
        params = calibrate_static_tower(model, cfg, params, frames, gids, tower_quant)
    if not args.small and dec_quant.startswith("w8a8s"):
        params = calibrate_static_decoder(model, cfg, params, input_ids, frames, gids, dec_quant)

    def pipeline(params, input_ids, frames, gids):
        def run(m):
            ge = m.encode_guide(gids)
            visual = m.encode_visual(frames, ge, modal)
            spliced = m.embed_and_splice(input_ids, visual)
            # prompts are unpadded → mask-free causal prefill (flash-eligible)
            hidden, _ = m.language_model.model(spliced.embeds, spliced.positions)
            # scalar output: on this TPU tunnel, block_until_ready is a no-op
            # and D2H is ~2MB/s, so timing must fetch a scalar.
            return jnp.sum(m.language_model.logits(hidden[:, -1:]).astype(jnp.float32))

        return model.apply({"params": params}, method=run)

    fn = jax.jit(pipeline)
    inputs = (params, input_ids, frames, gids)
    return fn, inputs, cfg, b, t


def _warm_arm(fn, inputs, sync_every: int):
    """Compile + burn one untimed group: the relay consistently runs the
    first post-compile timed group of a fresh program 5-8x slow (observed in
    every fresh-program A/B round 0)."""
    float(fn(*inputs))  # compile + warm
    acc = fn(*inputs)
    for _ in range(sync_every - 1):
        acc = acc + fn(*inputs)
    float(acc)


def _time_groups(fn, inputs, iters: int, sync_every: int):
    """One pass of timed groups; returns per-group seconds-per-iteration.
    Amortizes the ~30ms host<->chip sync by queueing sync_every iters per
    fetch."""
    group_dts = []
    for i in range(0, iters, sync_every):
        g0 = time.perf_counter()
        acc = 0.0
        n_in_group = min(sync_every, iters - i)
        for _ in range(n_in_group):
            acc = acc + fn(*inputs)
        float(acc)
        group_dts.append((time.perf_counter() - g0) / n_in_group)
    return group_dts


def _run_from_disk(args, flags):
    """End-to-end INCLUDING host ingest (VERDICT r2 next-3): every iteration
    decodes + preprocesses a fresh batch of real mp4s from disk (native libav
    reader + SigLIP preprocess) with a one-ahead prefetch thread, uploads,
    and runs the chip pipeline. The headline from-disk rate is gated by
    whichever stage is slowest; detail separates ingest-only and the chip-
    only rate (see the default bench) so the limiter is visible.

    Two ingest modes: the DEFAULT uploads raw decoded uint8 frames and runs
    pad-to-square + PIL-parity bicubic resize + normalize ON DEVICE fused
    into the pipeline program (ops/preprocess.py — two small matmuls per
    frame on the MXU, and uint8 uploads are 2x smaller than bf16 pixels);
    ``--host-preprocess`` keeps the host path (the reference's shape:
    decord + HF processor in DataLoader workers) for the A/B. The host's
    scalar resize costs ~300ms/32-frame video on this 1-core machine
    (scripts/ingest_bench.py) — that cost is what the device mode deletes.

    Caveat recorded in the JSON: on this tunneled dev chip the frame upload
    rides the relay (not PCIe), so `upload_ms` is an artifact of the tunnel,
    not of a production TPU host."""
    import concurrent.futures
    import tempfile

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from ingest_bench import write_realistic_mp4

    from hicom_tpu.data.processor import SiglipImagePreprocessor
    from hicom_tpu.data.video import process_video
    from hicom_tpu.ops.preprocess import make_device_preprocess

    fn, inputs, cfg, b, t = _make_arm(args, args.tower_quant, args.dec_quant)
    params, input_ids, frames0, gids = inputs
    img = cfg.vision_config.image_size

    pool_dir = tempfile.mkdtemp(prefix="hicom_fromdisk_")
    n_pool = max(2 * b, 8)
    paths = []
    for i in range(n_pool):
        p = os.path.join(pool_dir, f"clip{i}.mp4")
        write_realistic_mp4(p, seconds=6.0, seed=i)
        paths.append(p)
    proc = SiglipImagePreprocessor(size=(img, img))

    def ingest_host(i):
        """disk → host-preprocessed (b, t, 3, img, img) float (the reference's
        DataLoader shape: decode + PIL-parity resize on the host)."""
        vids = [process_video(paths[(i * b + j) % n_pool], processor=proc, num_frames=t)
                for j in range(b)]
        return np.stack([np.asarray(v) for v in vids])

    def ingest_raw(i):
        """disk → raw decoded uint8 (b, t, h, w, 3): no host pixel math."""
        vids = [process_video(paths[(i * b + j) % n_pool], processor=None, num_frames=t)
                for j in range(b)]
        return np.stack(vids)

    device_pre = not args.host_preprocess
    if device_pre:
        raw0 = ingest_raw(0)
        _, _, h, w, _ = raw0.shape
        pre = make_device_preprocess(h, w, img, out_dtype=jnp.bfloat16)

        base_fn, fn = fn, jax.jit(
            # fused program: device preprocess feeds the tower directly
            lambda p, ids, raw, g: base_fn(p, ids, jax.vmap(pre)(raw), g))
        ingest_batch = ingest_raw
        inputs = (params, input_ids, jnp.asarray(raw0), gids)
    else:
        ingest_batch = ingest_host

    # ingest-only rates (serial, same videos): the host rate is what the
    # device mode deletes; the raw rate is the decode floor that remains
    ingest_batch(0)  # warm
    g0 = time.perf_counter()
    for i in range(3):
        ingest_batch(i)
    ingest_fps = 3 * b * t / (time.perf_counter() - g0)
    print(f"ingest-only ({'raw' if device_pre else 'host-preprocess'}): "
          f"{ingest_fps:.1f} frames/s", file=sys.stderr)

    health = None
    if not args.small:
        health = relay_health()
        print(f"relay_health: {health}", file=sys.stderr)
    _warm_arm(fn, inputs, args.sync_every)

    # upload-only probe: time H2D of one batch (tunnel artifact on this relay)
    up_dtype = None if device_pre else jnp.bfloat16
    fd = jnp.asarray(ingest_batch(0), up_dtype)
    float(jnp.sum(fd[0, 0, 0, :2, :2].astype(jnp.float32)))
    u0 = time.perf_counter()
    fd = jnp.asarray(ingest_batch(1), up_dtype)  # includes one ingest
    float(jnp.sum(fd[0, 0, 0, :2, :2].astype(jnp.float32)))
    upload_ms = (time.perf_counter() - u0) * 1e3

    # chip-only rate with a RESIDENT batch (no ingest, no upload): the compute
    # term of the pipeline bound, for the analytic production-host figure
    chip_dts = _time_groups(fn, inputs, args.sync_every * 2, args.sync_every)
    chip_fps = b * t / (sorted(chip_dts)[len(chip_dts) // 2])

    # Double-buffered: the worker thread does ingest AND the H2D device_put
    # (VERDICT r3 weak-6 — upload was serialized with compute on the main
    # thread; on this tunnel the upload is the measured bottleneck). JAX
    # device_put is thread-safe; one worker keeps uploads ordered.
    def ingest_and_upload(i):
        fdev = jnp.asarray(ingest_batch(i), up_dtype)
        # force the copy to be enqueued/materialized off the main thread
        fdev.block_until_ready()
        return fdev

    ex = concurrent.futures.ThreadPoolExecutor(1)
    nxt = ex.submit(ingest_and_upload, 0)
    group_dts = []
    it = 0
    for gi in range(max(1, args.iters // args.sync_every)):
        g0 = time.perf_counter()
        acc = 0.0
        for _ in range(args.sync_every):
            fdev = nxt.result()
            it += 1
            nxt = ex.submit(ingest_and_upload, it)  # ingest+upload overlap compute
            acc = acc + fn(params, input_ids, fdev, gids)
        float(acc)
        group_dts.append((time.perf_counter() - g0) / args.sync_every)
    ex.shutdown(wait=False)
    dt = sorted(group_dts)[len(group_dts) // 2]
    fps = b * t / dt
    # production host: PCIe-class upload (>10GB/s ⇒ <6ms for a 56MB raw batch,
    # negligible) leaves min(ingest, chip compute) as the pipeline bound
    prod_fps = min(ingest_fps, chip_fps)
    result = {
        "metric": "video_frames_per_sec_per_chip_from_disk",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / max(ingest_fps, 1e-9), 3),
        "detail": {
            "ingest_mode": "device_preprocess" if device_pre else "host_preprocess",
            "pipelined_from_disk_fps": round(fps, 2),
            "ingest_only_fps": round(ingest_fps, 1),
            "chip_only_fps": round(chip_fps, 1),
            "analytic_production_host_fps": round(prod_fps, 1),
            "upload_plus_one_ingest_ms": round(upload_ms, 1),
            "upload_note": "H2D rides the dev-relay tunnel, not PCIe — "
                           "production TPU hosts upload at >10GB/s, so the "
                           "pipeline bound there is min(ingest, chip) = "
                           "analytic_production_host_fps; the upload here is "
                           "double-buffered in the prefetch worker",
            "group_ms": [round(g * 1e3, 1) for g in group_dts],
            "batch_videos": b, "frames_per_video": t,
            "baseline_model": "ingest-only rate (vs_baseline ~1.0 = fully ingest-overlapped)",
            "relay_health": health,
            **({"fallback_flags": flags} if flags else {}),
        },
    }
    print(json.dumps(result))


def _run(args, flags):
    # Arms: the quantized headline + the fp-numerics reference arm measured
    # in the SAME window (VERDICT r2 weak-1: the bench must carry BOTH
    # vs_baseline and vs_baseline_bf16 so the quantized multiple is honest).
    #
    # r4 contract with the driver (VERDICT r3 weak-1 — BENCH_r03 was
    # rc=124/parsed=null): the HEADLINE result JSON prints IMMEDIATELY after
    # the headline arm's timed groups; the bf16 arm then runs (budget
    # permitting) and re-prints the ENRICHED JSON as a second line. The
    # driver parses the LAST complete JSON line, so a timeout mid-bf16 still
    # leaves a parsed headline with vs_baseline.
    fp_dec = "int8" if args.model == "7b" else "none"  # bf16 7B doesn't fit
    dual = (not args.small and not args.no_bf16_arm
            and (args.tower_quant, args.dec_quant) != ("none", fp_dec))

    health = None
    if not args.small:
        health = relay_health()
        print(f"relay_health: {health}", file=sys.stderr)

    # Per-group times are kept so transient co-tenant stalls are visible: the
    # chip intermittently runs this program class at ~0.4x while the pure
    # matmul health chain stays green (observed 144 vs 60 f/s, same flags) —
    # the headline is the MEDIAN group (robust to one stalled group);
    # detail keeps the mean, best, and raw per-group times.
    #
    # Arms run SEQUENTIALLY back-to-back, each freed before the next builds:
    # two full arms resident together OOM the 16GB chip at the 1.5B shape
    # (measured: RESOURCE_EXHAUSTED at every flag level, 2026-08-19). The
    # timed sections are seconds apart in one window; each arm's JSON keeps a
    # relay_health stamp taken right before its timing so drift is visible.
    def run_arm(name, tq, dq, iters):
        print(f"arm[{name}]: build ({tq}/{dq})", file=sys.stderr, flush=True)
        fn, inputs, acfg, ab, at = _make_arm(args, tq, dq)
        print(f"arm[{name}]: warm/compile", file=sys.stderr, flush=True)
        _warm_arm(fn, inputs, args.sync_every)
        stamp = None
        if not args.small:
            stamp = relay_health()  # mlp27 compile is cached after the first call
            print(f"relay_health[{name}]: {stamp}", file=sys.stderr, flush=True)
        gdts = _time_groups(fn, inputs, iters, args.sync_every)
        print(f"arm[{name}]: groups {[round(g * 1e3) for g in gdts]} ms",
              file=sys.stderr, flush=True)
        # caller drops fn/inputs so this arm's params free before the next
        # arm builds (two full arms resident OOM the chip)
        return gdts, stamp, acfg, ab, at

    group_dts, headline_health, cfg, b, t = run_arm(
        "headline", args.tower_quant, args.dec_quant, args.iters)
    L = 48  # prompt ids per video (see _make_arm)
    mean_dt = sum(group_dts) / len(group_dts)
    dt = sorted(group_dts)[len(group_dts) // 2]  # median group
    frames_per_sec = b * t / dt
    best_dt = min(group_dts)

    # Analytic A100 estimate for the same computation (bf16 312 TFLOP/s, 45%
    # MFU): linear + attention FLOPs of the measured pipeline, per-site split
    # so the MFU figure uses a numerics-matched ceiling.
    comp, _ = flops_components(cfg, b, t, L, args.small)
    flops = sum(comp.values())
    int8_flops = int8_executed_flops(comp, args.tower_quant, args.dec_quant)
    a100_sec = flops / (312e12 * 0.45)
    a100_frames_per_sec = b * t / a100_sec
    vs_baseline = frames_per_sec / a100_frames_per_sec
    achieved_tflops = flops / dt / 1e12
    # measured sustained bf16 ceiling of this chip; the live health figure
    # supersedes it when higher
    ceiling = max(BF16_CEILING_TFLOPS, (health or {}).get("tflops", 0.0))
    cap = vs_baseline_cap(comp, int8_flops, ceiling)

    bf16_detail = {}
    if (args.tower_quant, args.dec_quant) == ("none", fp_dec):
        # the headline itself IS the fp-numerics arm
        bf16_detail = {"vs_baseline_bf16": round(vs_baseline, 3)}

    result = {
        "metric": ("image_samples_per_sec_per_chip_e2e_prefill"
                   if args.modal == "image" else
                   "video_frames_per_sec_per_chip_e2e_prefill"),
        "value": round(frames_per_sec, 2),
        "unit": "images/s" if args.modal == "image" else "frames/s",
        "vs_baseline": round(vs_baseline, 3),
        "detail": {
            "ttft_ms_per_video": round(dt / b * 1e3, 2),
            "batch_videos": b,
            "frames_per_video": t,
            "achieved_tflops": round(achieved_tflops, 1),
            # numerics-matched roofline: int8 sites at the measured ~199.5
            # TOPS int8 ceiling, bf16 sites at the bf16 ceiling — ≤100 by
            # construction (VERDICT r3 weak-7)
            "mfu_pct": round(matched_mfu_pct(flops, int8_flops, dt, ceiling), 1),
            # legacy optic: int8 ops counted as 2 FLOPs against the bf16
            # ceiling (can exceed 100 for quantized arms)
            "mfu_pct_vs_bf16_ceiling": round(100 * achieved_tflops / ceiling, 1),
            "int8_flop_frac": round(int8_flops / flops, 3),
            # attention-adjusted roofline cap for THIS arm's numerics and the
            # fraction of it achieved (BASELINE.md §int8-roofline): headroom
            # self-description, so a reader can tell "slow run" from "at cap"
            "vs_baseline_cap": round(cap, 3),
            "pct_of_cap": round(100 * vs_baseline / cap, 1),
            "best_frames_per_sec": round(b * t / best_dt, 2),
            "mean_frames_per_sec": round(b * t / mean_dt, 2),
            "group_ms": [round(g * 1e3, 1) for g in group_dts],
            **bf16_detail,
            "config": "tiny" if args.small else (
                ("so400m+qwen2.5-7B-int8" if args.model == "7b" else "so400m+qwen2.5-1.5B")
                + (f"-tower:{args.tower_quant}" if args.tower_quant != "none" else "")
                + (f"-dec:{args.dec_quant}" if args.dec_quant != "none" else "")
                + ("-image" if args.modal == "image" else "")),
            "baseline_model": "analytic A100 bf16 roofline @45% MFU, same computation (derivation: BASELINE.md §baseline-derivation)",
            **({"relay_health": headline_health or health} if health else {}),
            **({"fallback_flags": flags} if flags else {}),
        },
    }

    def maybe_cache(res):
        # only the default headline config may write the relay-down fallback
        # cache, and only from a healthy window (a throttled measurement must
        # not become the stale-fallback number)
        is_default = (args.model == "1.5b" and args.batch == 4
                      and args.frames == 32 and args.modal == "video")
        if not args.small and not args.no_cache and is_default and (health or {}).get("healthy"):
            res = dict(res)
            res["detail"] = {**res["detail"], "cache_provenance": {
                # stamped at measurement time so a relay-down replay can
                # report its own age (detail.stale_age_hours)
                "run_unix": time.time(),
                "run_date": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "relay_health": health,
            }}
            with open(CACHE, "w") as f:
                json.dump(res, f)

    maybe_cache(result)
    print(json.dumps(result), flush=True)  # headline lands BEFORE the bf16 arm
    args._printed = True  # a later bf16/fallback crash must not shadow this

    if not dual:
        return
    left = _budget_left(args)
    if left < 120:
        print(f"bf16 arm skipped: driver budget exhausted ({left:.0f}s left; "
              "set HICOM_BENCH_BUDGET to raise)", file=sys.stderr)
        return
    try:
        bdts, bf16_health, _, _, _ = run_arm("bf16", "none", fp_dec, args.iters_bf16)
    except Exception as e:  # noqa: BLE001 — headline already printed/cached
        print(f"bf16 arm failed ({type(e).__name__}: {e}); headline stands",
              file=sys.stderr)
        return
    bdt = sorted(bdts)[len(bdts) // 2]
    bf16_fps = b * t / bdt
    result["detail"].update({
        # the SAME computation at fp-reference numerics, measured
        # back-to-back in the same window (own relay_health stamp): the
        # honest "matched numerics" comparison the quantized headline
        # rides on (BASELINE.md §baseline-derivation)
        "bf16_frames_per_sec": round(bf16_fps, 2),
        "vs_baseline_bf16": round(bf16_fps / a100_frames_per_sec, 3),
        # the bf16 arm's own attention-adjusted cap (≈0.83 @1.5B / 0.85 @7B —
        # BASELINE.md §bf16-roofline) and fraction achieved
        "vs_baseline_bf16_cap": round(vs_baseline_cap(comp, 0, ceiling), 3),
        "bf16_pct_of_cap": round(
            100 * (bf16_fps / a100_frames_per_sec)
            / vs_baseline_cap(comp, 0, ceiling), 1),
        "bf16_mfu_pct": round(100 * (flops / bdt / 1e12) / ceiling, 1),
        "bf16_group_ms": [round(g * 1e3, 1) for g in bdts],
        "bf16_relay_health": bf16_health,
        "quant_speedup_vs_bf16": round(frames_per_sec / bf16_fps, 3),
    })
    maybe_cache(result)
    print(json.dumps(result), flush=True)  # enriched line (last line wins)


if __name__ == "__main__":
    main()
