"""Continuous-batching serving throughput on the real chip.

Measures the ServeEngine (hicom_tpu/serve.py) end-to-end: requests with real
prompt+decode budgets stream through n_slots resident sequences, so decode's
weight stream is amortized over every active slot and prefill interleaves
with decoding. Reported as aggregate generated tok/s vs the b=1 sequential
floor (the reference's serving shape: one request at a time through HF
generate, hicom/__init__.py:40-121).

Decode rounds sync once per `sync_steps` tokens — the right cadence for the
~30ms relay round trip (CLAUDE.md). Arms run interleaved in one process so
tenancy drift can't masquerade as a slot-count effect.

Run: HICOM_SKIP_PROBE=1 python scripts/serve_bench.py         (1.5b dims)
     AB_SLOTS=1,4,8 AB_REQS=16 python scripts/serve_bench.py
     AB_ADMIT_AB=1 AB_SLOTS=4,8 python scripts/serve_bench.py  (async- vs
       sync-admission arms interleaved: quantifies the r3 dispatch-only
       _admit — the sync arm stalls every resident slot on a prefill +
       host round trip per admission, VERDICT r2 weak-6)
     AB_ARRIVAL=drip ...  (one new request submitted after every decode
       round instead of all upfront — admissions land while slots decode,
       the realistic serving arrival shape and the worst case for sync
       admission; default 'batch' submits everything before run())
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

MODEL = os.environ.get("AB_MODEL", "1.5b")
SLOTS = [int(s) for s in os.environ.get("AB_SLOTS", "1,4,8").split(",")]
N_REQS = int(os.environ.get("AB_REQS", "12"))
MAX_NEW = int(os.environ.get("AB_MAX_NEW", "64"))
CACHE_LEN = int(os.environ.get("AB_CACHE_LEN", "1024"))
SYNC_STEPS = int(os.environ.get("AB_SYNC", "16"))
ADMIT_AB = os.environ.get("AB_ADMIT_AB", "") == "1"
ARRIVAL = os.environ.get("AB_ARRIVAL", "batch")  # batch | drip
SPEC_K = int(os.environ.get("AB_SPEC", "0"))  # adds a spec_k twin per slot count
# 1 (default): the engine's adaptive policy (spec only at low occupancy +
# accepted drafts — the production default); 0: spec forced every round
# (the r3 shape that lost at 4/8 slots, kept for the crossover A/B)
SPEC_ADAPTIVE = os.environ.get("AB_SPEC_ADAPTIVE", "1") == "1"
SPEC_MAX_ACTIVE = int(os.environ.get("AB_SPEC_MAX_ACTIVE", "1"))
# int8 KV cache (per-slot absmax, models/qwen2.py): default ON for 7b — the
# flagship serving config pairs the int8 weight-only decoder with int8 KV
# (VERDICT r3 next-3); override with AB_KV_INT8=0/1
KV_INT8 = os.environ.get("AB_KV_INT8", "1" if MODEL == "7b" else "0") == "1"
OUT_JSON = os.environ.get("AB_OUT")  # also write the JSON artifact here

import jax
import jax.numpy as jnp  # noqa: F401

from bench import random_params_like, relay_health, serving_config
from hicom_tpu.constants import VIDEO_TOKEN_INDEX
from hicom_tpu.models.hicom import HIComModel
from hicom_tpu.serve import GenRequest, ServeEngine


def build(n_slots, cfg, model, params, sync_admission=False, spec_k=0):
    return ServeEngine(
        model, {"params": params}, n_slots=n_slots, cache_len=CACHE_LEN,
        prompt_buckets=(64,), sync_steps=SYNC_STEPS,
        eos_token_id=cfg.text_config.eos_token_id,
        sync_admission=sync_admission, spec_k=spec_k,
        spec_adaptive=SPEC_ADAPTIVE, spec_max_active=SPEC_MAX_ACTIVE)


def run_arm(eng, cfg, n_reqs):
    """Time one arm. 'batch' submits everything then drains (the r2 shape);
    'drip' submits the first n_slots, then ONE request after every decode
    round — each admission lands while the other slots are mid-decode, so a
    sync admission stalls the whole round on its host fetch."""
    reqs = requests(cfg, n_reqs)
    if ARRIVAL == "batch":
        for r in reqs:
            eng.submit(r)
        t0 = time.perf_counter()
        results = eng.run()
        return results, time.perf_counter() - t0
    head = min(eng.n_slots, n_reqs)
    for r in reqs[:head]:
        eng.submit(r)
    i = head
    t0 = time.perf_counter()
    while i < n_reqs or eng._queue or any(s.request_id >= 0 for s in eng._slots):
        eng.step_round()
        if i < n_reqs:
            eng.submit(reqs[i])
            i += 1
    dt = time.perf_counter() - t0
    return eng.run(), dt  # drained: returns + clears accumulated results


def requests(cfg, n):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        L = 48
        ids = rng.integers(5, cfg.text_config.vocab_size, (L,)).astype(np.int32)
        # text-only requests isolate the decode/scheduling effect (prefill
        # vision cost is identical across slot counts and measured by bench.py)
        out.append(GenRequest(input_ids=ids, modal="text", max_new_tokens=MAX_NEW))
    return out


def main():
    if MODEL == "tiny":  # CPU sanity: python scripts/serve_bench.py (AB_MODEL=tiny)
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        from hicom_tpu.config import tiny_test_config

        cfg = tiny_test_config()
        health = None
    else:
        health = relay_health()
        print(f"relay_health: {health}", file=sys.stderr)
        cfg = serving_config(MODEL, **({"kv_cache_int8": True} if KV_INT8 else {}))
    model = HIComModel(config=cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(5, min(1000, cfg.text_config.vocab_size), (1, 8))).at[0, 2].set(VIDEO_TOKEN_INDEX)
    fr = jnp.asarray(rng.standard_normal(
        (1, 1, 3, cfg.vision_config.image_size, cfg.vision_config.image_size)), jnp.bfloat16)
    gids = jnp.asarray(rng.integers(1, min(100, cfg.guide_text_config.vocab_size), (1, 24)))
    shapes = jax.eval_shape(
        lambda r: model.init(r, ids, fr, guide_ids=gids, modal="video")["params"],
        jax.random.PRNGKey(0))
    # serving dtype: floating leaves bf16 (api.py:568 load-path parity; the
    # fp32 init tree is 14.5 GB at 7B and OOMs two resident engines)
    params = random_params_like(shapes, float_dtype=jnp.bfloat16)

    # build + warm every arm first (compile outside the timing windows),
    # then time arms interleaved. Arms: one per slot count; AB_ADMIT_AB adds
    # a sync-admission twin per slot count (same compiled fns — the engines
    # share nothing but jit caches, so the twin costs no extra compiles).
    arm_specs = [(s, False, 0) for s in SLOTS]
    if ADMIT_AB:
        arm_specs += [(s, True, 0) for s in SLOTS if s > 1]
    if SPEC_K:
        arm_specs += [(s, False, SPEC_K) for s in SLOTS]
    engines = {}
    for s, sync_adm, spk in arm_specs:
        name = f"{s}{'_syncadmit' if sync_adm else ''}{f'_spec{spk}' if spk else ''}"
        eng = build(s, cfg, model, params, sync_admission=sync_adm, spec_k=spk)
        for r in requests(cfg, s):  # warm: compiles prefill + steps
            eng.submit(r)
        t0 = time.perf_counter()
        eng.run()
        print(f"  slots={name}: compiled+warmed in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)
        engines[name] = eng

    out = {"model": MODEL, "max_new": MAX_NEW, "n_reqs": N_REQS,
           "kv_cache_int8": KV_INT8,
           "sync_steps": SYNC_STEPS, "arrival": ARRIVAL,
           "relay_health": health, "arms": {}}
    for name, eng in engines.items():
        eng.spec_rounds = eng.plain_rounds = 0  # exclude the warmup rounds
        results, dt = run_arm(eng, cfg, N_REQS)
        toks = sum(len(r.tokens) + 1 for r in results.values())  # + eos step
        out["arms"][name] = {
            "wall_s": round(dt, 2),
            "tok_per_s": round(toks / dt, 1),
            "req_per_s": round(len(results) / dt, 2),
        }
        if eng.spec_k:
            out["arms"][name]["spec_rounds"] = eng.spec_rounds
            out["arms"][name]["plain_rounds"] = eng.plain_rounds
            out["arms"][name]["spec_adaptive"] = eng.spec_adaptive
        print(f"slots={name}: {out['arms'][name]}", file=sys.stderr)
    base = out["arms"].get("1", {}).get("tok_per_s")
    if base:
        for name in out["arms"]:
            out["arms"][name]["vs_sequential"] = round(
                out["arms"][name]["tok_per_s"] / base, 2)
    for s in SLOTS:  # async-vs-sync admission speedup per slot count
        a, b = out["arms"].get(str(s)), out["arms"].get(f"{s}_syncadmit")
        if a and b:
            a["admission_async_speedup"] = round(a["tok_per_s"] / b["tok_per_s"], 3)
    for s in SLOTS:  # speculative-vs-plain speedup per slot count
        a, b = out["arms"].get(f"{s}_spec{SPEC_K}"), out["arms"].get(str(s))
        if a and b:
            a["spec_speedup"] = round(a["tok_per_s"] / b["tok_per_s"], 3)
    line = json.dumps(out)
    if OUT_JSON:
        with open(OUT_JSON, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
