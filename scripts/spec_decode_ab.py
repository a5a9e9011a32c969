"""Speculative-decode A/B on the real chip: spec_k in {0, 4, 8} through the
full jitted generate program (prompt-lookup drafts + (k+1)-token verify
steps, models/generate.py:_spec_loop).

All arms produce bit-identical greedy tokens (parity is the design), so the
wall-time ratio IS the speedup; each spec arm also reports its measured
verify-iteration count (tokens emitted / iteration = the acceptance-driven
multiplier). Random weights decide the acceptance rate — a 1.5B random
decoder usually falls into repetition under greedy decoding, which the
n-gram lookup exploits exactly like real models' repetitive spans; the
number is reported, not assumed.

Run: HICOM_SKIP_PROBE=1 python scripts/spec_decode_ab.py
     AB_SPEC_KS=0,4,8 AB_MAX_NEW=128 AB_PROMPT_L=64 AB_MODEL=1.5b
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

import jax
import jax.numpy as jnp

from bench import random_params_like, relay_health, serving_config
from hicom_tpu.constants import VIDEO_TOKEN_INDEX
from hicom_tpu.models.generate import generate_tokens
from hicom_tpu.models.hicom import HIComModel

MODEL = os.environ.get("AB_MODEL", "1.5b")
KS = [int(k) for k in os.environ.get("AB_SPEC_KS", "0,4,8").split(",")]
MAX_NEW = int(os.environ.get("AB_MAX_NEW", "128"))
PROMPT_L = int(os.environ.get("AB_PROMPT_L", "64"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "5"))


def main():
    if MODEL == "tiny":  # CPU sanity: AB_MODEL=tiny python scripts/spec_decode_ab.py
        jax.config.update("jax_platforms", "cpu")
        from hicom_tpu.config import tiny_test_config

        cfg, health = tiny_test_config(), None
    else:
        health = relay_health()
        print(f"relay_health: {health}", file=sys.stderr)
        cfg = serving_config(MODEL)
    model = HIComModel(config=cfg)
    rng = np.random.default_rng(0)
    tc = cfg.text_config
    # text-only decode A/B (vision cost is identical across arms and measured
    # by bench.py); a short repeated motif gives the lookup early matches
    motif = rng.integers(5, min(tc.vocab_size, 30000), (8,))
    ids = np.tile(motif, PROMPT_L // 8 + 1)[:PROMPT_L][None].astype(np.int32)
    ids_j = jnp.asarray(ids)
    img = cfg.vision_config.image_size
    init_ids = jnp.asarray(ids[:, :8]).at[0, 2].set(VIDEO_TOKEN_INDEX)
    fr = jnp.asarray(rng.standard_normal((1, 1, 3, img, img)), jnp.bfloat16)
    gids = jnp.asarray(rng.integers(1, min(100, cfg.guide_text_config.vocab_size), (1, 24)))
    shapes = jax.eval_shape(
        lambda r: model.init(r, init_ids, fr, guide_ids=gids, modal="video")["params"],
        jax.random.PRNGKey(0))
    params = {"params": random_params_like(shapes)}

    def run(k):
        out, iters = generate_tokens(
            params, ids_j, None, None, None, jax.random.PRNGKey(1),
            model=model, modal="text", max_new_tokens=MAX_NEW,
            eos_token_id=tc.eos_token_id, cache_len=1024, has_frames=False,
            spec_k=k, return_stats=True)
        return np.asarray(out), int(iters)

    arms = {}
    base_out = None
    for k in KS:
        out, iters = run(k)  # compile + warm
        run(k)  # untimed warm round (relay runs the first timed group slow)
        if base_out is None:
            base_out = out
        elif not np.array_equal(out, base_out):
            print(f"PARITY VIOLATION at spec_k={k}", file=sys.stderr)
        arms[k] = {"iters": iters}
        print(f"  arm spec_k={k}: compiled (iters={iters})", file=sys.stderr)

    # real tokens + the stop token itself when one fired (eos-padded buffer)
    emitted = min(int(np.sum(base_out != tc.eos_token_id)) + 1, MAX_NEW)
    for _ in range(ROUNDS):
        for k in KS:
            t0 = time.perf_counter()
            run(k)
            arms[k].setdefault("times", []).append(time.perf_counter() - t0)

    out = {"model": MODEL, "max_new": MAX_NEW, "emitted": emitted,
           "relay_health": health, "arms": {}}
    for k in KS:
        dt = sorted(arms[k]["times"])[ROUNDS // 2]
        out["arms"][str(k)] = {
            "median_s": round(dt, 3),
            "tok_per_s": round(emitted / dt, 1),
            "verify_iters": arms[k]["iters"],
            "tokens_per_iter": round(emitted / max(arms[k]["iters"], 1), 2),
        }
    base = out["arms"].get("0", {}).get("tok_per_s")
    if base:
        for k in out["arms"]:
            out["arms"][k]["speedup"] = round(out["arms"][k]["tok_per_s"] / base, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
