"""On-chip verify for the ServeEngine guide path (and mm_serve's device surface).

Drives ServeEngine on the REAL TPU with a tiny config: mixed text/video
requests where the video requests carry guide_ids, one of them with an
explicit partial guide_mask. Checks (a) the run completes and yields the
budgeted tokens, (b) guide_mask=all-True is bit-identical to guide_mask=None
(the new default-expansion path in serve.py), (c) a partial mask changes the
prefill KV cache (so the mask actually reaches the guide encoder on device).

Params come from a REAL jitted model.init — bench.random_params_like draws
every leaf (including layernorm scales) as 0.02-scale noise, which collapses
attention to near-uniform and makes key masking a numerical no-op (~1e-5),
falsely failing check (c).

Run: HICOM_SKIP_PROBE=1 timeout 900 python scripts/verify_serve_tpu.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

import jax
import jax.numpy as jnp

from hicom_tpu.config import tiny_test_config
from hicom_tpu.constants import VIDEO_TOKEN_INDEX
from hicom_tpu.models.hicom import HIComModel
from hicom_tpu.serve import GenRequest, ServeEngine

assert jax.default_backend() == "tpu", jax.default_backend()

cfg = tiny_test_config(use_guide="direct")
model = HIComModel(config=cfg)
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(5, cfg.text_config.vocab_size, (1, 8))).at[0, 2].set(VIDEO_TOKEN_INDEX)
fr = jnp.asarray(rng.standard_normal(
    (1, 2, 3, cfg.vision_config.image_size, cfg.vision_config.image_size)), jnp.float32)
gids_init = jnp.asarray(rng.integers(1, cfg.guide_text_config.vocab_size, (1, 16)))
params = jax.jit(
    lambda r: model.init(r, ids, fr, guide_ids=gids_init, modal="video")["params"]
)(jax.random.PRNGKey(0))


def make_reqs(mask_mode):
    reqs = []
    for i in range(3):
        pid = rng.integers(5, cfg.text_config.vocab_size, (12,)).astype(np.int32)
        if i == 1:
            reqs.append(GenRequest(input_ids=pid, modal="text", max_new_tokens=6))
            continue
        pid[3] = VIDEO_TOKEN_INDEX
        frames = np.asarray(rng.standard_normal(
            (2, 3, cfg.vision_config.image_size, cfg.vision_config.image_size)), np.float32)
        g = rng.integers(1, cfg.guide_text_config.vocab_size, (16,)).astype(np.int32)
        if mask_mode == "none":
            gm = None
        elif mask_mode == "full":
            gm = np.ones(16, bool)
        else:  # partial on the second video request
            gm = np.ones(16, bool)
            if i == 2:
                gm[8:] = False
        reqs.append(GenRequest(input_ids=pid, frames=frames, guide_ids=g,
                               guide_mask=gm, modal="video", max_new_tokens=6))
    return reqs


def run(mask_mode):
    rng_local = np.random.default_rng(0)  # deterministic request stream
    globals()["rng"] = rng_local
    eng = ServeEngine(model, {"params": params}, n_slots=2, cache_len=128,
                      prompt_buckets=(16,), guide_len=16, sync_steps=4,
                      eos_token_id=cfg.text_config.eos_token_id)
    order = [eng.submit(r) for r in make_reqs(mask_mode)]
    res = eng.run()
    return [tuple(res[rid].tokens) for rid in order]

tok_none = run("none")
tok_full = run("full")
tok_part = run("partial")
assert all(len(t) > 0 for t in tok_none), tok_none
assert tok_none == tok_full, (tok_none, tok_full)  # default expansion parity
assert tok_part[0] == tok_none[0] and tok_part[1] == tok_none[1]

# (c) device-level: the partial mask must change the prefill KV cache (tokens
# can coincide under greedy argmax, so assert on the cache, fetched as ONE
# scalar — D2H here is ~2MB/s).
from hicom_tpu.serve import GenRequest as _GR  # noqa: E402

globals()["rng"] = np.random.default_rng(0)
req_full = make_reqs("full")[2]
globals()["rng"] = np.random.default_rng(0)
req_part = make_reqs("partial")[2]
eng = ServeEngine(model, {"params": params}, n_slots=2, cache_len=128,
                  prompt_buckets=(16,), guide_len=16, sync_steps=4,
                  eos_token_id=cfg.text_config.eos_token_id)
_, cache_f, _ = eng._prefill(req_full)
_, cache_p, _ = eng._prefill(req_part)
kdiff = float(jnp.sum(jnp.abs(cache_f.k.astype(jnp.float32) - cache_p.k.astype(jnp.float32))))
assert kdiff > 1e-3, f"partial guide_mask did not reach the device (kdiff={kdiff})"
print("OK serve-on-TPU:", {"none": tok_none, "partial_v2": tok_part[2],
                           "prefill_kdiff": round(kdiff, 4)})
