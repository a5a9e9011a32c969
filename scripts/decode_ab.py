import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp, numpy as np
from bench import random_params_like, serving_config
from hicom_tpu.models.hicom import HIComModel
from hicom_tpu.models.qwen2 import KVCache
from hicom_tpu.profiling import device_time

CACHE_LEN = int(os.environ.get("AB_CACHE_LEN", "1024"))
INT8 = os.environ.get("AB_INT8", "0") == "1"
MODEL = os.environ.get("AB_MODEL", "1.5b")
# decoder weight quantization override: "" keeps the model default
# ("int8" for 7b, bf16 for 1.5b); "nf4" packs the weight stream to ~4.2 bits
# (QuantDense4) — decode is weight-streaming-bound, so halving the stream vs
# int8 raises the b=1 ceiling ~2x (VERDICT r1 item 6).
WQ = os.environ.get("AB_WQ", "")

cfg = serving_config(MODEL, kv_cache_int8=INT8,
                     **({"quantization": WQ or None} if WQ else {}))
model = HIComModel(config=cfg)
rng = np.random.default_rng(0)
from hicom_tpu.constants import VIDEO_TOKEN_INDEX
ids = jnp.asarray(rng.integers(5, 1000, (1, 8))).at[0, 2].set(VIDEO_TOKEN_INDEX)
fr = jnp.asarray(rng.standard_normal((1, 1, 3, 384, 384)), jnp.bfloat16)
gids = jnp.asarray(rng.integers(1, 100, (1, 24)))
shapes = jax.eval_shape(lambda r: model.init(r, ids, fr, guide_ids=gids, modal="video")["params"], jax.random.PRNGKey(0))
params = random_params_like(shapes, float_dtype=jnp.bfloat16)
tc = cfg.text_config
b = 1
cache = KVCache.zeros(tc.num_hidden_layers, b, tc.num_key_value_heads, CACHE_LEN, tc.head_dim, jnp.bfloat16, quantized=INT8)
cache = cache._replace(
    length=jnp.full((b,), CACHE_LEN - 64, jnp.int32),
    valid=(jnp.arange(CACHE_LEN)[None, :] < CACHE_LEN - 64),
)
emb = jnp.asarray(rng.standard_normal((b, 1, tc.hidden_size)), jnp.bfloat16)
pos = jnp.full((b, 1), CACHE_LEN - 64, jnp.int32)

def step(params, emb, cache, pos):
    def run(m):
        hidden, c2 = m.language_model.model(emb, pos, cache)
        return m.language_model.logits(hidden), c2
    return model.apply({"params": params}, method=run)

def feedback(out, a):
    logits, c2 = out
    emb2 = (logits[..., :tc.hidden_size] * jnp.bfloat16(1e-3)).astype(jnp.bfloat16)
    return (a[0], emb2, c2, a[3] + 1)

t = device_time(step, params, emb, cache, pos, iters=3, chain=16, feedback=feedback)
import json
print(json.dumps({"cache_len": CACHE_LEN, "int8": INT8, "wq": WQ or "default",
                  "flash_decode": os.environ.get("HICOM_FLASH_DECODE", "0"),
                  "ms_per_step": round(t*1e3, 3), "tok_per_s": round(1/t, 1)}))

# Usage (one process per combo — env gates are read at trace time):
#   for combo in "0 0" "1 0" "0 1" "1 1"; do set -- $combo
#     HICOM_SKIP_PROBE=1 HICOM_FLASH_DECODE=$1 AB_INT8=$2 \
#       AB_CACHE_LEN=4096 python scripts/decode_ab.py
#   done
# Chip verdicts 2026-08-17 (1.5B, b=1, feedback-chained x16):
#   cache 1024: bf16 einsum 6.85ms ~ flash 7.09 -> flash decode default OFF
#   cache 4096: bf16 6.81 / int8 6.28 (+8%) / int8+flash 6.22
