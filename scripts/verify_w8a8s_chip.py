"""On-chip verification of the static-scale w8a8s tower path.

Exercises the full flow on the REAL chip: quantize_tower_params(w8a8s_mlp_qkv)
→ '+calib' forward (sown absmax) → fill_act_scales → served static forward,
and checks the served output is finite and tracks the bf16 tower (cosine).
Small tower config keeps the remote compiles cheap; the path (ActQuant,
W8A8DenseS, calib collection under nn.scan-free layout) is identical to
serving scale. Run: timeout 600 python scripts/verify_w8a8s_chip.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

import jax
import jax.numpy as jnp

from hicom_tpu import config as hcfg
from hicom_tpu.models.siglip import SiglipVisionTower
from hicom_tpu.models.quant import fill_act_scales, quantize_tower_params

VIS = dict(hidden_size=128, intermediate_size=256, num_hidden_layers=2,
           num_attention_heads=4, image_size=56, patch_size=14)

cfg = hcfg.SiglipVisionConfig(**VIS)
rng = np.random.default_rng(0)
px = jnp.asarray(rng.standard_normal((2, 3, 56, 56)).astype(np.float32))

fp = SiglipVisionTower(config=cfg, dtype=jnp.float32)
t0 = time.perf_counter()
params = jax.jit(lambda r: fp.init(r, px)["params"])(jax.random.PRNGKey(0))
f_fp, _ = jax.jit(lambda p, x: fp.apply({"params": p}, x))(params, px)
print(f"fp tower ran in {time.perf_counter()-t0:.0f}s", file=sys.stderr)

qparams = quantize_tower_params(jax.device_get(params), mode="w8a8s_mlp_qkv")
qparams = jax.tree.map(jnp.asarray, qparams)

ccfg = dataclasses.replace(cfg, quantization="w8a8s_mlp_qkv+calib")
ct = SiglipVisionTower(config=ccfg, dtype=jnp.float32)
t0 = time.perf_counter()
(_, _), mut = jax.jit(
    lambda p, x: ct.apply({"params": p}, x, mutable=["calib"]))(qparams, px)
filled = fill_act_scales(qparams, jax.device_get(mut["calib"]))
print(f"calib forward + fill in {time.perf_counter()-t0:.0f}s", file=sys.stderr)

scfg = dataclasses.replace(cfg, quantization="w8a8s_mlp_qkv")
st = SiglipVisionTower(config=scfg, dtype=jnp.float32)
t0 = time.perf_counter()
f_s, _ = jax.jit(lambda p, x: st.apply({"params": p}, x))(filled, px)
a = np.asarray(jax.device_get(f_fp)).ravel()
b = np.asarray(jax.device_get(f_s)).ravel()
print(f"static forward in {time.perf_counter()-t0:.0f}s", file=sys.stderr)

assert np.all(np.isfinite(b)), "non-finite static-tower output on chip"
cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
scales = [float(np.asarray(v)) for p, v in
          jax.tree_util.tree_leaves_with_path(filled) if "act_scale" in str(p)]
assert all(s != 1.0 for s in scales), "act_scale left at init"
print({"backend": jax.default_backend(), "cos_vs_fp": round(cos, 5),
       "n_act_scales": len(scales), "ok": cos > 0.995})
assert cos > 0.995, cos
