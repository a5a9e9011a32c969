"""Quick relay/chip health canary: times a 27-deep tower-MLP matmul chain.

Healthy v5e-via-axon ≈ 95 ms (131 TFLOP/s); degraded windows measure 2-4x
that (shared-tenancy throttling observed 2026-08-16: same bench measured
107 -> 35 f/s across two hours). Run BEFORE trusting any bench/A-B numbers.
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, jax.numpy as jnp, numpy as np

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
for _ in range(3): float(mlp27(x0, w1, w2))
dt = (time.perf_counter() - t0) / 3
fl = 27 * 2 * 23328 * 1152 * 4304 * 2
import json
print(json.dumps({"mlp27_ms": round(dt*1e3, 1), "tflops": round(fl/dt/1e12, 1),
                  "healthy": dt < 0.150}))
