"""Interleaved A/B of serving-tower quantization modes on the real chip.

Arms (all compiled up front in ONE process, then timed in alternating groups
so the chip's ~3x tenancy drift cannot masquerade as an arm effect — see
CLAUDE.md "Chip throughput varies"):

  none          bf16 tower (reference numerics)
  w8a8_mlp      int8 fc1/fc2 only (the 54%-of-e2e FLOPs block; attention
                projections stay bf16)
  w8a8_mlp_qkv  fc1/fc2 + q/k/v (one shared activation quantization);
                out_proj stays fp — isolates the full-w8a8 regression
  w8a8          full int8 encoder linears

An arm named ``tower:dec`` additionally quantizes the DECODER linears for the
prefill (``dec`` ∈ int8|w8a8|w8a8_mlp, e.g. ``w8a8_mlp_qkv:w8a8``) — the
decoder is ~8% of e2e FLOPs, so this measures the int8-MXU tail.

An ``@N`` suffix overrides the batch for that arm (e.g.
``w8a8s_mlp_qkv:w8a8@8`` times the same config at 8 videos/step), so batch
sweeps are interleaved in the same window as everything else; f/s figures use
each arm's own batch.

Optionally adds a FULLBLOCK_ALIGNED arm (decoder-prefill flash with full-seq
blocks at d=128) via AB_ALIGNED=1 — the env gate is read at trace time, so the
arm is traced under the flag and timed against the winner's default trace.

Run: HICOM_SKIP_PROBE=1 python scripts/tower_quant_ab.py   (after a direct
relay check; keep the host otherwise idle — host contention poisons this, see
CLAUDE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np

BATCH = int(os.environ.get("AB_BATCH", "4"))
FRAMES = int(os.environ.get("AB_FRAMES", "32"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))
GROUP = int(os.environ.get("AB_GROUP", "2"))  # iters per timing group
ARMS = os.environ.get("AB_ARMS", "none,w8a8_mlp,w8a8").split(",")

import jax
import jax.numpy as jnp

from bench import (calibrate_static_decoder, calibrate_static_tower,
                   random_params_like, relay_health, serving_config)
from hicom_tpu.constants import VIDEO_TOKEN_INDEX
from hicom_tpu.models.hicom import HIComModel


_SHARED = {}  # param subtrees shared across arms (device buffers) — three
# full 1.5B param sets OOM a 16GB chip. Keyed by (name, shape fingerprint) so
# arms that change a subtree's layout (tower quant modes, decoder-quant arms)
# get their own buffers while identical subtrees alias one copy.


def _shared_subtree(name, sub_shapes):
    fp = tuple((jax.tree_util.keystr(p), v.shape, str(v.dtype))
               for p, v in jax.tree_util.tree_flatten_with_path(sub_shapes)[0])
    key = (name, fp)
    if key not in _SHARED:
        _SHARED[key] = random_params_like(sub_shapes)
    return _SHARED[key]


def build_arm(arm_name, aligned=False):
    """Returns (batch, zero-arg timed callable) — compiled + warmed."""
    if aligned:
        os.environ["HICOM_FLASH_FULLBLOCK_ALIGNED"] = "1"
    # '@N' batch override binds tighter than the ':dec' spec and must come
    # last: 'tq:dec@N' (ADVICE r2: rpartition + explicit digit check so a
    # misplaced override fails with a named error, not a bare int() crash)
    arm_name, sep, batch_s = arm_name.rpartition("@")
    if not sep:
        arm_name, batch_s = batch_s, ""
    if batch_s and not batch_s.isdigit():
        raise ValueError(f"arm batch override must be '...@<int>', got "
                         f"'@{batch_s}' (full arm: '{arm_name}@{batch_s}')")
    tower_quant, _, dec_quant = arm_name.partition(":")
    tq = None if tower_quant == "none" else tower_quant
    overrides = {"quantization": dec_quant} if dec_quant else {}
    cfg = serving_config("1.5b", frames=FRAMES, tower_quant=tq, **overrides)
    model = HIComModel(config=cfg)
    rng = np.random.default_rng(0)
    img = cfg.vision_config.image_size
    b, L = int(batch_s) if batch_s else BATCH, 48
    ids = rng.integers(5, cfg.text_config.vocab_size, (b, L))
    ids[:, 2] = VIDEO_TOKEN_INDEX
    input_ids = jnp.asarray(ids)
    frames = jnp.asarray(rng.standard_normal((b, FRAMES, 3, img, img)).astype(np.float32), jnp.bfloat16)
    gids = jnp.asarray(rng.integers(1, cfg.guide_text_config.vocab_size, (b, 24)))
    init_ids = input_ids[:1, :8].at[0, 2].set(VIDEO_TOKEN_INDEX)
    shapes = jax.eval_shape(
        lambda r: model.init(r, init_ids, frames[:1, :1], guide_ids=gids[:1], modal="video")["params"],
        jax.random.PRNGKey(0))
    params = {k: _shared_subtree(k, v) for k, v in shapes.items()}
    if tq and tq.startswith("w8a8s"):
        # static-scale arms need their act_scale params calibrated (one small
        # untimed forward); copy the shared tree before mutating scales
        params = dict(params)
        params["vision_tower"] = jax.tree_util.tree_map(lambda x: x, params["vision_tower"])
        params = calibrate_static_tower(model, cfg, params, frames, gids, tq)
    if dec_quant and dec_quant.startswith("w8a8s"):
        # static-scale DECODER arm (VERDICT r4 next-1): calibrate act scales
        # with one untimed prefill before timing
        params = dict(params)
        params["language_model"] = jax.tree_util.tree_map(lambda x: x, params["language_model"])
        params = calibrate_static_decoder(model, cfg, params, input_ids, frames, gids, dec_quant)

    def pipeline(params, input_ids, frames, gids):
        def run(m):
            ge = m.encode_guide(gids)
            visual = m.encode_visual(frames, ge, "video")
            spliced = m.embed_and_splice(input_ids, visual)
            hidden, _ = m.language_model.model(spliced.embeds, spliced.positions)
            return jnp.sum(m.language_model.logits(hidden[:, -1:]).astype(jnp.float32))

        return model.apply({"params": params}, method=run)

    fn = jax.jit(pipeline)
    t0 = time.perf_counter()
    float(fn(params, input_ids, frames, gids))  # compile + warm
    print(f"  arm {tower_quant}{'+aligned' if aligned else ''}@{b}: compiled in "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)
    if aligned:
        os.environ.pop("HICOM_FLASH_FULLBLOCK_ALIGNED", None)

    def timed():
        g0 = time.perf_counter()
        acc = 0.0
        for _ in range(GROUP):
            acc = acc + fn(params, input_ids, frames, gids)
        float(acc)
        return (time.perf_counter() - g0) / GROUP

    return b, timed


def main():
    health = relay_health()
    print(f"relay_health: {health}", file=sys.stderr)

    arms = {}
    for name in ARMS:
        arms[name] = build_arm(name)
    if os.environ.get("AB_ALIGNED") == "1":
        arms["w8a8_mlp+aligned"] = build_arm("w8a8_mlp", aligned=True)

    # untimed warm round: the relay runs the first post-compile group of each
    # program 5-8x slow (observed 5564 -> 720 ms on round 0 of a fresh arm)
    for _, timed in arms.values():
        timed()

    groups = {k: [] for k in arms}
    for r in range(ROUNDS):
        for k, (ab, timed) in arms.items():
            dt = timed()
            groups[k].append(dt)
            print(f"round {r} {k}: {dt * 1e3:.1f} ms/iter "
                  f"({ab * FRAMES / dt:.1f} f/s)", file=sys.stderr)

    out = {"batch": BATCH, "frames": FRAMES, "relay_health": health, "arms": {}}
    for k, dts in groups.items():
        ab = arms[k][0]
        best = min(dts)
        out["arms"][k] = {
            "batch": ab,  # per-arm batch ('@N' overrides the global BATCH)
            "mean_fps": round(ab * FRAMES * len(dts) / sum(dts), 1),
            "best_fps": round(ab * FRAMES / best, 1),
            "group_ms": [round(d * 1e3, 1) for d in dts],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
