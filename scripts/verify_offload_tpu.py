"""Verify --offload-optimizer on the real TPU chip: Adam moments must rest in
pinned_host memory and a train step must still run (the ZeRO-offload analogue,
reference scripts/zero3_offload.json)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from hicom_tpu.config import tiny_test_config
    from hicom_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
    from hicom_tpu.models.hicom import HIComModel
    from hicom_tpu.parallel import create_mesh
    from hicom_tpu.parallel.sharding import shard_batch_tree, supports_host_offload
    from hicom_tpu.train.optimizer import build_optimizer
    from hicom_tpu.train.train_step import create_sharded_state, make_train_step

    print("backend:", jax.default_backend(), "supports_host_offload:", supports_host_offload())
    mesh = create_mesh(dp=1, fsdp=1, tp=1)
    cfg = tiny_test_config()
    model = HIComModel(config=cfg)
    rng = np.random.default_rng(0)
    img = cfg.vision_config.image_size
    ids = rng.integers(5, cfg.text_config.vocab_size, (2, 10))
    ids[:, 1] = VIDEO_TOKEN_INDEX
    labels = np.array(ids)
    labels[:, :4] = IGNORE_INDEX
    batch = {
        "input_ids": jnp.asarray(ids),
        "frames": jnp.asarray(rng.standard_normal((2, 2, 3, img, img)).astype(np.float32)),
        "labels": jnp.asarray(labels),
    }
    optimizer = build_optimizer(
        jax.eval_shape(
            lambda r: model.init(r, batch["input_ids"], batch["frames"],
                                 labels=batch["labels"], modal="video")["params"],
            jax.random.PRNGKey(0),
        ),
        learning_rate=1e-2, total_steps=4, warmup_ratio=0.0,
        schedule_kind="constant", tunable_parts="mm_projector,language_model",
    )
    with mesh:
        state, shardings = create_sharded_state(
            model, optimizer, mesh, batch, jax.random.PRNGKey(0), offload_optimizer=True)
        kinds = {getattr(s, "memory_kind", None)
                 for s in jax.tree.leaves(shardings.opt_state) if hasattr(s, "memory_kind")}
        print("opt-state memory kinds:", kinds)
        step = jax.jit(make_train_step(model, optimizer, offload_optimizer=True),
                       donate_argnums=0, out_shardings=(shardings, None))
        state, m1 = step(state, shard_batch_tree(batch, mesh))
        state, m2 = step(state, shard_batch_tree(batch, mesh))
        l1, l2 = float(m1["loss"]), float(m2["loss"])
        print("losses:", l1, l2)
        arr_kinds = {a.sharding.memory_kind for a in jax.tree.leaves(state.opt_state)
                     if hasattr(a, "sharding") and hasattr(a.sharding, "memory_kind")}
        print("post-step opt-state array memory kinds:", arr_kinds)
        assert np.isfinite(l1) and l2 < l1, (l1, l2)
        if supports_host_offload():
            assert arr_kinds == {"pinned_host"}, arr_kinds
    print("OK: offloaded optimizer train step verified on", jax.default_backend())


if __name__ == "__main__":
    main()
