"""Training entry point: the reference's 3-stage recipe on a TPU mesh.

Mirrors the flag surface of ``/root/reference/hicom/train.py`` (stages are
selected purely by flags, as in ``scripts/qwen2.5_7B/release/*.sh``):

  stage 1 (pretrain):     --is-pretraining --mm-tunable-parts mm_projector --learning-rate 1e-3
  stage 2 (cond-pretrain):--use-guide direct --pretrain-weights stage1/mm_projector.bin \
                          --mm-tunable-parts mm_projector --guide-injector-lr 1e-3
  stage 3 (SFT):          --mm-tunable-parts mm_projector,language_model,vision_model_head,guide_encoder

DeepSpeed/torchrun are replaced by the (dp, fsdp, tp) mesh; ZeRO-3 ≙ fsdp
sharding; gradient accumulation via optax.MultiSteps.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="hicom-tpu trainer")
    # model
    p.add_argument("--model-path", required=True, help="base LLM / SFT checkpoint dir")
    p.add_argument("--vision-tower", default="google/siglip-so400m-patch14-384")
    p.add_argument("--mm-projector-type", default="local43_global32")
    p.add_argument("--use-guide", default=None)
    p.add_argument("--use-clip-scale", default="")
    p.add_argument("--mm-vision-select-layer", type=int, default=-2)
    p.add_argument("--mm-tunable-parts", default="mm_projector")
    p.add_argument("--pretrain-weights", default=None, help="stage-1 mm_projector.bin")
    p.add_argument("--image-aspect-ratio", default="pad")
    p.add_argument("--image-grid-pinpoints", default=None)
    p.add_argument("--mm-patch-merge-type", default="flat")
    p.add_argument("--mm-newline-position", default="one_token")
    p.add_argument("--num-frames", type=int, default=8)
    p.add_argument("--max-num-frames", type=int, default=256)
    p.add_argument("--model-max-length", type=int, default=4096)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--scan-layers", action="store_true",
                   help="lax.scan over decoder layers (fast compiles; stacked params)")
    p.add_argument("--remat", action="store_true",
                   help="gradient-checkpoint decoder + vision blocks (activation memory)")
    # data
    p.add_argument("--data-path", nargs="+", required=True)
    p.add_argument("--data-folder", default=None)
    p.add_argument("--is-pretraining", action="store_true")
    # optimization
    p.add_argument("--learning-rate", type=float, default=1e-5)
    p.add_argument("--mm-projector-lr", type=float, default=None)
    p.add_argument("--vision-tower-lr", type=float, default=None)
    p.add_argument("--guide-injector-lr", type=float, default=None)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--warmup-ratio", type=float, default=0.03)
    p.add_argument("--lr-scheduler-type", default="cosine")
    p.add_argument("--max-grad-norm", type=float, default=1.0)
    p.add_argument("--num-train-epochs", type=float, default=1.0)
    p.add_argument("--per-device-train-batch-size", type=int, default=1)
    p.add_argument("--gradient-accumulation-steps", type=int, default=1)
    p.add_argument("--group-by-modality-length", action="store_true", default=True)
    # parallelism
    p.add_argument("--dp", type=int, default=None)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    # lora
    p.add_argument("--lora-enable", action="store_true")
    p.add_argument("--lora-r", type=int, default=128)
    p.add_argument("--lora-alpha", type=int, default=256)
    p.add_argument("--offload-optimizer", action="store_true",
                   help="rest Adam moments in host memory (pinned_host), "
                        "streamed per step — ZeRO-offload analogue "
                        "(reference scripts/zero3_offload.json)")
    p.add_argument("--bits", type=int, default=16, choices=(4, 8, 16),
                   help="QLoRA: store the frozen decoder base in NF4 (4) or "
                        "int8 (8); requires --lora-enable (reference "
                        "train.py:567-587 kbit prep + LoRA)")
    # io
    p.add_argument("--output-dir", required=True)
    p.add_argument("--save-steps", type=int, default=500)
    p.add_argument("--logging-steps", type=int, default=10)
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--seed", type=int, default=42)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    if os.environ.get("HICOM_MULTIHOST") == "1":
        # TPU pod slices: one process per host; jax.distributed picks the
        # coordinator from the TPU environment (replaces torchrun env vars,
        # reference directg_local43_global32.sh:4-19).
        jax.distributed.initialize()

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from .. import weights as W
    from ..api import _tower_configs
    from ..config import HIComConfig
    from ..data.processor import SiglipImagePreprocessor
    from ..models.hicom import HIComModel
    from ..parallel import create_mesh
    from ..parallel.sharding import make_global_batch
    from .checkpoints import export_mm_projector_bin, restore_checkpoint, save_checkpoint
    from .dataset import Collator, DataArguments, SupervisedDataset, iter_batches
    from .optimizer import build_optimizer, trainable_param_count
    from .train_step import TrainState, create_sharded_state, make_train_step

    if args.lora_enable and args.scan_layers:
        raise SystemExit("--lora-enable targets per-layer 2-D kernels; "
                         "incompatible with --scan-layers (stacked 3-D params)")
    if args.bits != 16 and not args.lora_enable:
        raise SystemExit("--bits 4/8 is QLoRA (frozen quantized base + LoRA "
                         "adapters); pass --lora-enable")
    os.makedirs(args.output_dir, exist_ok=True)
    # ---- config ----
    with open(os.path.join(args.model_path, "config.json")) as f:
        base_cfg = json.load(f)
    base_cfg.setdefault("model_type", "hicom_qwen2" if "qwen" in args.model_path.lower() else base_cfg.get("model_type", "hicom_qwen2"))
    if not base_cfg["model_type"].startswith("hicom_"):
        base_cfg["model_type"] = "hicom_qwen2" if "qwen2" in base_cfg["model_type"] else "hicom_llama"
    cfg = HIComConfig.from_hf_dict(base_cfg)
    if args.scan_layers or args.remat:
        import dataclasses as _dc

        cfg = cfg.replace(text_config=_dc.replace(
            cfg.text_config, scan_layers=args.scan_layers, remat=args.remat))
    vision_cfg, guide_cfg = _tower_configs(args.vision_tower)
    if args.remat:
        import dataclasses as _dc

        vision_cfg = _dc.replace(vision_cfg, remat=True)
    cfg = cfg.replace(
        vision_config=vision_cfg,
        guide_text_config=guide_cfg,
        mm_vision_tower=args.vision_tower,
        mm_projector_type=args.mm_projector_type,
        mm_vision_select_layer=args.mm_vision_select_layer,
        mm_patch_merge_type=args.mm_patch_merge_type,
        mm_newline_position=args.mm_newline_position,
        image_aspect_ratio=args.image_aspect_ratio,
        image_grid_pinpoints=args.image_grid_pinpoints,
        use_guide=args.use_guide,
        use_clip_scale=args.use_clip_scale,
        num_frames=args.num_frames,
        max_num_frames=args.max_num_frames,
        model_max_length=args.model_max_length,
        dtype=args.dtype,
    )
    model = HIComModel(config=cfg)

    # ---- tokenizers / data ----
    tokenizer = AutoTokenizer.from_pretrained(args.model_path)
    if tokenizer.pad_token is None:
        tokenizer.pad_token = tokenizer.unk_token or tokenizer.eos_token
    guide_tokenizer = None
    if cfg.guide_enabled():
        guide_tokenizer = AutoTokenizer.from_pretrained(args.vision_tower)
    image_processor = SiglipImagePreprocessor(size=(cfg.vision_config.image_size,) * 2)
    dargs = DataArguments(
        data_path=args.data_path,
        data_folder=args.data_folder,
        image_aspect_ratio=args.image_aspect_ratio,
        image_grid_pinpoints=args.image_grid_pinpoints,
        num_frames=args.num_frames,
        use_guide=args.use_guide,
        is_pretraining=args.is_pretraining,
        image_size=cfg.vision_config.image_size,
        patch_size=getattr(cfg.vision_config, "patch_size", 14),
        mm_patch_merge_type=args.mm_patch_merge_type,
        model_max_length=args.model_max_length,
    )
    dataset = SupervisedDataset(tokenizer, dargs, image_processor)
    collator = Collator(tokenizer, dargs, guide_tokenizer)
    n_proc, proc_idx = jax.process_count(), jax.process_index()
    if n_proc > 1:
        # every host must collate identical shapes (see Collator docstring);
        # image batches pad to the crop budget, not the video frame budget
        collator.fixed_length = args.model_max_length
        collator.fixed_frames = {"video": max(args.num_frames, 1),
                                 "image": dataset.max_image_crops}
        collator.fixed_multi_image = dataset.has_multi_image

    # ---- mesh / optimizer / state ----
    mesh = create_mesh(dp=args.dp, fsdp=args.fsdp, tp=args.tp)
    if args.bits != 16 and args.fsdp * args.tp > 1:
        # QLoRA trees carry no fsdp/tp sharding rules (the quantized layouts
        # have no axis annotations); only plain data parallelism — replicated
        # frozen params + sharded batch — is supported. Fail loudly instead
        # of silently replicating under an fsdp/tp mesh.
        raise SystemExit("--bits 4/8 (QLoRA) supports dp-only meshes "
                         "(replicated quantized decoder + sharded batch); "
                         "use bf16 LoRA/full training for fsdp/tp > 1")
    batch_size = args.per_device_train_batch_size * mesh.devices.size
    steps_per_epoch = max(1, len(dataset) // (batch_size * args.gradient_accumulation_steps))
    total_steps = int(steps_per_epoch * args.num_train_epochs)

    init_batch = collator([dataset[0]] * batch_size)
    modal = init_batch.get("modal", "text")

    import optax

    def make_opt(params_shape):
        tx = build_optimizer(
            params_shape,
            learning_rate=args.learning_rate,
            total_steps=total_steps,
            warmup_ratio=args.warmup_ratio,
            weight_decay=args.weight_decay,
            max_grad_norm=args.max_grad_norm,
            mm_projector_lr=args.mm_projector_lr,
            vision_tower_lr=args.vision_tower_lr,
            guide_injector_lr=args.guide_injector_lr,
            tunable_parts=args.mm_tunable_parts,
            use_guide=args.use_guide,
            schedule_kind=args.lr_scheduler_type,
        )
        if args.gradient_accumulation_steps > 1:
            tx = optax.MultiSteps(tx, args.gradient_accumulation_steps)
        return tx

    rng = jax.random.PRNGKey(args.seed)
    params_shape = jax.eval_shape(
        lambda r: model.init(
            r, jnp.asarray(init_batch["input_ids"]), jnp.asarray(init_batch.get("frames")),
            labels=jnp.asarray(init_batch["labels"]),
            guide_ids=jnp.asarray(init_batch["guide_ids"]) if "guide_ids" in init_batch else None,
            modal=modal,
        )["params"],
        rng,
    )
    optimizer = make_opt(params_shape)

    with mesh:
        state, shardings = create_sharded_state(
            model, optimizer, mesh,
            {k: jnp.asarray(v) for k, v in init_batch.items() if not isinstance(v, (str, bool))},
            rng, modal=modal, offload_optimizer=args.offload_optimizer,
        )

        # ---- load pretrained weights into the fresh state ----
        loaded: dict = {}
        llm_sd = W.load_hf_state_dict(args.model_path)
        loaded["language_model"] = W.convert_decoder(llm_sd, cfg.text_config.tie_word_embeddings)
        if args.scan_layers:
            loaded["language_model"] = W.stack_decoder_layers(loaded["language_model"])
        if os.path.isdir(args.vision_tower):
            tower_sd = W.load_hf_state_dict(args.vision_tower)
            loaded["vision_tower"] = W.convert_siglip_vision(tower_sd)
            if cfg.guide_enabled():
                loaded["guide_encoder"] = W.convert_siglip_text(tower_sd)
        if args.pretrain_weights:
            proj_sd = W.load_torch_bin(args.pretrain_weights)
            loaded["mm_projector"] = W.convert_projector_state(proj_sd, cfg.projector.kind)
        params = W.merge_params(dict(state.params), loaded)
        params = jax.tree.map(lambda new, old: jnp.asarray(new, old.dtype), params, dict(state.params))
        state = TrainState(params, state.opt_state, state.step)

        n_trainable = trainable_param_count(state.params, args.mm_tunable_parts, args.use_guide)
        print(f"total steps: {total_steps} | batch {batch_size} x accum {args.gradient_accumulation_steps} "
              f"| trainable params: {n_trainable / 1e6:.1f}M | modal: {modal}")

        if args.resume:
            restored = restore_checkpoint(args.output_dir, state)
            if restored is not None:
                state = restored
                print(f"resumed from step {int(state.step)}")

        if args.lora_enable:
            # LoRA: decoder low-rank factors are the only trainable leaves;
            # base params stay frozen (the reference's peft wrap, train.py:619-635).
            import optax as _optax

            from .lora import init_lora_params, make_lora_loss_fn
            from .optimizer import make_schedule
            from .train_step import make_loss_fn

            base_params = state.params
            lora = init_lora_params(base_params, rank=args.lora_r, rng=jax.random.PRNGKey(args.seed))
            lora_tx = _optax.adamw(make_schedule(args.learning_rate, total_steps, args.warmup_ratio,
                                                 args.lr_scheduler_type), weight_decay=args.weight_decay)
            lora_step_fns: dict = {}

            qmodel = model
            if args.bits != 16:
                # QLoRA: quantize the fp decoder once on host, then run the
                # QUANTIZED modules (QuantDense/QuantDense4) so dequantization
                # happens inside each layer's remat boundary, with adapters on
                # the lora_interceptor side-path. Merging W+sAB instead keeps
                # the full fp decoder alive across fwd+bwd (13 GB at 7B —
                # measured XLA compile OOM). Frozen non-decoder floats are
                # stored in the compute dtype (they take no optimizer state).
                import dataclasses as _dc

                from ..models.hicom import HIComModel as _HM
                from ..models.qwen2 import quantize_decoder_params

                qmode = "nf4" if args.bits == 4 else "int8"
                lm_host = jax.device_get(dict(base_params)["language_model"])
                q_lm = jax.tree.map(jnp.asarray, quantize_decoder_params(lm_host, qmode))
                qdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

                def cast_frozen(v):
                    return jax.tree.map(
                        lambda x: x.astype(qdt) if jnp.issubdtype(x.dtype, jnp.floating) else x, v)

                # Cast the decoder's REMAINING fp leaves (embed_tokens, lm_head,
                # norms, quant scales) to the compute dtype too: at 7B the
                # untied 152k-vocab embeds+head are ~4.4 GB fp32 vs 2.2 GB
                # bf16, and the bench/estimate size the quantized layout with
                # bf16 floats (bench.py random_params_like float_dtype=bf16) —
                # the real path must match that profile. The reference keeps
                # these in torch_dtype=bf16 (bnb skips non-linear modules).
                frozen_params = {
                    **{k: cast_frozen(v) for k, v in dict(base_params).items()
                       if k != "language_model"},
                    "language_model": cast_frozen(q_lm)}
                if mesh.devices.size > 1:
                    # dp mesh: frozen base + adapters replicate, batches shard
                    # (plain data parallelism; grads psum under jit)
                    from jax.sharding import NamedSharding
                    from jax.sharding import PartitionSpec as _P

                    frozen_params = jax.device_put(
                        frozen_params, NamedSharding(mesh, _P()))
                qmodel = _HM(config=_dc.replace(
                    cfg, text_config=_dc.replace(cfg.text_config, quantization=qmode)))
                del lm_host, state, base_params  # free the fp decoder

            def wrap_lora_loss(base_loss_fn):
                if args.bits == 16:
                    return make_lora_loss_fn(base_loss_fn, base_params,
                                             alpha=args.lora_alpha, rank=args.lora_r)
                from .lora import make_qlora_loss_fn

                return make_qlora_loss_fn(base_loss_fn, frozen_params,
                                          alpha=args.lora_alpha, rank=args.lora_r,
                                          compute_dtype=qdt)

            def get_lora_step_fn(batch):
                key = (batch.get("modal", modal), bool(batch.get("multi_image", False)),
                       "frames" in batch)
                if key not in lora_step_fns:
                    loss_fn = wrap_lora_loss(
                        make_loss_fn(qmodel, key[0], has_frames=key[2], multi_image=key[1]))

                    def lora_step(carry, batch, loss_fn=loss_fn):
                        lora, opt_state, step_count = carry
                        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(lora, batch)
                        updates, opt_state = lora_tx.update(grads, opt_state, lora)
                        return (_optax.apply_updates(lora, updates), opt_state, step_count + 1), metrics

                    lora_step_fns[key] = jax.jit(lora_step, donate_argnums=0)
                return lora_step_fns[key]

            lora_opt_state = lora_tx.init(lora)
            carry = (lora, lora_opt_state, jnp.int32(0))
            t0 = time.time()
            step = 0
            while step < total_steps:
                advanced = False
                for batch in iter_batches(dataset, collator, batch_size, seed=args.seed + step,
                                          group_by_modality=args.group_by_modality_length,
                                          process_index=proc_idx, process_count=n_proc):
                    advanced = True
                    jbatch = {k: v for k, v in batch.items()
                              if not isinstance(v, (str, bool)) and k != "anyres_plan"}
                    carry, metrics = get_lora_step_fn(batch)(carry, make_global_batch(jbatch, mesh))
                    step += 1
                    if step % args.logging_steps == 0:
                        loss = float(metrics["loss"])
                        print(f"[lora] step {step}/{total_steps} loss {loss:.4f}")
                        if proc_idx == 0:
                            with open(os.path.join(args.output_dir, "metrics.jsonl"), "a") as mf:
                                mf.write(json.dumps({"step": step, "loss": loss,
                                                     "time": time.time()}) + "\n")
                    if step >= total_steps:
                        break
                if not advanced:
                    raise RuntimeError("no full batches; reduce batch size")
            if proc_idx != 0:
                return  # lora params are replicated; only host 0 writes
            from .lora import export_peft_adapter

            export_peft_adapter(jax.device_get(carry[0]), args.output_dir,
                                alpha=args.lora_alpha, rank=args.lora_r)
            print(f"exported LoRA adapter to {args.output_dir}")
            return

        # one compiled step per (modal, multi_image, has_frames) — mixed
        # datasets flip these per batch (uniform-modality batching upstream)
        step_fns: dict = {}

        def get_step_fn(batch):
            key = (batch.get("modal", modal), bool(batch.get("multi_image", False)),
                   "frames" in batch, batch.get("anyres_plan"))
            if key not in step_fns:
                # explicit out_shardings keep the updated optimizer state in
                # its creation-time memory kind (pinned_host under
                # --offload-optimizer); otherwise jit may infer device memory
                jit_kw = dict(donate_argnums=0)
                if args.offload_optimizer:
                    jit_kw["out_shardings"] = (shardings, None)
                step_fns[key] = jax.jit(
                    make_train_step(model, optimizer, modal=key[0],
                                    has_frames=key[2], multi_image=key[1],
                                    anyres_plan=key[3],
                                    tunable_parts=args.mm_tunable_parts,
                                    use_guide=args.use_guide,
                                    offload_optimizer=args.offload_optimizer),
                    **jit_kw)
            return step_fns[key]

        t0 = time.time()
        step = int(state.step)
        losses = []
        while step < total_steps * args.gradient_accumulation_steps:
            made_progress = False
            for batch in iter_batches(dataset, collator, batch_size, seed=args.seed + step,
                                      group_by_modality=args.group_by_modality_length,
                                      process_index=proc_idx, process_count=n_proc):
                made_progress = True
                step_fn = get_step_fn(batch)
                jbatch = {k: v for k, v in batch.items()
                              if not isinstance(v, (str, bool)) and k != "anyres_plan"}
                state, metrics = step_fn(state, make_global_batch(jbatch, mesh))
                step += 1
                losses.append(metrics["loss"])
                if step % args.logging_steps == 0:
                    loss = float(jnp.mean(jnp.stack(losses)))
                    losses.clear()
                    rate = step / max(time.time() - t0, 1e-9)
                    if proc_idx == 0:
                        print(f"step {step}/{total_steps} loss {loss:.4f} ({rate:.2f} it/s)")
                        with open(os.path.join(args.output_dir, "metrics.jsonl"), "a") as mf:
                            mf.write(json.dumps({"step": step, "loss": loss, "it_per_s": rate,
                                                 "time": time.time()}) + "\n")
                if step % args.save_steps == 0:
                    # orbax handles sharded global arrays (all hosts
                    # participate); pass device arrays so the async commit
                    # overlaps the next train steps instead of blocking on a
                    # synchronous device_get here
                    save_checkpoint(args.output_dir, state, step)
                if step >= total_steps * args.gradient_accumulation_steps:
                    break
            if not made_progress:
                raise RuntimeError(
                    f"dataset ({len(dataset)} samples) yields no full batches of size {batch_size}; "
                    "reduce batch size or devices"
                )

        # final save blocks: the process may exit right after the exports
        save_checkpoint(args.output_dir, state if n_proc > 1 else jax.device_get(state),
                        step, wait=True)
        tunable = set(args.mm_tunable_parts.split(","))
        # exports gather to host 0 (params are modest: projector MBs, 7B LLM
        # fits host RAM); multi-host gathers via allgather-to-replicated
        if n_proc > 1:
            from jax.sharding import NamedSharding, PartitionSpec as _P

            rep = NamedSharding(mesh, _P())
            final_params = jax.device_get(
                jax.jit(lambda p: p, out_shardings=rep)(state.params)
            )
        else:
            final_params = jax.device_get(state.params)
        if proc_idx != 0:
            return
        if tunable <= {"mm_projector", "attn_scale"}:
            # projector-only stages export the reference's mm_projector.bin
            export_mm_projector_bin(final_params, os.path.join(args.output_dir, "mm_projector.bin"))
            print(f"exported projector-only weights to {args.output_dir}/mm_projector.bin")
        else:
            # full SFT: reference-layout HF checkpoint (+ tokenizer files)
            from ..weights import export_hf_checkpoint

            export_dir = os.path.join(args.output_dir, "hf_export")
            export_hf_checkpoint(dict(final_params), cfg, export_dir)
            try:
                tokenizer.save_pretrained(export_dir)
            except Exception:
                pass
            print(f"exported SFT checkpoint to {export_dir}")
    print("training done")


if __name__ == "__main__":
    main()
