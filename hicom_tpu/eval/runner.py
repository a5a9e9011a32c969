"""Unified eval inference driver: one command per benchmark.

Replaces the reference's per-GPU bash fan-out (``scripts/eval/video/*.sh``):
the model loads once and the whole question set streams through the chip.
``--num-chunks/--chunk-idx`` remain for multi-host sharding compatibility.
"""

from __future__ import annotations

import argparse
import sys

from ..api import mm_infer, model_init
from ..data.prompts import get_model_name_from_path
from .benchmarks import REGISTRY


def build_parser():
    p = argparse.ArgumentParser(description="hicom-tpu benchmark inference")
    p.add_argument("--benchmark", required=True, choices=sorted(REGISTRY))
    p.add_argument("--sub-benchmark", default=None, help="image_vqa variant: gqa/pope/vqav2/vizwiz/...")
    p.add_argument("--model-path", required=True)
    p.add_argument("--model-base", default=None)
    p.add_argument("--video-folder", default=None)
    p.add_argument("--image-folder", default=None)
    p.add_argument("--subtitle-folder", default=None)
    p.add_argument("--question-file", required=True)
    p.add_argument("--answer-gt-file", default=None)
    p.add_argument("--answer-file", required=True)
    p.add_argument("--num-chunks", type=int, default=1)
    p.add_argument("--chunk-idx", type=int, default=0)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--load-8bit", action="store_true")
    p.add_argument("--load-4bit", action="store_true")
    p.add_argument("--tower-quant", default=None,
                   choices=("w8a8", "w8a8_mlp", "w8a8_mlp_qkv",
                            "w8a8s", "w8a8s_mlp", "w8a8s_mlp_qkv"),
                   help="int8-MXU serving tower (models/quant.py); static "
                        "w8a8s* modes self-calibrate on the first sample")
    p.add_argument("--dec-quant", default=None,
                   choices=("int8", "nf4", "w8a8", "w8a8_mlp", "w8a8s", "w8a8s_mlp"),
                   help="decoder quantization (int8/nf4 == --load-8bit/4bit; "
                        "w8a8* runs prefill on the int8 MXU; w8a8s* uses "
                        "static CALIBRATED activation scales — pair with "
                        "--calib-video)")
    p.add_argument("--device-preprocess", action="store_true",
                   help="pad+resize+normalize video frames ON DEVICE "
                        "(ops/preprocess.py): the host only decodes — the fix "
                        "for 1-core hosts where the PIL/C++ resize can't feed "
                        "the chip (reference hides this in 8 DataLoader workers)")
    p.add_argument("--calib-video", default=None,
                   help="calibrate a static-quant tower (w8a8s*) on THIS "
                        "video's frames before eval, instead of the default "
                        "self-calibration on the first eval sample — keeps "
                        "the calibration distribution distinct from the "
                        "benchmark being scored")
    p.add_argument("--kv-cache-int8", action="store_true")
    p.add_argument("--scan-layers", action="store_true")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batched generation across all local chips (one "
                        "program replaces the reference's per-GPU bash fan-out)")
    p.add_argument("--max-new-tokens", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=1,
                   help="videos per compiled generate step (MCQA benchmarks)")
    p.add_argument("--skip-existing", action="store_true",
                   help="skip inference when the answer file already exists (reference guardrail)")
    return p


def main(argv=None):
    import os

    args = build_parser().parse_args(argv)
    if args.skip_existing and os.path.exists(args.answer_file) and os.path.getsize(args.answer_file) > 0:
        print(f"answer file exists, skipping: {args.answer_file}", file=sys.stderr)
        return
    model, processor, tokenizer = model_init(
        args.model_path, model_base=args.model_base, dtype=args.dtype,
        load_8bit=args.load_8bit, load_4bit=args.load_4bit,
        load_w8a8_tower=args.tower_quant or False, dec_quant=args.dec_quant,
        device_preprocess=args.device_preprocess,
        kv_cache_int8=args.kv_cache_int8, scan_layers=args.scan_layers)
    if args.calib_video:
        import numpy as np

        quant = getattr(model.config.vision_config, "quantization", None) or ""
        dec_q = getattr(model.config.text_config, "quantization", None) or ""
        if quant.startswith("w8a8s"):
            model.calibrate_tower(np.asarray(processor["video"](args.calib_video))[None])
        if dec_q.startswith("w8a8s"):
            # static DECODER scales calibrate on the same distinct clip, via a
            # representative chat-template prompt (the splice is dominated by
            # visual tokens, so per-tensor amax is prompt-insensitive)
            from ..constants import DEFAULT_VIDEO_TOKEN
            from ..data.prompts import tokenizer_multimodal_token

            msg = [{"role": "user", "content": DEFAULT_VIDEO_TOKEN + "\nwhat is in the video ?"}]
            prompt = tokenizer.apply_chat_template(msg, tokenize=False, add_generation_prompt=True)
            ids = np.asarray(tokenizer_multimodal_token(
                prompt, tokenizer, DEFAULT_VIDEO_TOKEN, return_tensors="np"))[None]
            model.calibrate_decoder(ids, np.asarray(processor["video"](args.calib_video))[None])
        if not quant.startswith("w8a8s") and not dec_q.startswith("w8a8s"):
            print(f"--calib-video ignored: neither tower ({quant!r}) nor decoder "
                  f"({dec_q!r}) has static activation scales to calibrate", file=sys.stderr)
    if args.data_parallel:
        import jax as _jax

        n_dev = len(_jax.devices())
        if args.batch_size % n_dev != 0:
            # batches only shard when the batch axis divides the device count
            raise SystemExit(
                f"--data-parallel needs --batch-size to be a multiple of the "
                f"{n_dev} devices (got {args.batch_size}); also note only the "
                f"batched MCQA benchmarks (mvbench/mlvu/...) shard — "
                f"batch-1 benchmarks run replicated."
            )
        model.shard_for_eval()
    args.model_id = get_model_name_from_path(args.model_path)

    def infer(tensor, instruct, modal="video", image_size=None, guide_instruct=None):
        kwargs = {}
        if model.config.guide_enabled() and guide_instruct is not None:
            kwargs["guide_instruct"] = guide_instruct
        return mm_infer(
            tensor, instruct, model, tokenizer, modal=modal, image_size=image_size,
            do_sample=False, max_new_tokens=args.max_new_tokens, **kwargs,
        )

    if args.batch_size > 1:
        from ..api import mm_infer_batch

        def infer_batch(tensors, instructs, guide_instructs):
            return mm_infer_batch(
                tensors, instructs, model, tokenizer, modal="video",
                guide_instructs=guide_instructs if model.config.guide_enabled() else None,
                max_new_tokens=args.max_new_tokens,
            )

        args.infer_batch = infer_batch

    bench = REGISTRY[args.benchmark]()
    bench.run(args, processor, infer)
    print(f"done: {args.benchmark} → {args.answer_file}", file=sys.stderr)


if __name__ == "__main__":
    main()
