"""HICom-TPU: a TPU-native hybrid-level instruction-injection video LLM framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of lntzm/HICom
(CVPR 2025, arXiv 2503.16036): instruction-conditioned local+global video token
compression feeding a Qwen2.5/Llama decoder, with pjit-sharded training and a
single-command sharded eval harness.

Public API (mirrors the reference surface, /root/reference/hicom/__init__.py):

    model, processor, tokenizer = hicom_tpu.model_init(model_path)
    reply = hicom_tpu.mm_infer(tensor, "What happens?", model, tokenizer, modal="video")
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    HIComConfig,
    LlamaConfig,
    ProjectorSpec,
    Qwen2Config,
    SiglipTextConfig,
    SiglipVisionConfig,
    parse_projector_type,
    tiny_test_config,
)


def model_init(model_path, **kwargs):
    from .api import model_init as _mi

    return _mi(model_path, **kwargs)


def mm_infer(image_or_video, instruct, model, tokenizer, modal="video", **kwargs):
    from .api import mm_infer as _infer

    return _infer(image_or_video, instruct, model, tokenizer, modal=modal, **kwargs)
