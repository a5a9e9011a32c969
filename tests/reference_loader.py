"""Import the reference PyTorch implementation for golden-value parity tests.

The reference at /root/reference is used ONLY as a test oracle: we run its
modules on random inputs and assert our JAX implementation matches numerically.
Its media deps (decord, moviepy, cv2 wheels it expects) are stubbed since only
tensor math is exercised.
"""

import importlib.machinery
import sys
import types


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference():
    """Returns the reference `hicom` package, importable without media deps."""
    if "hicom" in sys.modules:
        return sys.modules["hicom"]
    _stub("decord", VideoReader=None, cpu=None)
    moviepy = _stub("moviepy")
    editor = _stub("moviepy.editor", VideoFileClip=None)
    moviepy.editor = editor
    sys.path.insert(0, "/root/reference")
    import hicom  # noqa: F401

    return sys.modules["hicom"]


def load_reference_projector():
    load_reference()
    import hicom.model.projector as ref_projector

    return ref_projector


def load_reference_train():
    """Import the reference's hicom/train.py preprocessing functions.

    `hicom.hicom_trainer` fails to import under the installed transformers
    (ALL_LAYERNORM_LAYERS was removed) and needs deepspeed; the preprocess
    functions under test don't touch it, so stub the trainer module with the
    names train.py imports at module level.
    """
    load_reference()
    _stub(
        "hicom.hicom_trainer",
        HIComTrainer=None,
        get_peft_state_maybe_zero_3=None,
        get_peft_state_non_lora_maybe_zero_3=None,
        find_all_linear_names=None,
        safe_save_model_for_hf_trainer=None,
    )
    import importlib

    return importlib.import_module("hicom.train")
