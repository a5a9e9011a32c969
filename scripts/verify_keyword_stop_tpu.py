"""Verify keyword stopping end-to-end on the real TPU chip.

Drives the public generate path (tiny config) with a two-token stop sequence
derived from an unconstrained run, confirming the jitted decode loop stops and
eos-pads on-device. Fetches only small token buffers (D2H is slow).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from hicom_tpu.config import tiny_test_config
from hicom_tpu.constants import VIDEO_TOKEN_INDEX
from hicom_tpu.models.generate import generate_tokens
from hicom_tpu.models.hicom import HIComModel


def main():
    print("backend:", jax.default_backend(), jax.devices())
    cfg = tiny_test_config()
    model = HIComModel(config=cfg)
    rng = np.random.default_rng(3)
    img = cfg.vision_config.image_size
    frames = jnp.asarray(rng.standard_normal((1, 4, 3, img, img)).astype(np.float32))
    ids = rng.integers(5, cfg.text_config.vocab_size, (1, 8))
    ids[:, 3] = VIDEO_TOKEN_INDEX
    ids = jnp.asarray(ids)

    init = jax.jit(lambda: model.init(jax.random.PRNGKey(0), ids, frames, modal="video"))
    params = {"params": init()["params"]}
    eos = cfg.text_config.eos_token_id
    kw = dict(model=model, modal="video", max_new_tokens=6, eos_token_id=eos,
              cache_len=128, has_frames=True)

    base = np.asarray(generate_tokens(params, ids, frames, None, None,
                                      jax.random.PRNGKey(1), **kw))[0]
    print("base tokens:", base.tolist())
    assert eos not in base[:3].tolist(), "need 3 non-eos tokens for the check"

    seq = (int(base[1]), int(base[2]))
    out = np.asarray(generate_tokens(params, ids, frames, None, None,
                                     jax.random.PRNGKey(1), **kw,
                                     stop_sequences=(seq,)))[0]
    print("stopped tokens:", out.tolist(), "stop seq:", seq)
    expect = base[:3].tolist() + [eos] * (len(base) - 3)
    assert out.tolist() == expect, (out.tolist(), expect)
    print("OK: keyword stop verified on", jax.default_backend())


if __name__ == "__main__":
    main()
