"""quantize_decoder_shapes must stay in lockstep with quantize_decoder_params.

bench.py's QLoRA mode builds random 7B params straight on device from the
ShapeDtypeStruct twin (a host fp 7B tree is ~14GB on the 1-core host); if the
twin's layout drifts from the real converter, the benched program silently
measures a different model than training would load.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hicom_tpu.models.qwen2 import (dequantize_decoder_params,
                                    quantize_decoder_params,
                                    quantize_decoder_shapes)


def _tiny_lm_params(in_dim=32, out_dim=48, mlp=64):
    rng = np.random.default_rng(0)

    def dense(i, o, bias=False):
        d = {"kernel": rng.standard_normal((i, o)).astype(np.float32)}
        if bias:
            d["bias"] = rng.standard_normal((o,)).astype(np.float32)
        return d

    layer = {
        "self_attn": {"q_proj": dense(in_dim, in_dim, bias=True),
                      "k_proj": dense(in_dim, out_dim, bias=True),
                      "v_proj": dense(in_dim, out_dim, bias=True),
                      "o_proj": dense(in_dim, in_dim)},
        "mlp": {"gate_proj": dense(in_dim, mlp),
                "up_proj": dense(in_dim, mlp),
                "down_proj": dense(mlp, in_dim)},
        "input_layernorm": {"scale": np.ones((in_dim,), np.float32)},
    }
    return {"model": {"layers_0": layer, "layers_1": layer,
                      "norm": {"scale": np.ones((in_dim,), np.float32)}},
            "embed_tokens": {"embedding": rng.standard_normal((96, in_dim)).astype(np.float32)},
            "lm_head": dense(in_dim, 96)}


@pytest.mark.parametrize("mode", ["int8", "nf4", "w8a8", "w8a8_mlp", "w8a8s", "w8a8s_mlp"])
def test_quantize_decoder_shapes_match(mode):
    params = _tiny_lm_params()
    real = quantize_decoder_params(params, mode)
    shapes = quantize_decoder_shapes(
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype),
                     params), mode)

    real_tree = jax.tree.map(lambda a: (np.shape(a), np.asarray(a).dtype), real)
    twin_tree = jax.tree.map(lambda s: (tuple(s.shape), np.dtype(s.dtype)), shapes)
    assert real_tree == twin_tree


def test_shapes_twin_dequantizes_like_real_codes():
    """The twin's layout must feed dequantize_decoder_params unchanged — the
    exact path bench.py's QLoRA step runs in-trace."""
    params = _tiny_lm_params()
    for mode in ("int8", "nf4"):
        real = jax.tree.map(jnp.asarray, quantize_decoder_params(params, mode))
        fp = dequantize_decoder_params(real, jnp.float32)
        k = fp["model"]["layers_0"]["mlp"]["gate_proj"]["kernel"]
        ref = params["model"]["layers_0"]["mlp"]["gate_proj"]["kernel"]
        assert k.shape == ref.shape
        rel = float(jnp.abs(k - ref).mean() / jnp.abs(ref).mean())
        # int8 is per-column absmax (~0.5% on normals); nf4's 16-level
        # codebook runs ~8-9% mean abs error on standard-normal weights
        assert rel < (0.12 if mode == "nf4" else 0.02), (mode, rel)
