"""Static per-tensor int8 vs outlier activation channels (VERDICT r3 next-5a).

The known failure mode of per-tensor static activation quantization on
trained transformers: a few hidden channels run 10-100x hotter than the
rest, the absmax scale crushes normal channels to +-1 codes, and accuracy
collapses. These tests INJECT that failure synthetically and assert the
quant stack degrades gracefully via the SmoothQuant-style per-channel fold
in fill_act_scales (models/quant.py): outlier magnitude migrates into the
per-output-channel int8 weights, the runtime quantizes x/c.

Structure:
  * failing-by-construction: WITHOUT the fold (outlier_ratio=inf) the error
    is catastrophic — proving the test would catch a real regression;
  * WITH the fold (default fill) the same site tracks fp closely;
  * without outliers the fold is a bit-exact no-op (codes unchanged), so
    well-behaved models keep their pre-fold numerics;
  * tower-level: outliers injected via layernorm gains exercise the shared
    q/k/v ActQuant site and the per-dense sites through the real model.
"""

import numpy as np

import jax
import jax.numpy as jnp

from hicom_tpu import config as hcfg
from hicom_tpu.models.quant import (W8A8DenseS, fill_act_scales,
                                    prune_fp_kernels, quantize_tower_params)
from hicom_tpu.models.siglip import SiglipVisionTower

OUT_CH = [3, 17, 40]  # injected outlier channels


def _calibrate_dense(qp, x):
    model = W8A8DenseS(int(qp["kernel_scale"].shape[0]), dtype=jnp.float32,
                       calibrate=True)
    _, mut = model.apply({"params": qp}, jnp.asarray(x), mutable=["calib"])
    return jax.device_get(mut["calib"])


def _dense_err(filled, x, ref):
    y = W8A8DenseS(int(filled["kernel_scale"].shape[0]),
                   dtype=jnp.float32).apply({"params": filled}, jnp.asarray(x))
    y = np.asarray(y)
    return float(np.abs(y - ref).mean() / (np.abs(ref).mean() + 1e-9))


def _dense_setup(outliers: bool):
    rng = np.random.default_rng(0)
    in_dim, out_dim, n = 64, 48, 256
    x = rng.standard_normal((n, in_dim)).astype(np.float32)
    w = (rng.standard_normal((in_dim, out_dim)) * 0.05).astype(np.float32)
    if outliers:
        # the trained-transformer shape: a few channels run 80x hot AND the
        # downstream weight rows compensate (so the fp output is O(1) — the
        # damage per-tensor int8 does is to the 61 NORMAL channels, whose
        # codes collapse to ~1/80th of the range)
        x[:, OUT_CH] *= 80.0
        w[OUT_CH, :] /= 80.0
    b = (rng.standard_normal((out_dim,)) * 0.01).astype(np.float32)
    ref = x @ w + b
    qp = quantize_tower_params({"fc1": {"kernel": w, "bias": b}}, "w8a8s")["fc1"]
    return jax.tree.map(jnp.asarray, qp), x, ref, {"kernel": w}


def test_outlier_channels_break_plain_per_tensor_and_fold_fixes_them():
    qp, x, ref, fp = _dense_setup(outliers=True)
    calib = _calibrate_dense(qp, x)

    # (a) failing-by-construction: plain per-tensor static int8 (fold gated
    # off) crushes the 61 normal channels to ~1/80th of the code range
    plain = fill_act_scales(qp, calib, outlier_ratio=float("inf"))
    err_plain = _dense_err(plain, x, ref)
    assert err_plain > 0.15, f"outlier injection no longer breaks plain " \
                             f"per-tensor int8 (err={err_plain}) — the test " \
                             f"lost its teeth"

    # (b) the production fill (fp kernels retained for the refit,
    # api.py:prune_fp_kernels): near-fp again
    smoothed = fill_act_scales(qp, calib, fp_params=fp)
    assert float(np.max(np.asarray(smoothed["act_smooth"]))) > 1.0  # engaged
    err_smooth = _dense_err(smoothed, x, ref)
    assert err_smooth < 0.03, (err_plain, err_smooth)
    assert err_smooth < err_plain / 10

    # (c) refit WITHOUT fp kernels (bench's random-param path): the int8
    # codes can't recover the crushed compensating rows, but the fold still
    # beats plain per-tensor decisively
    refit8 = fill_act_scales(qp, calib)
    err_refit8 = _dense_err(refit8, x, ref)
    assert err_refit8 < err_plain / 3, (err_plain, err_refit8)


def test_no_outliers_fold_is_bitexact_noop():
    """Well-behaved activations: the outlier gate keeps every code and scale
    bit-identical to the plain per-tensor fill (no silent numerics drift for
    models that never needed smoothing)."""
    qp, x, _, fp = _dense_setup(outliers=False)
    calib = _calibrate_dense(qp, x)
    plain = fill_act_scales(qp, calib, outlier_ratio=float("inf"))
    default = fill_act_scales(qp, calib, fp_params=fp)
    assert np.array_equal(np.asarray(default["kernel_q"]), np.asarray(plain["kernel_q"]))
    np.testing.assert_array_equal(np.asarray(default["kernel_scale"]),
                                  np.asarray(plain["kernel_scale"]))
    np.testing.assert_array_equal(np.asarray(default["act_smooth"]),
                                  np.ones_like(np.asarray(default["act_smooth"])))
    np.testing.assert_allclose(np.asarray(default["act_scale"]),
                               np.asarray(plain["act_scale"]), rtol=1e-6)


def test_tower_outlier_channels_through_shared_qkv_site():
    """Tower-level graceful degradation: outlier channels injected via the
    pre-attention layernorm gains (so the SHARED q/k/v ActQuant site and the
    mlp sites both see a heavy-tailed input) — the smoothed static tower must
    track the fp tower where the plain per-tensor fill visibly degrades."""
    import dataclasses

    cfg = hcfg.SiglipVisionConfig(hidden_size=64, intermediate_size=128,
                                  num_hidden_layers=3, num_attention_heads=4,
                                  image_size=56, patch_size=14)
    rng = np.random.default_rng(5)
    px = jnp.asarray(rng.standard_normal((2, 3, 56, 56)).astype(np.float32))
    fp = SiglipVisionTower(config=cfg, dtype=jnp.float32)
    params = jax.device_get(fp.init(jax.random.PRNGKey(0), px)["params"])
    # inject: hot layernorm gains make a few channels of every quantized
    # site's input 60x the rest, and the consuming kernel rows compensate so
    # fp outputs stay O(1) (the trained-transformer outlier shape — hot
    # activations paired with tiny downstream weights)
    for layer in params["encoder"].values():
        for ln in ("layer_norm1", "layer_norm2"):
            s = np.array(layer[ln]["scale"])
            s[OUT_CH] *= 60.0
            layer[ln]["scale"] = s
        sa, mlp = layer["self_attn"], layer["mlp"]
        for proj in ("q_proj", "k_proj", "v_proj"):
            k = np.array(sa[proj]["kernel"])
            k[OUT_CH, :] /= 60.0
            sa[proj]["kernel"] = k
        k = np.array(mlp["fc1"]["kernel"])
        k[OUT_CH, :] /= 60.0
        mlp["fc1"]["kernel"] = k
    f_fp, _ = fp.apply({"params": params}, px)

    qparams = jax.tree.map(jnp.asarray, quantize_tower_params(params, mode="w8a8s_mlp_qkv"))
    ccfg = dataclasses.replace(cfg, quantization="w8a8s_mlp_qkv+calib")
    _, mut = SiglipVisionTower(config=ccfg, dtype=jnp.float32).apply(
        {"params": qparams}, px, mutable=["calib"])
    calib = jax.device_get(mut["calib"])

    scfg = dataclasses.replace(cfg, quantization="w8a8s_mlp_qkv")
    st = SiglipVisionTower(config=scfg, dtype=jnp.float32)

    def rel_cos(filled):
        f, _ = st.apply({"params": filled}, px)
        a, b = np.asarray(f_fp).ravel(), np.asarray(f).ravel()
        cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        rel = float(np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9))
        return rel, cos

    err_plain, cos_plain = rel_cos(fill_act_scales(qparams, calib,
                                                   outlier_ratio=float("inf")))
    # the production fill: api.py keeps a pruned fp16 kernel copy alive for
    # the refit (prune_fp_kernels) — without it the fold can't recover weight
    # rows the original int8 conversion already crushed
    fp_tree = jax.tree.map(jnp.asarray, prune_fp_kernels(params, "w8a8s_mlp_qkv"))
    smoothed = fill_act_scales(qparams, calib, fp_params=fp_tree)
    # the shared qkv site engaged its fold
    sm = np.asarray(smoothed["encoder"]["layers_0"]["self_attn"]["qkv_quant"]["act_smooth"])
    assert sm.max() > 1.0
    err_smooth, cos_smooth = rel_cos(smoothed)
    assert err_plain > 0.15 and cos_plain < 0.99, (err_plain, cos_plain)
    assert err_smooth < err_plain / 10, (err_plain, err_smooth)
    assert cos_smooth > 0.999 and err_smooth < 0.03, (err_smooth, cos_smooth,
                                                      err_plain, cos_plain)
    # the no-fp refit (bench's random-param path) still degrades gracefully
    err_nofp, cos_nofp = rel_cos(fill_act_scales(qparams, calib))
    assert err_nofp < err_plain / 3 and cos_nofp > 0.99, (err_nofp, cos_nofp)
