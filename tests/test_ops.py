"""Golden-value tests for numerics-critical ops vs torch / the reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from hicom_tpu.ops import get_3d_sincos_pos_embed, interpolate_linear, max_pool2d, sdpa
from hicom_tpu.ops.resize import resize_thw

torch = pytest.importorskip("torch")


@pytest.mark.parametrize(
    "in_shape,out_thw",
    [
        ((8, 27, 27, 16), (2, 9, 9)),
        ((32, 27, 27, 8), (8, 9, 9)),
        ((1, 27, 27, 8), (1, 9, 9)),
        ((7, 13, 11, 8), (2, 5, 4)),  # non-divisible
        ((3, 5, 5, 8), (5, 7, 9)),  # upsample
    ],
)
def test_trilinear_matches_torch(in_shape, out_thw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(in_shape).astype(np.float32)
    # torch: (1, d, t, h, w)
    xt = torch.from_numpy(x).permute(3, 0, 1, 2).unsqueeze(0)
    ref = torch.nn.functional.interpolate(xt, size=out_thw, mode="trilinear")
    ref = ref.squeeze(0).permute(1, 2, 3, 0).numpy()
    got = np.asarray(resize_thw(jnp.asarray(x), out_thw))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_bilinear_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 54, 54)).astype(np.float32)
    ref = torch.nn.functional.interpolate(torch.from_numpy(x), (20, 33), mode="bilinear").numpy()
    got = np.asarray(interpolate_linear(jnp.asarray(x), (2, 3), (20, 33)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_max_pool2d_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((9, 7, 6)).astype(np.float32)  # odd dims: remainder dropped
    ref = torch.nn.functional.max_pool2d(torch.from_numpy(x).permute(2, 0, 1), 2)
    ref = ref.permute(1, 2, 0).numpy()
    got = np.asarray(max_pool2d(jnp.asarray(x), 2))
    np.testing.assert_allclose(got, ref)


def test_3d_pos_embed_matches_reference():
    import sys

    sys.path.insert(0, "tests")
    from reference_loader import load_reference_projector

    ref_projector = load_reference_projector()
    ref = ref_projector.get_3d_position_embedding(6, 5, 4, 32)
    got = get_3d_sincos_pos_embed(6, 5, 4, 32)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_sdpa_matches_torch():
    rng = np.random.default_rng(3)
    q = rng.standard_normal((2, 4, 5, 16)).astype(np.float32)
    k = rng.standard_normal((2, 4, 9, 16)).astype(np.float32)
    v = rng.standard_normal((2, 4, 9, 16)).astype(np.float32)
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    got = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_sdpa_causal():
    rng = np.random.default_rng(4)
    q = rng.standard_normal((1, 2, 6, 8)).astype(np.float32)
    k = rng.standard_normal((1, 2, 6, 8)).astype(np.float32)
    v = rng.standard_normal((1, 2, 6, 8)).astype(np.float32)
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), is_causal=True
    ).numpy()
    got = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), is_causal=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_projector_dsl():
    from hicom_tpu.config import parse_projector_type

    spec = parse_projector_type("local43_global32")
    assert spec.kind == "hicom"
    assert spec.local.temporal_kernel_size == 4 and spec.local.spatial_kernel_size == 3
    assert spec.global_.num_queries == 32
    assert not spec.local.adapt_q

    spec = parse_projector_type("local43_adaptkv_global32")
    assert spec.local.adapt_k and spec.local.adapt_v and not spec.local.adapt_q

    spec = parse_projector_type("local412_adaptqg_global64adaptg")
    assert spec.local.temporal_kernel_size == 4 and spec.local.spatial_kernel_size == 12
    assert spec.local.adapt_q and spec.local.adapt_guide
    assert spec.global_.num_queries == 64 and spec.global_.adapt_guide

    spec = parse_projector_type("local43guidecoarse_global32guidedirect")
    assert spec.local.force_use_guide == "coarse"
    assert spec.global_.force_use_guide == "direct"

    spec = parse_projector_type("mlp2x_gelu")
    assert spec.kind == "mlp" and spec.mlp_depth == 2

    assert parse_projector_type("linear").kind == "linear"

    spec = parse_projector_type("global32")
    assert spec.local is None and spec.global_.num_queries == 32
