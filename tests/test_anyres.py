"""Anyres image feature merging tests (vs reference mm_utils + torch ops)."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")
from reference_loader import load_reference

torch = pytest.importorskip("torch")


def test_unpad_bounds_matches_reference():
    load_reference()
    from hicom.mm_utils import unpad_image as ref_unpad

    from hicom_tpu.models.anyres import unpad_bounds

    rng = np.random.default_rng(0)
    for (gh, gw), osize in [((8, 8), (100, 50)), ((8, 8), (50, 100)), ((12, 8), (300, 300)), ((4, 12), (640, 480))]:
        x = rng.standard_normal((5, gh, gw)).astype(np.float32)  # (C, H, W)
        ref = ref_unpad(torch.from_numpy(x), osize).numpy()
        hs, ws = unpad_bounds((gh, gw), osize)
        got = x[:, hs, ws]
        np.testing.assert_allclose(got, ref)


def test_grid_shape_matches_reference():
    load_reference()
    import re as _re

    import hicom.mm_utils as ref_mm

    # The reference forgot `import re` in mm_utils (its anyres range-syntax
    # path raises NameError and hicom_arch falls back to a 2x2 grid). Inject
    # it to compare against the INTENDED behavior, which we implement.
    ref_mm.re = _re
    ref_shape = ref_mm.get_anyres_image_grid_shape

    from hicom_tpu.data.image import get_anyres_image_grid_shape

    pin = "(1x1),...,(6x6)"
    for size in [(800, 600), (333, 1000), (64, 64), (2000, 100)]:
        assert get_anyres_image_grid_shape(size, pin, 384) == ref_shape(size, pin, 384)


@pytest.mark.parametrize("merge", ["spatial_unpad", "spatial_maxpool2x2", "spatial"])
def test_anyres_merge_modes(merge):
    """Merged grid matches a direct torch reconstruction of the reference ops."""
    from hicom_tpu.models.anyres import process_anyres_image_feature

    rng = np.random.default_rng(1)
    hw, d = 4, 6
    nh, nw = 2, 3
    image_size = (3 * 384, 2 * 384)  # (w, h) → grid 3x2 at pinpoints
    feats = rng.standard_normal((1 + nh * nw, hw, hw, d)).astype(np.float32)
    cfg = types.SimpleNamespace(
        mm_patch_merge_type=merge,
        image_aspect_ratio="anyres",
        image_grid_pinpoints="(1x1),...,(6x6)",
    )
    out = process_anyres_image_feature(jnp.asarray(feats), image_size, cfg, 384)
    assert out["base"].shape == (hw, hw, d)
    patch = np.asarray(out["patch"])

    # torch reconstruction
    grid = torch.from_numpy(feats[1:]).reshape(nh, nw, hw, hw, d)
    stitched = grid.permute(4, 0, 2, 1, 3).reshape(d, nh * hw, nw * hw)
    if merge == "spatial_maxpool2x2":
        ref = torch.nn.functional.max_pool2d(stitched, 2).permute(1, 2, 0).numpy()
    elif merge == "spatial_unpad":
        from hicom.mm_utils import unpad_image

        ref = unpad_image(stitched, image_size).permute(1, 2, 0).numpy()
    else:
        ref = stitched.permute(1, 2, 0).numpy()
    np.testing.assert_allclose(patch, ref, rtol=1e-6, atol=1e-6)


def test_anyres_max_downscale():
    from hicom_tpu.models.anyres import process_anyres_image_feature

    rng = np.random.default_rng(2)
    hw, d = 8, 4
    nh = nw = 3
    feats = rng.standard_normal((1 + nh * nw, hw, hw, d)).astype(np.float32)
    cfg = types.SimpleNamespace(
        mm_patch_merge_type="spatial_unpad",
        image_aspect_ratio="anyres_max_4",  # 3x3 grid exceeds 4 units → downscale
        image_grid_pinpoints="(1x1),...,(6x6)",
    )
    out = process_anyres_image_feature(jnp.asarray(feats), (3 * 384, 3 * 384), cfg, 384)
    h, w = out["patch"].shape[:2]
    assert h * w <= 4 * hw * hw * 1.3  # within the 1.1x tolerance band


def test_end_to_end_anyres_mm_infer(tmp_path):
    """Tiny HICom with anyres config: encode_anyres + generate from visual embeds."""
    from hicom_tpu.api import HICom
    from hicom_tpu.config import tiny_test_config
    from hicom_tpu.models.hicom import HIComModel

    cfg = tiny_test_config(
        image_aspect_ratio="anyres_max_4",
        mm_patch_merge_type="spatial_unpad",
        image_grid_pinpoints="(1x1),...,(3x3)",
        mm_newline_position="one_token",
    )
    model = HIComModel(config=cfg)
    rng = np.random.default_rng(0)
    img = cfg.vision_config.image_size
    crops = rng.standard_normal((5, 3, img, img)).astype(np.float32)  # base + 2x2 grid
    ids = rng.integers(5, cfg.text_config.vocab_size, (1, 8))
    ids[0, 1] = -200  # image sentinel
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(crops[None, :1]), modal="image")
    runtime = HICom(config=cfg, model=model, params=variables["params"],
                    eos_token_id=cfg.text_config.eos_token_id, cache_len=128)

    visual = runtime.encode_anyres(crops, (2 * img, 2 * img))
    assert visual.ndim == 2 and visual.shape[1] == cfg.text_config.hidden_size
    out = runtime.generate(ids, visual_embeds=visual[None], modal="image", max_new_tokens=4)
    assert out.shape == (1, 4)
