"""The closed accuracy loop: train → export → model_init → Video-MME → score.

One test proving the full artifact chain end to end at tiny scale (VERDICT
round-1 item 2): the 2-stage recipe on synthetic data produces a checkpoint
that, reloaded from its HF-layout export, answers the mini Video-MME's
constant-"B" questions well above the 25% MCQA chance floor.

The same trained export is then re-scored under EVERY serving quantization
mode (VERDICT round-2 item 1): int8 weight-only, NF4, dynamic/static w8a8
towers, w8a8 decoder, and the bench.py headline combination — each must match
the fp score exactly and agree with fp greedy decoding at the token level.
"""

import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")
pytest.importorskip("cv2")


def test_closed_accuracy_loop_with_quant_parity(tmp_path):
    import os

    from hicom_tpu.selftest import run

    out = run(str(tmp_path / "loop"), epochs=12, quant_modes=True,
              outlier_sweep=True)
    assert out["n_questions"] >= 4
    # the SFT data teaches a constant answer; a working train→export→reload→
    # eval chain must beat chance decisively (a broken link scores ~25% or 0)
    assert out["videomme_accuracy"] >= 75.0, out
    assert os.path.exists(out["artifacts"]["mm_projector_bin"])
    assert os.path.isdir(out["artifacts"]["hf_export"])
    assert os.path.exists(out["artifacts"]["answer_file"])

    # quant parity (VERDICT r2 next-1): every serving numerics mode — incl.
    # the bench headline (w8a8s_mlp_qkv tower + w8a8 decoder) — must score
    # the same mini Video-MME accuracy as fp on this trained model, and its
    # greedy decode must agree with fp at the token level
    sweep = out["quant_sweep"]
    fp_acc = sweep["fp"]["videomme_accuracy"]
    assert fp_acc >= 75.0, sweep
    # Thresholds raised per VERDICT r3 next-5b: the full sweep (distinct
    # seed-777 calibration clip, epochs=20) MEASURES token_agreement = 1.0
    # for every mode (recorded 2026-08-20, TODO.md r4 log). 0.97/0.99 leaves
    # headroom for benign cross-platform rounding only — the old 0.8/0.9
    # would have passed a 20% greedy-token disagreement.
    for mode, r in sweep.items():
        assert r["videomme_accuracy"] == fp_acc, (mode, sweep)
        assert r["token_agreement"] >= 0.97, (mode, sweep)
    assert sweep["serving_default"]["token_agreement"] >= 0.99, sweep
    # the r5 static-decoder candidate must meet the serving bar too
    assert sweep["serving_w8a8s_dec"]["token_agreement"] >= 0.99, sweep

    # SmoothQuant fold END-TO-END on trained weights (VERDICT r4 next-7):
    # with compensated outlier channels injected into the export, the fold
    # must ENGAGE at calibration (act_smooth_max > 1 at >= 1 site) and the
    # static serving modes must still meet the agreement bar vs the injected
    # model's own fp numerics.
    osweep = out["outlier_sweep"]
    assert osweep["serving_default"]["act_smooth_max"] is not None
    assert osweep["serving_default"]["act_smooth_max"] > 1.0, osweep
    assert osweep["serving_w8a8s_dec"]["act_smooth_max"] > 1.0, osweep
    for mode in ("serving_default", "serving_w8a8s_dec"):
        assert osweep[mode]["videomme_accuracy"] == osweep["fp"]["videomme_accuracy"], osweep
        assert osweep[mode]["token_agreement"] >= 0.99, osweep
