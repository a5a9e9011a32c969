"""The closed accuracy loop: train → export → model_init → Video-MME → score.

One test proving the full artifact chain end to end at tiny scale (VERDICT
round-1 item 2): the 2-stage recipe on synthetic data produces a checkpoint
that, reloaded from its HF-layout export, answers the mini Video-MME's
constant-"B" questions well above the 25% MCQA chance floor.
"""

import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")
pytest.importorskip("cv2")


def test_closed_accuracy_loop(tmp_path):
    from hicom_tpu.selftest import run

    out = run(str(tmp_path / "loop"), epochs=12)
    assert out["n_questions"] >= 4
    # the SFT data teaches a constant answer; a working train→export→reload→
    # eval chain must beat chance decisively (a broken link scores ~25% or 0)
    assert out["videomme_accuracy"] >= 75.0, out
    import os

    assert os.path.exists(out["artifacts"]["mm_projector_bin"])
    assert os.path.isdir(out["artifacts"]["hf_export"])
    assert os.path.exists(out["artifacts"]["answer_file"])
