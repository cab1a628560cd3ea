"""Offline densecap METEOR-threshold calibration (VERDICT r3 item 8).

The absolute densecap grid thresholds [.15-.75] are calibrated to the full
wordnet METEOR scorer; the offline backend scores lower.  calibration.py
fits the shortfall on the delta corpus against its synonym ORACLE and the
benchmark emits BOTH the raw and the backend-calibrated grid.
"""

import numpy as np

from scan2cap_tpu.eval.benchmark import (evaluate_dense_captioning,
                                         organize_gt, organize_prediction,
                                         SENTENCE_METEOR_BACKEND)
from scan2cap_tpu.eval.capeval.calibration import (
    calibrate_threshold, calibrated_meteor_thresholds, fit_meteor_shortfall)
from scan2cap_tpu.eval.capeval.delta_corpus import (make_pairs,
                                                    oracle_synonym_ids)
from scan2cap_tpu.eval.capeval.meteor import single_meteor_score

from test_benchmark import _fixture


def test_oracle_stage_superset_of_domsyn():
    """The oracle recognizes every substitution the generator can make —
    including the near-synonyms the curated table deliberately REJECTS
    (table/desk), so oracle scores bound domsyn scores from above."""
    ref = "sos the table next to the wall eos"
    hyp = "sos the desk next to the wall eos"
    s_dom = single_meteor_score(ref, hyp, syn_stage="domsyn")
    s_orc = single_meteor_score(ref, hyp, syn_stage=oracle_synonym_ids)
    assert s_orc > s_dom  # desk<->table only the oracle matches

    for r, h in make_pairs(100, seed=3):
        assert single_meteor_score(r, h, syn_stage=oracle_synonym_ids) >= \
            single_meteor_score(r, h, syn_stage="domsyn") - 1e-12


def test_shortfall_fit_and_threshold_mapping():
    fit = fit_meteor_shortfall(n_pairs=200, seed=1)
    assert np.isfinite([fit["a"], fit["b"]]).all()
    assert fit["shortfall_mean"] >= 0
    ths, fit2 = calibrated_meteor_thresholds(n_pairs=200, seed=1)
    assert len(ths) == 5
    for t_cal, t_ref in zip(ths, (.15, .3, .45, .6, .75)):
        # offline backend never over-scores: calibration only LOWERS
        assert 0 < t_cal <= t_ref
    # monotone: higher reference threshold -> higher calibrated threshold
    assert list(ths) == sorted(ths)
    # solving t' + shortfall(t') = t round-trips
    t = 0.45
    tp = calibrate_threshold(t, fit2)
    assert abs(tp + (fit2["a"] + fit2["b"] * tp) - t) < 1e-9


def test_densecap_emits_both_grids():
    pred, gt = _fixture()
    out = evaluate_dense_captioning(organize_prediction(pred),
                                    organize_gt(gt))
    assert out["meteor_backend"] == SENTENCE_METEOR_BACKEND
    if SENTENCE_METEOR_BACKEND == "nltk-wordnet":  # full backend: raw only
        assert "calibrated" not in out
        return
    cal = out["calibrated"]
    assert set(cal) >= {"AP", "mAP", "meteor_thresholds",
                        "reference_thresholds", "fit", "note"}
    # lower gates can only admit more matches
    assert cal["mAP"] >= out["mAP"] - 1e-9
    for t_cal, t_ref in zip(cal["meteor_thresholds"],
                            cal["reference_thresholds"]):
        assert 0 < t_cal <= t_ref
    # the grid is keyed by the CALIBRATED thresholds
    for iou_row in cal["AP"].values():
        assert set(iou_row) == set(cal["meteor_thresholds"])
