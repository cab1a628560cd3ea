"""Benchmark toolbox tests: Hungarian assignment, P/R/F1 captioning,
dense-cap AP grid — on constructed scenes with known outcomes."""

import numpy as np

from scan2cap_tpu.eval.benchmark import (
    organize_prediction, organize_gt, assign_pred_to_gt, evaluate_captioning,
    evaluate_dense_captioning, evaluate_detection, _giou_aabb_np,
)


def _corners(lo, hi):
    lo, hi = np.asarray(lo, float), np.asarray(hi, float)
    size, center = hi - lo, (hi + lo) / 2
    sx = np.array([1, 1, -1, -1, 1, 1, -1, -1]) * size[0] / 2
    sy = np.array([1, -1, -1, 1, 1, -1, -1, 1]) * size[1] / 2
    sz = np.array([1, 1, 1, 1, -1, -1, -1, -1]) * size[2] / 2
    return np.stack([sx, sy, sz], 1) + center


def _fixture():
    gt_box0 = _corners([0, 0, 0], [1, 1, 1])
    gt_box1 = _corners([3, 3, 0], [4, 4, 1])
    pred = {"scene0000_00": [
        {"caption": "sos a red chair eos", "box": gt_box0.tolist(),
         "sem_prob": np.eye(18)[2].tolist(), "obj_prob": [0.1, 0.9]},
        {"caption": "sos a wooden table eos", "box": gt_box1.tolist(),
         "sem_prob": np.eye(18)[4].tolist(), "obj_prob": [0.2, 0.8]},
    ]}
    gt = {"scene0000_00": {
        "0": [{"token": ["a", "red", "chair"], "object_name": "chair",
               "bbox": gt_box0.tolist(), "sem_id": 2}],
        "1": [{"token": ["a", "wooden", "table"], "object_name": "table",
               "bbox": gt_box1.tolist(), "sem_id": 4}],
    }}
    return pred, gt


def test_giou_aabb():
    a = _corners([0, 0, 0], [1, 1, 1])[None]
    g = _giou_aabb_np(a, a)
    assert abs(g[0, 0] - 1.0) < 1e-6
    b = _corners([2, 0, 0], [3, 1, 1])[None]
    g2 = _giou_aabb_np(a, b)
    assert g2[0, 0] < 0  # disjoint -> negative gIoU


def test_assignment_perfect():
    pred, gt = _fixture()
    preds = organize_prediction(pred)
    gts = organize_gt(gt)
    cands, n_preds, n_gts = assign_pred_to_gt(preds, gts)
    assert n_preds == 2 and n_gts == 2
    assert abs(cands["scene0000_00|0"]["iou"] - 1.0) < 1e-6
    assert cands["scene0000_00|0"]["caption"] == "sos a red chair eos"
    assert cands["scene0000_00|1"]["caption"] == "sos a wooden table eos"


def test_captioning_scores_perfect_predictions():
    pred, gt = _fixture()
    results = evaluate_captioning(
        organize_prediction(pred), organize_gt(gt))
    for min_iou in (0, 0.25, 0.5):
        r = results[min_iou]
        assert abs(r["f1-score"]["cider"] - 10.0) < 1e-5  # identical captions
        assert abs(r["f1-score"]["rouge"] - 1.0) < 1e-6
        assert r["precision"]["bleu"][3] > 0.99


def test_captioning_iou_gate():
    pred, gt = _fixture()
    # shift one prediction so its IoU ~ 0.14 < 0.25
    shifted = np.asarray(pred["scene0000_00"][1]["box"]) + 0.5
    pred["scene0000_00"][1]["box"] = shifted.tolist()
    results = evaluate_captioning(organize_prediction(pred), organize_gt(gt))
    # at IoU 0 both count; at 0.25 only one counts
    assert results[0.25]["recall"]["rouge"] < results[0]["recall"]["rouge"]


def test_detection_map():
    pred, gt = _fixture()
    out = evaluate_detection(organize_prediction(pred), organize_gt(gt))
    assert abs(out[0.25]["mAP"] - 1.0) < 1e-6
    assert abs(out[0.5]["mAP"] - 1.0) < 1e-6


def test_densecap_map_perfect():
    pred, gt = _fixture()
    out = evaluate_dense_captioning(organize_prediction(pred), organize_gt(gt))
    assert abs(out["mAP"] - 1.0) < 1e-6
    # worse captions lower the mAP at high METEOR thresholds
    pred["scene0000_00"][0]["caption"] = "sos something else entirely eos"
    out2 = evaluate_dense_captioning(organize_prediction(pred), organize_gt(gt))
    assert out2["mAP"] < out["mAP"]


def test_densecap_cache_reuse_identical():
    # the per-detection (ious, meteors) cache is threshold-independent; a
    # second calculator over the same maps (the calibrated grid) reuses the
    # first one's cache and must produce bit-identical APs
    from scan2cap_tpu.eval.benchmark import DenseCapAPCalculator

    pred, gt = _fixture()
    pred["scene0000_00"][0]["caption"] = "sos a slightly off caption eos"
    calc = DenseCapAPCalculator()
    p, g = organize_prediction(pred), organize_gt(gt)
    for scene_id in g:
        preds = p[scene_id]
        gt_list = [(g[scene_id]["boxes"][j], g[scene_id]["captions"][j])
                   for j in range(len(g[scene_id]["boxes"]))]
        obj_prob = preds["obj_prob"][:, 1]
        pred_list = [(preds["boxes"][j], float(obj_prob[j]),
                      preds["captions"][j])
                     for j in range(len(preds["boxes"]))]
        calc.step([pred_list], [gt_list])
    fresh = calc.compute_metrics()
    calc2 = DenseCapAPCalculator(meteor_thresholds=(.1, .2, .3, .4, .5))
    calc2.pred_map, calc2.gt_map = calc.pred_map, calc.gt_map
    calc2.scan_cnt = calc.scan_cnt
    reused = calc2.compute_metrics(cache=calc.cache)
    refetched = DenseCapAPCalculator(meteor_thresholds=(.1, .2, .3, .4, .5))
    refetched.pred_map, refetched.gt_map = calc.pred_map, calc.gt_map
    refetched.scan_cnt = calc.scan_cnt
    want = refetched.compute_metrics()
    assert reused == want


def test_assignment_rotated_matches_aabb_on_axis_aligned():
    # axis-aligned fixture boxes: the rotated polygon-clip assignment must
    # select the same candidates as the AABB path
    pred, gt = _fixture()
    preds = organize_prediction(pred)
    gts = organize_gt(gt)
    cands, n_preds, n_gts = assign_pred_to_gt(preds, gts, rotated_boxes=True)
    assert n_preds == 2 and n_gts == 2
    assert abs(cands["scene0000_00|0"]["iou"] - 1.0) < 1e-6
    assert cands["scene0000_00|0"]["caption"] == "sos a red chair eos"
    assert cands["scene0000_00|1"]["caption"] == "sos a wooden table eos"
