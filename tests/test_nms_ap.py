"""NMS parity vs a numpy re-implementation of utils/nms.py greedy loops,
and AP calculator sanity."""

import numpy as np
import jax.numpy as jnp

from scan2cap_tpu.ops.nms import nms_3d
from scan2cap_tpu.eval.ap_helper import (
    APCalculator, eval_det_cls, voc_ap, assemble_pred_map_cls,
)


def _corners(lo, hi):
    lo, hi = np.asarray(lo, float), np.asarray(hi, float)
    c = np.zeros((8, 3))
    sx = np.array([1, 1, -1, -1, 1, 1, -1, -1])
    sy = np.array([1, -1, -1, 1, 1, -1, -1, 1])
    sz = np.array([1, 1, 1, 1, -1, -1, -1, -1])
    size, center = hi - lo, (hi + lo) / 2
    c[:, 0] = center[0] + sx * size[0] / 2
    c[:, 1] = center[1] + sy * size[1] / 2
    c[:, 2] = center[2] + sz * size[2] / 2
    return c


def nms_numpy(corners, scores, classes, thresh, same_cls):
    """Greedy NMS exactly as utils/nms.py:60-151."""
    K = len(scores)
    lo, hi = corners.min(1), corners.max(1)
    area = np.prod(hi - lo, axis=-1)
    I = np.argsort(scores, kind="stable")
    pick = []
    while I.size != 0:
        last = I.size
        i = I[-1]
        pick.append(i)
        ll = np.maximum(lo[i], lo[I[:last - 1]])
        hh = np.minimum(hi[i], hi[I[:last - 1]])
        inter = np.prod(np.maximum(0, hh - ll), axis=-1)
        o = inter / (area[i] + area[I[:last - 1]] - inter + 1e-8)
        if same_cls:
            o = o * (classes[i] == classes[I[:last - 1]])
        I = np.delete(I, np.concatenate(([last - 1], np.where(o > thresh)[0])))
    mask = np.zeros(K, bool)
    mask[pick] = True
    return mask


def test_nms_matches_numpy(rng):
    B, K = 3, 24
    corners = np.zeros((B, K, 8, 3), np.float32)
    classes = rng.randint(0, 4, (B, K))
    scores = rng.rand(B, K).astype(np.float32)
    for b in range(B):
        for k in range(K):
            lo = rng.rand(3) * 4
            corners[b, k] = _corners(lo, lo + 0.5 + rng.rand(3))
    got = np.asarray(nms_3d(jnp.asarray(corners), jnp.asarray(scores),
                            jnp.asarray(classes), 0.25, True))
    for b in range(B):
        want = nms_numpy(corners[b], scores[b], classes[b], 0.25, True)
        np.testing.assert_array_equal(got[b], want)


def test_nms_suppresses_duplicates():
    box = _corners([0, 0, 0], [1, 1, 1])
    corners = np.stack([box, box, _corners([5, 5, 5], [6, 6, 6])])[None]
    scores = np.array([[0.9, 0.8, 0.7]], np.float32)
    classes = np.zeros((1, 3), np.int32)
    keep = np.asarray(nms_3d(jnp.asarray(corners), jnp.asarray(scores),
                             jnp.asarray(classes)))
    np.testing.assert_array_equal(keep[0], [True, False, True])
    # different classes are not suppressed in cls_nms mode
    classes2 = np.array([[0, 1, 0]], np.int32)
    keep2 = np.asarray(nms_3d(jnp.asarray(corners), jnp.asarray(scores),
                              jnp.asarray(classes2)))
    np.testing.assert_array_equal(keep2[0], [True, True, True])


def test_nms_tie_break_matches_reference_order():
    """Exactly tied scores (real case: coincident vote clusters produce
    duplicate proposals): the reference's ascending argsort + pop-from-the-
    end keeps the HIGHER proposal index — ours must too."""
    box = _corners([0, 0, 0], [1, 1, 1])
    corners = np.stack([box, box])[None]
    scores = np.array([[0.5, 0.5]], np.float32)
    classes = np.zeros((1, 2), np.int32)
    keep = np.asarray(nms_3d(jnp.asarray(corners), jnp.asarray(scores),
                             jnp.asarray(classes)))
    np.testing.assert_array_equal(keep[0], [False, True])
    want = nms_numpy(corners[0], scores[0], classes[0], 0.25, True)
    np.testing.assert_array_equal(keep[0], want)


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert abs(voc_ap(rec, prec) - 1.0) < 1e-9


def test_eval_det_cls_simple():
    gt_box = _corners([0, 0, 0], [1, 1, 1])
    far_box = _corners([9, 9, 9], [10, 10, 10])
    pred = {"s1": [(gt_box, 0.9), (far_box, 0.5)]}
    gt = {"s1": [gt_box]}
    rec, prec, ap = eval_det_cls(pred, gt, ovthresh=0.25)
    assert abs(rec[-1] - 1.0) < 1e-6   # the GT is found (npos+1e-8 denom)
    assert abs(ap - 1.0) < 1e-6    # found before the FP at higher conf


def test_ap_calculator_end_to_end():
    gt_box = _corners([0, 0, 0], [1, 1, 1])
    calc = APCalculator(ap_iou_thresh=0.25)
    pred = [[(2, gt_box, 0.95)]]
    gts = [[(2, gt_box)]]
    calc.step(pred, gts)
    metrics = calc.compute_metrics()
    assert abs(metrics["mAP"] - 1.0) < 1e-6
    assert abs(metrics["AR"] - 1.0) < 1e-6
    assert "chair Average Precision" in metrics


def test_assemble_pred_map_cls():
    B, K, C = 1, 3, 18
    corners = np.zeros((B, K, 8, 3))
    parsed = {
        "pred_mask": np.array([[1, 0, 1]]),
        "obj_prob": np.array([[0.9, 0.8, 0.01]]),
        "sem_cls_probs": np.full((B, K, C), 1.0 / C),
        "pred_sem_cls": np.zeros((B, K), int),
    }
    out = assemble_pred_map_cls(corners, parsed, num_class=C)
    # only proposal 0 passes mask∧conf; expanded over 18 classes
    assert len(out[0]) == C
    assert abs(out[0][0][2] - 0.9 / C) < 1e-9


def test_nms_2d_footprint():
    from scan2cap_tpu.ops.nms import nms_2d
    # same x/y footprint, different heights -> 2D NMS suppresses the lower score
    a = _corners([0, 0, 0], [1, 1, 1])
    b = _corners([0, 0, 5], [1, 1, 6])
    c = _corners([3, 3, 0], [4, 4, 1])
    corners = np.stack([a, b, c])[None].astype(np.float32)
    scores = np.array([[0.9, 0.8, 0.7]], np.float32)
    keep = np.asarray(nms_2d(jnp.asarray(corners), jnp.asarray(scores)))
    np.testing.assert_array_equal(keep[0], [True, False, True])


def test_metric_util_precision_recall(rng):
    # utils/metric_util.py semantics: class-agnostic any-match counting,
    # confidence filtering, the reference's own __main__ IoU goldens
    from scan2cap_tpu.utils.metric_util import (
        calc_iou, multi_scene_precision_recall, single_scene_precision_recall)

    assert calc_iou(np.array([0, 0, 0, 1, 1, 1.0]),
                    np.array([0, 0, 0, 2, 2, 2.0])) == 1.0 / 8
    assert calc_iou(np.array([0, 0, 0, 1, 1, 1.0]),
                    np.array([10, 10, 10, 2, 2, 2.0])) == 0.0

    gt = np.array([[0, 0, 0, 1, 1, 1], [5, 5, 5, 1, 1, 1.0]])
    pred = np.array([
        [0, 0, 0, 1, 1, 1, 0.9],      # TP (IoU 1 with gt 0)
        [0.1, 0, 0, 1, 1, 1, 0.8],    # TP (also matches gt 0)
        [9, 9, 9, 1, 1, 1, 0.9],      # FP
        [5, 5, 5, 1, 1, 1, 0.01],     # below conf -> ignored
    ])
    tp, fp, fn = single_scene_precision_recall(gt, pred, 0.5, 0.1)
    assert (tp, fp, fn) == (2, 1, 1)   # gt 1 unmatched

    TP, FP, FN, (prec, rec) = multi_scene_precision_recall(
        gt[None], pred[None], 0.5, 0.1,
        label_mask=np.ones((1, 2)), pred_mask=np.ones((1, 4)))
    assert (TP, FP, FN) == (2, 1, 1)
    assert abs(prec - 2 / 3) < 1e-9 and abs(rec - 2 / 3) < 1e-9


def test_parse_predictions_remove_empty_box():
    """Boxes containing <5 scene points are excluded (POST_DICT
    remove_empty_box=True, lib/ap_helper.py:89-106); without point_clouds
    the filter falls back to all-ones."""
    from scan2cap_tpu.eval.ap_helper import parse_predictions_device

    B, K, N = 1, 3, 64
    # box 0 around origin (all points inside), box 1 far away (empty),
    # box 2 containing exactly 4 points (below the >=5 threshold)
    corners = np.stack([
        _corners([-1, -1, -1], [1, 1, 1]),
        _corners([50, 50, 50], [51, 51, 51]),
        _corners([9.9, 9.9, 9.9], [10.1, 10.1, 10.1]),
    ])[None].astype(np.float32)
    pc = np.random.RandomState(0).uniform(-0.9, 0.9, (B, N, 3)).astype(np.float32)
    pc[0, :4] = 10.0  # 4 points in box 2
    data = {
        "bbox_corner": jnp.asarray(corners),
        "objectness_scores": jnp.asarray(np.tile([[0.0, 5.0]], (B, K, 1)).reshape(B, K, 2).astype(np.float32)),
        "sem_cls_scores": jnp.asarray(np.zeros((B, K, 18), np.float32)),
        "point_clouds": jnp.asarray(pc),
    }
    parsed = parse_predictions_device(data)
    mask = np.asarray(parsed["pred_mask"][0])
    assert mask[0] and not mask[1] and not mask[2]

    # without point_clouds the filter is inert (all candidates survive NMS)
    parsed2 = parse_predictions_device({k: v for k, v in data.items()
                                        if k != "point_clouds"})
    assert np.asarray(parsed2["pred_mask"][0]).all()
