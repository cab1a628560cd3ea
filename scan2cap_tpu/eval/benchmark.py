"""Offline benchmark toolbox — rebuild of /root/reference/benchmark/.

File formats are kept compatible with the reference:
  * ``pred.json`` (benchmark/predict.py:207-233): {scene_id: [{"caption":
    "sos ... eos", "box": (8,3) list, "sem_prob": (18,), "obj_prob": (2,)}]}
  * GT: {scene_id: {"captions": [[...]], "boxes": (M,8,3), "object_ids": (M,),
    "object_sems": (M,)}} (benchmark/eval.py:100-178 organize_*)

Evaluation (benchmark/eval.py:180-501):
  * Hungarian assignment of predictions to GTs over -gIoU (axis-aligned
    path — ScanNet boxes have heading 0, benchmark/eval.py:186-192);
  * caption metrics at IoU {0, 0.25, 0.5} aggregated as precision
    (/num_preds), recall (/num_gts), F1;
  * detection mAP@0.25/0.5;
  * dense-caption mAP over the (IoU x METEOR) threshold grid
    [.1-.5] x [.15-.75] (benchmark/eval.py:380-421, densecap_helper.py).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment

from scan2cap_tpu.eval.capeval import Bleu, Cider, Meteor, Rouge
from scan2cap_tpu.eval.capeval.meteor import (
    single_meteor_score as _builtin_meteor)


def _pick_sentence_meteor():
    """The reference's dense-caption path scores with
    nltk.translate.meteor_score (benchmark/eval_densecap.py:26), whose
    synonym stage needs the wordnet corpus.  Use it when the data is
    installed (exact reference parity for the absolute .15-.75 thresholds);
    otherwise the built-in exact+stem scorer (scores run slightly lower —
    see capeval/meteor.py)."""
    try:
        from nltk.translate.meteor_score import single_meteor_score as nm
        nm("a b".split(), "a c".split())        # probes the wordnet lookup
        return (lambda ref, hyp: nm(ref.split(), hyp.split())), "nltk-wordnet"
    except Exception:
        from scan2cap_tpu.eval.capeval.meteor import METEOR_BACKEND
        return _builtin_meteor, METEOR_BACKEND


# Which sentence-METEOR scorer dense captioning uses is part of the result:
# the absolute .15-.75 grid thresholds are calibrated to the full (wordnet)
# scorer, so runs from different environments are only comparable when the
# backend matches.  It is recorded in every densecap results dict.
single_meteor_score, SENTENCE_METEOR_BACKEND = _pick_sentence_meteor()
from scan2cap_tpu.eval.ap_helper import (
    APCalculator, voc_ap, _aabb_iou_1_to_many)


# ---------------------------------------------------------------------------
# organization (benchmark/eval.py:100-178)
# ---------------------------------------------------------------------------

def organize_prediction(predictions: Dict) -> Dict:
    organized = {}
    for scene_id, data in predictions.items():
        organized[scene_id] = {
            "captions": [p["caption"] for p in data],
            "boxes": np.asarray([p["box"] for p in data], np.float64),
            "sem_prob": np.asarray([p["sem_prob"] for p in data], np.float64),
            "obj_prob": np.asarray([p["obj_prob"] for p in data], np.float64),
        }
    return organized


def _sem_id(object_name: str) -> int:
    from scan2cap_tpu.config import SCANNET_TYPE2CLASS
    return SCANNET_TYPE2CLASS.get(" ".join(object_name.split("_")), 17)


def organize_gt(gt_json) -> Dict:
    """GT json: the scripts/build_benchmark_gt.py output — a LIST of ScanRefer
    entries each carrying a "bbox" (8,3) corner list.  Groups per scene:
    one box per object, all annotations' captions (benchmark/eval.py:100-178).
    A pre-organized {scene: {"boxes": ...}} dict passes through unchanged."""
    if isinstance(gt_json, dict):
        first = next(iter(gt_json.values()), None)
        if isinstance(first, dict) and "boxes" in first:
            return gt_json
        # nested {scene: {object_id: [anns]}} form
        gt_json = [dict(a, scene_id=s, object_id=o)
                   for s, objs in gt_json.items()
                   for o, anns in objs.items() for a in anns]
    by_scene: Dict[str, Dict[str, list]] = {}
    for d in gt_json:
        by_scene.setdefault(d["scene_id"], {}) \
            .setdefault(d["object_id"], []).append(d)
    organized = {}
    for scene_id, objects in by_scene.items():
        boxes, object_ids, object_sems, captions = [], [], [], []
        for object_id, anns in objects.items():
            boxes.append(np.asarray(anns[0]["bbox"], np.float64))
            object_ids.append(int(object_id))
            object_sems.append(anns[0].get(
                "sem_id", _sem_id(anns[0].get("object_name", ""))))
            captions.append(["sos " + " ".join(a["token"]) + " eos"
                             for a in anns])
        organized[scene_id] = {
            "captions": captions,
            "boxes": np.asarray(boxes),
            "object_ids": np.asarray(object_ids),
            "object_sems": np.asarray(object_sems),
        }
    return organized


def prepare_corpus(gts: Dict) -> Dict:
    corpus = {}
    for scene_id, value in gts.items():
        for gt_id, object_id in enumerate(value["object_ids"]):
            corpus[f"{scene_id}|{object_id}"] = value["captions"][gt_id]
    return corpus


# ---------------------------------------------------------------------------
# assignment (benchmark/eval.py:180-290)
# ---------------------------------------------------------------------------

def _giou_aabb_np(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """(N,8,3) x (M,8,3) -> (N,M) generalized IoU on AABB extents
    (benchmark/box_util.py:634-696, rotated_boxes=False)."""
    lo1, hi1 = boxes1.min(1), boxes1.max(1)
    lo2, hi2 = boxes2.min(1), boxes2.max(1)
    lo = np.maximum(lo1[:, None], lo2[None])
    hi = np.minimum(hi1[:, None], hi2[None])
    inter = np.prod(np.maximum(hi - lo, 0.0), -1)
    v1 = np.prod(hi1 - lo1, -1)
    v2 = np.prod(hi2 - lo2, -1)
    union = v1[:, None] + v2[None] - inter
    iou = inter / (union + 1e-8)
    elo = np.minimum(lo1[:, None], lo2[None])
    ehi = np.maximum(hi1[:, None], hi2[None])
    enc = np.prod(np.maximum(ehi - elo, 0.0), -1)
    return iou - (enc - union) / (enc + 1e-8)


def _iou_aabb_pairwise(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """(N,8,3) x (N,8,3) elementwise IoU."""
    lo1, hi1 = boxes1.min(1), boxes1.max(1)
    lo2, hi2 = boxes2.min(1), boxes2.max(1)
    inter = np.prod(np.maximum(np.minimum(hi1, hi2) - np.maximum(lo1, lo2), 0), -1)
    v1 = np.prod(hi1 - lo1, -1)
    v2 = np.prod(hi2 - lo2, -1)
    return inter / (v1 + v2 - inter + 1e-8)


def assign_pred_to_gt(predictions: Dict, gts: Dict,
                      rotated_boxes: bool = False):
    """Hungarian gIoU assignment per scene; per-GT best candidate
    (benchmark/eval.py:239-290).  ``rotated_boxes`` switches the assignment
    cost to the z-rotated polygon-clip gIoU (the reference's
    rotated_boxes=True path; ScanNet boxes are axis-aligned so the default
    matches its evaluation)."""
    if rotated_boxes:
        import jax.numpy as jnp
        from scan2cap_tpu.ops.boxes import generalized_box3d_iou_rotated
    candidates = {}
    total_num_preds, total_num_gts = 0, 0
    for scene_id in gts:
        if scene_id not in predictions:
            continue
        preds = predictions[scene_id]
        gt = gts[scene_id]
        pred_boxes = preds["boxes"]
        gt_boxes = gt["boxes"]
        if len(pred_boxes) == 0 or len(gt_boxes) == 0:
            total_num_gts += len(gt_boxes)
            total_num_preds += len(pred_boxes)
            continue
        total_num_preds += pred_boxes.shape[0]
        total_num_gts += gt_boxes.shape[0]

        if rotated_boxes:
            cost = -np.asarray(generalized_box3d_iou_rotated(
                jnp.asarray(pred_boxes, jnp.float32),
                jnp.asarray(gt_boxes, jnp.float32)))
        else:
            cost = -_giou_aabb_np(pred_boxes, gt_boxes)
        row, col = linear_sum_assignment(cost)
        per_gt_prop = np.zeros(len(gt_boxes), np.int64)
        per_gt_prop[col] = row

        matched = pred_boxes[per_gt_prop]                 # (ngt, 8, 3)
        ious = _iou_aabb_pairwise(matched, gt_boxes)
        for gt_id in range(len(gt_boxes)):
            key = f"{scene_id}|{gt['object_ids'][gt_id]}"
            entry = {
                "caption": preds["captions"][per_gt_prop[gt_id]],
                "iou": float(ious[gt_id]),
                "box": matched[gt_id].tolist(),
                "gt_box": gt_boxes[gt_id].tolist(),
            }
            if key not in candidates or entry["iou"] > candidates[key]["iou"]:
                candidates[key] = entry
    return candidates, total_num_preds, total_num_gts


def filter_candidates(candidates: Dict, min_iou: float):
    masks, new = [], {}
    for key, value in candidates.items():
        masks.append(1 if value["iou"] >= min_iou else 0)
        new[key] = [value["caption"]]
    return np.asarray(masks), new


# ---------------------------------------------------------------------------
# captioning metrics with precision/recall/F1 (benchmark/eval.py:303-378)
# ---------------------------------------------------------------------------

def evaluate_captioning(predictions: Dict, gts: Dict,
                        min_ious: Sequence[float] = (0, 0.25, 0.5),
                        verbose: bool = False,
                        rotated_boxes: bool = False) -> Dict:
    assigned, n_preds, n_gts = assign_pred_to_gt(predictions, gts,
                                                 rotated_boxes)
    corpus = prepare_corpus(gts)

    results = {}
    for min_iou in min_ious:
        _, candidates = filter_candidates(assigned, min_iou)
        for key in corpus:
            if key not in candidates:
                candidates[key] = ["sos eos"]
        sub_corpus = dict(corpus)
        ordered = {k: candidates[k] for k in sub_corpus}
        # per-key mask: 1 iff the assigned prediction clears the IoU gate
        key_mask = np.asarray(
            [1 if (k in assigned and assigned[k]["iou"] >= min_iou) else 0
             for k in ordered])

        bleu = Bleu(4).compute_score(sub_corpus, ordered)
        cider = Cider().compute_score(sub_corpus, ordered)
        rouge = Rouge().compute_score(sub_corpus, ordered)
        meteor = Meteor().compute_score(sub_corpus, ordered)

        res = {"precision": {}, "recall": {}, "f1-score": {}}
        per = {
            "bleu": [np.asarray(bleu[1][k]) for k in range(4)],
            "cider": np.asarray(cider[1]),
            "rouge": np.asarray(rouge[1]),
            "meteor": np.asarray(meteor[1]),
        }
        for name, scores in per.items():
            if name == "bleu":
                p = [float(np.sum(s * key_mask) / max(n_preds, 1)) for s in scores]
                r = [float(np.sum(s * key_mask) / max(n_gts, 1)) for s in scores]
                f = [2 * a * b / (a + b) if (a + b) > 0 else 0.0
                     for a, b in zip(p, r)]
            else:
                p = float(np.sum(scores * key_mask) / max(n_preds, 1))
                r = float(np.sum(scores * key_mask) / max(n_gts, 1))
                f = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
            res["precision"][name] = p
            res["recall"][name] = r
            res["f1-score"][name] = f
        results[min_iou] = res
        if verbose:
            print(f"--- captioning @ IoU {min_iou}: "
                  f"C-F1 {res['f1-score']['cider']:.4f} "
                  f"B4-F1 {res['f1-score']['bleu'][3]:.4f} "
                  f"M-F1 {res['f1-score']['meteor']:.4f} "
                  f"R-F1 {res['f1-score']['rouge']:.4f}")
    return results


# ---------------------------------------------------------------------------
# detection mAP from stored predictions (benchmark/eval.py:423-470)
# ---------------------------------------------------------------------------

def evaluate_detection(predictions: Dict, gts: Dict,
                       verbose: bool = False) -> Dict:
    import jax.numpy as jnp
    from scan2cap_tpu.ops.nms import nms_3d

    calcs = {t: APCalculator(t) for t in (0.25, 0.5)}
    for scene_id in gts:
        if scene_id not in predictions:
            continue
        preds = predictions[scene_id]
        boxes = preds["boxes"]                              # (M, 8, 3)
        gt_list0 = [(int(gts[scene_id]["object_sems"][i]),
                     gts[scene_id]["boxes"][i])
                    for i in range(len(gts[scene_id]["boxes"]))]
        if len(boxes) == 0:        # a scene can survive NMS with no preds
            for c in calcs.values():
                c.step([[]], [gt_list0])
            continue
        obj_prob = preds["obj_prob"][:, 1]
        sem_prob = preds["sem_prob"]
        cls = sem_prob.argmax(-1)
        keep = np.asarray(nms_3d(
            jnp.asarray(boxes[None], jnp.float32),
            jnp.asarray(obj_prob[None], jnp.float32),
            jnp.asarray(cls[None]), 0.25, True))[0]
        cur = []
        for c in range(sem_prob.shape[1]):
            cur += [(c, boxes[j], float(sem_prob[j, c] * obj_prob[j]))
                    for j in range(len(boxes))
                    if keep[j] and obj_prob[j] > 0.05]
        gt_list = [(int(gts[scene_id]["object_sems"][i]),
                    gts[scene_id]["boxes"][i])
                   for i in range(len(gts[scene_id]["boxes"]))]
        for c in calcs.values():
            c.step([cur], [gt_list])
    out = {}
    for t, c in calcs.items():
        m = c.compute_metrics()
        out[t] = m
        if verbose:
            print(f"--- detection mAP@{t}: {m['mAP']:.4f} AR@{t}: {m['AR']:.4f}")
    return out


# ---------------------------------------------------------------------------
# dense-captioning mAP (densecap_helper.py + eval_densecap.py)
# ---------------------------------------------------------------------------

def eval_densecap(pred: Dict, gt: Dict, thresholds=(0.25, 0.25), cache=None):
    """Single (IoU, METEOR) threshold PR/AP (eval_densecap.py:81-205)."""
    class_recs = {}
    npos = 0
    for img_id, items in gt.items():
        class_recs[img_id] = {
            "bbox": np.asarray([v[0] for v in items]),
            "caption": [v[1] for v in items],
            "det": [False] * len(items),
        }
        npos += len(items)
    for img_id in pred:
        if img_id not in class_recs:
            class_recs[img_id] = {"bbox": np.array([]), "caption": [], "det": []}

    image_ids, confidence, BB, CAP = [], [], [], []
    for img_id, dets in pred.items():
        for box, score, caption in dets:
            image_ids.append(img_id)
            confidence.append(score)
            BB.append(box)
            CAP.append(caption)
    if not image_ids:
        return np.zeros(0), np.zeros(0), 0.0, ([], [])
    order = np.argsort(-np.asarray(confidence))
    BB = np.asarray(BB)[order]
    CAP = [CAP[i] for i in order]
    image_ids = [image_ids[i] for i in order]

    iou_cache, meteor_cache = cache if cache is not None else ([], [])
    fill_cache = cache is None

    nd = len(image_ids)
    tp = np.zeros(nd)
    fp = np.zeros(nd)
    for d in range(nd):
        R = class_recs[image_ids[d]]
        gt_boxes = R["bbox"]
        if fill_cache:
            if gt_boxes.size > 0:
                ious = _aabb_iou_1_to_many(BB[d].astype(float),
                                           gt_boxes.astype(float))
                meteors = np.asarray([
                    max(single_meteor_score(ref, CAP[d]) for ref in refs)
                    if refs else 0.0 for refs in R["caption"]])
            else:
                ious, meteors = np.zeros(0), np.zeros(0)
            iou_cache.append(ious)
            meteor_cache.append(meteors)
        ious, meteors = iou_cache[d], meteor_cache[d]

        ovmax, nlpmax, jmax = -np.inf, -np.inf, -1
        for j in range(len(ious)):  # joint argmax (eval_densecap.py:167-171)
            if ious[j] > ovmax and meteors[j] > nlpmax:
                ovmax, nlpmax, jmax = ious[j], meteors[j], j

        if ovmax > thresholds[0] and nlpmax > thresholds[1] \
                and not R["det"][jmax]:
            tp[d] = 1.0
            R["det"][jmax] = True
        else:
            fp[d] = 1.0

    fp = np.cumsum(fp)
    tp = np.cumsum(tp)
    rec = tp / float(npos + 1e-8)
    prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    return rec, prec, voc_ap(rec, prec), (iou_cache, meteor_cache)


class DenseCapAPCalculator:
    """AP over the (IoU x METEOR) grid (densecap_helper.py:92-160)."""

    def __init__(self, iou_thresholds=(.1, .2, .3, .4, .5),
                 meteor_thresholds=(.15, .3, .45, .6, .75)):
        self.thresholds = [(i, m) for i in iou_thresholds
                           for m in meteor_thresholds]
        self.reset()

    def step(self, batch_pred, batch_gt):
        for p, g in zip(batch_pred, batch_gt):
            self.pred_map[self.scan_cnt] = p
            self.gt_map[self.scan_cnt] = g
            self.scan_cnt += 1

    def compute_metrics(self, cache=None) -> Dict:
        # the per-detection (ious, meteors) cache is threshold-INDEPENDENT
        # (sorted by confidence over the same pred/gt maps), so one build
        # serves every grid cell — and, via the ``cache`` arg, a second
        # calculator over the same maps (the calibrated grid), sparing a
        # full re-score of every (prediction, GT) sentence pair
        aps = []
        ap_dict: Dict = {}
        for iou, meteor in self.thresholds:
            _, _, ap, cache = eval_densecap(
                self.pred_map, self.gt_map, (iou, meteor), cache)
            aps.append(ap)
            ap_dict.setdefault(iou, {})[meteor] = ap
        self.cache = cache
        return {"AP": ap_dict, "mAP": float(np.mean(aps))}

    def reset(self):
        self.pred_map = {}
        self.gt_map = {}
        self.scan_cnt = 0
        self.cache = None


def evaluate_dense_captioning(predictions: Dict, gts: Dict,
                              verbose: bool = False) -> Dict:
    calc = DenseCapAPCalculator()
    for scene_id in gts:
        if scene_id not in predictions:
            continue
        preds = predictions[scene_id]
        gt_list = [(gts[scene_id]["boxes"][j], gts[scene_id]["captions"][j])
                   for j in range(len(gts[scene_id]["boxes"]))]
        if len(preds["boxes"]) == 0:
            calc.step([[]], [gt_list])
            continue
        obj_prob = preds["obj_prob"][:, 1]
        pred_list = [(preds["boxes"][j], float(obj_prob[j]),
                      preds["captions"][j]) for j in range(len(preds["boxes"]))]
        calc.step([pred_list], [gt_list])
    results = calc.compute_metrics()
    results["meteor_backend"] = SENTENCE_METEOR_BACKEND
    if verbose:
        print(f"--- dense captioning mAP (raw, reference thresholds): "
              f"{results['mAP']:.4f} "
              f"(sentence-METEOR backend: {SENTENCE_METEOR_BACKEND})")
    # Offline backend: also emit the grid at backend-CALIBRATED METEOR
    # thresholds (VERDICT r3 item 8).  The raw grid under-gates because the
    # offline scorer runs lower than the full-METEOR scale the [.15-.75]
    # thresholds were calibrated to; the calibrated grid lowers each
    # threshold by the shortfall fitted on the delta corpus against its
    # synonym ORACLE (an upper bound), so the reference-equivalent mAP lies
    # BETWEEN the two.  Both are labeled; only backend-matched numbers are
    # directly comparable (capeval/calibration.py).
    if SENTENCE_METEOR_BACKEND != "nltk-wordnet":
        from scan2cap_tpu.eval.capeval.calibration import (
            calibrated_meteor_thresholds)
        cal_ths, fit = calibrated_meteor_thresholds()
        cal_calc = DenseCapAPCalculator(meteor_thresholds=cal_ths)
        cal_calc.pred_map = calc.pred_map
        cal_calc.gt_map = calc.gt_map
        cal_calc.scan_cnt = calc.scan_cnt
        cal = cal_calc.compute_metrics(cache=calc.cache)
        results["calibrated"] = {
            "AP": cal["AP"], "mAP": cal["mAP"],
            "meteor_thresholds": list(cal_ths),
            "reference_thresholds": [.15, .3, .45, .6, .75],
            "fit": fit,
            "note": "thresholds lowered by the offline-backend METEOR "
                    "shortfall fitted on the delta corpus vs its synonym "
                    "oracle; brackets the reference-backend grid from above",
        }
        if verbose:
            print(f"--- dense captioning mAP (backend-calibrated "
                  f"thresholds {list(cal_ths)}): {cal['mAP']:.4f} "
                  f"(shortfall fit a={fit['a']:.4f} b={fit['b']:.4f} "
                  f"on {fit['n_pairs']} pairs)")
    return results


def evaluate(predictions_raw: Dict, gt_json: Dict, verbose: bool = True,
             caption: bool = True, detection: bool = True,
             densecap: bool = True, rotated_boxes: bool = False) -> Dict:
    """Full offline evaluation (benchmark/eval.py:472-501)."""
    predictions = organize_prediction(predictions_raw)
    gts = organize_gt(gt_json)
    out = {}
    if caption:
        out["captioning"] = evaluate_captioning(predictions, gts,
                                                verbose=verbose,
                                                rotated_boxes=rotated_boxes)
    if detection:
        out["detection"] = evaluate_detection(predictions, gts,
                                              verbose=verbose)
    if densecap:
        out["densecap"] = evaluate_dense_captioning(predictions, gts,
                                                    verbose=verbose)
    return out
