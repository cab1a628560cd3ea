"""In-training caption evaluation — rebuild of lib/eval_helper.py.

Device/host split: one jitted program per batch produces captions (token
ids), the NMS∧objectness mask, per-proposal assigned GT object ids, and the
IoU gate (lib/eval_helper.py:159-275 runs all of this through CPU numpy +
python loops); the host only decodes tokens to strings and fills the
candidates dict.

Semantics preserved:
  * POST processing: 3D class-NMS at IoU 0.25, remove_empty_box (≥5 points
    inside the axis-aligned box — the reference uses a Delaunay hull test on
    axis-aligned corners, same predicate), conf 0.05 (eval_helper.py:179-191);
  * final mask = NMS ∧ objectness-argmax (eval_helper.py:193-199);
  * per-proposal GT assignment from the detection loss (object_assignment),
    caption kept if IoU(pred, assigned GT) > min_iou = 0.5
    (eval_helper.py:201-219);
  * candidates keyed "scene|object_id|object_name"; later proposals for the
    same object overwrite earlier ones; missing keys filled with "sos eos"
    (check_candidates, eval_helper.py:69-79).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scan2cap_tpu.ops.boxes import box3d_iou_batch
from scan2cap_tpu.ops.nms import nms_3d
from scan2cap_tpu.eval.capeval import Bleu, Cider, Meteor, Rouge


def prepare_corpus(raw_data: Sequence[dict], max_len: int = 30) -> Dict:
    """GT corpus {scene|object_id|object_name: ["sos ... eos", ...]}
    (eval_helper.py:33-54)."""
    corpus: Dict[str, List[str]] = {}
    for data in raw_data:
        key = "{}|{}|{}".format(
            data["scene_id"], data["object_id"], data["object_name"])
        description = "sos " + " ".join(data["token"][:max_len]) + " eos"
        corpus.setdefault(key, []).append(description)
    return corpus


def decode_caption(token_ids: np.ndarray, idx2word: Dict) -> str:
    """Token ids -> "sos w1 w2 ... eos" (eval_helper.py:56-67)."""
    decoded = ["sos"]
    for t in np.asarray(token_ids).tolist():
        word = idx2word[str(int(t))]
        decoded.append(word)
        if word == "eos":
            break
    if "eos" not in decoded:
        decoded.append("eos")
    return " ".join(decoded)


def check_candidates(corpus: Dict, candidates: Dict) -> Dict:
    for key in corpus:
        if key not in candidates:
            candidates[key] = ["sos eos"]
    return candidates


def organize_candidates(corpus: Dict, candidates: Dict) -> Dict:
    return {k: candidates[k] for k in corpus}


@functools.partial(jax.jit,
                   static_argnames=("min_iou", "nms_iou", "use_nms"))
def postprocess_scene_cap(out: Dict, batch: Dict, min_iou: float = 0.5,
                          nms_iou: float = 0.25,
                          use_nms: bool = True) -> Dict:
    """Device-side post-processing for caption eval."""
    corners = out["bbox_corner"]                       # (B, K, 8, 3)
    B, K = corners.shape[:2]

    obj_prob = jax.nn.softmax(out["objectness_scores"], axis=-1)[..., 1]
    pred_cls = jnp.argmax(out["sem_cls_scores"], axis=-1)

    # remove_empty_box: ≥5 points inside the AABB (ap_helper.py:95-106)
    pc = batch["point_clouds"][..., :3]                # (B, N, 3)
    lo = jnp.min(corners, axis=2)                      # (B, K, 3)
    hi = jnp.max(corners, axis=2)
    inside = jnp.all(
        (pc[:, None, :, :] >= lo[:, :, None, :])
        & (pc[:, None, :, :] <= hi[:, :, None, :]), axis=-1)   # (B, K, N)
    nonempty = jnp.sum(inside, axis=-1) >= 5

    if use_nms:
        nms_mask = nms_3d(corners, jnp.where(nonempty, obj_prob, -1.0),
                          pred_cls, iou_threshold=nms_iou, same_cls=True)
        nms_mask = nms_mask & nonempty
    else:  # --no_nms (scripts/eval.py:253): objectness/empty filters only
        nms_mask = nonempty
    obj_mask = jnp.argmax(out["objectness_scores"], axis=-1) == 1
    final_mask = nms_mask & obj_mask                   # (B, K)

    assignment = out["object_assignment"].astype(jnp.int32)  # (B, K)
    detected_object_ids = jnp.take_along_axis(
        batch["scene_object_ids"].astype(jnp.int32), assignment, axis=1)
    assigned_corners = jnp.take_along_axis(
        batch["gt_box_corner_label"],
        assignment[:, :, None, None], axis=1)          # (B, K, 8, 3)
    ious = box3d_iou_batch(assigned_corners, corners)  # (B, K)
    good = ious > min_iou

    return {
        "keep": final_mask & good,                     # (B, K)
        "detected_object_ids": detected_object_ids,    # (B, K)
        "ious": ious,
        "captions": out["lang_cap"],                   # (B, K, T) tokens
    }


def feed_scene_cap(
    eval_step,           # jitted (state, batch) -> out dict
    state,
    dataset,
    loader,
    organized: Dict,
    min_iou: float = 0.5,
    use_nms: bool = True,
    intermediates: Optional[Dict] = None,
) -> Dict:
    """Run eval over a loader and return the candidates dict.

    ``intermediates``: pass a dict to also collect the reference's
    --save_interm dump (eval_helper.py:242-268) per kept object —
    object_name, box corners, decoded caption + tokens, and (when the
    decoder emitted them, make_eval_step(keep_attn=True)) the per-step
    attention weights over the local context slots with their proposal ids
    and box corners.  The reference stores full-K attention masks; every
    non-local slot there is exactly 0 (models/caption.py), so the L-slot
    form is the same information, dense."""
    candidates: Dict[str, List[str]] = {}
    idx2word = dataset.vocabulary["idx2word"]
    emb_table = jnp.asarray(dataset.emb_table)   # upload ONCE (slow host link)
    for batch in loader:
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        jbatch["glove_emb_table"] = emb_table
        out = eval_step(state, jbatch)
        post = postprocess_scene_cap(out, jbatch, min_iou=min_iou,
                                     use_nms=use_nms)
        keep = np.asarray(post["keep"])
        det_ids = np.asarray(post["detected_object_ids"])
        caps = np.asarray(post["captions"])
        ds_idx = np.asarray(batch["dataset_idx"])
        if intermediates is not None:
            corners = np.asarray(out["bbox_corner"])
            # local-slot decode: (B, K, T, L) is small — transfer in bulk.
            # full-K decode (num_locals == -1): (B, K, T, K) is hundreds of
            # MB — slice per KEPT proposal below instead (attn_dev stays on
            # device; each kept slice is ~30 KB)
            slots = (np.asarray(out["topdown_attn_slots"])
                     if "topdown_attn_slots" in out else None)
            attn_dev = out.get("topdown_attn")
            attn = (np.asarray(attn_dev)
                    if attn_dev is not None and slots is not None else None)
            valid_all = (np.asarray(out["valid_masks"])
                         if attn_dev is not None and slots is None else None)
        for b in range(keep.shape[0]):
            scene_id = dataset.scanrefer[int(ds_idx[b])]["scene_id"]
            for k in np.where(keep[b])[0]:
                object_id = str(int(det_ids[b, k]))
                try:
                    ann_list = list(organized[scene_id][object_id].keys())
                    object_name = organized[scene_id][object_id][
                        ann_list[0]]["object_name"]
                except KeyError:
                    continue
                key = f"{scene_id}|{object_id}|{object_name}"
                caption = decode_caption(caps[b, k], idx2word)
                candidates[key] = [caption]
                if intermediates is not None:
                    entry = intermediates.setdefault(
                        scene_id, {}).setdefault(object_id, {})
                    entry["object_name"] = object_name
                    entry["box_corner"] = corners[b, k].tolist()
                    entry["description"] = caption
                    entry["token"] = caption.split(" ")
                    if attn is not None and slots is not None:
                        sl = slots[b, k]
                        entry["object_attn_weight"] = attn[b, k].tolist()
                        entry["object_attn_slots"] = sl.tolist()
                        entry["object_attn_context"] = \
                            corners[b, sl].tolist()
                    elif attn_dev is not None:
                        # full-K attention: keep only the VALID context
                        # proposals (the reference's valid_context_masks
                        # gate, eval_helper.py:254-260)
                        sl = np.where(valid_all[b, k] == 1)[0]
                        w = np.asarray(attn_dev[b, k])      # (T, K) slice
                        entry["object_attn_weight"] = w[:, sl].tolist()
                        entry["object_attn_slots"] = sl.tolist()
                        entry["object_attn_context"] = \
                            corners[b, sl].tolist()
    return candidates


def score_captions(corpus: Dict, candidates: Dict,
                   use_meteor_jar: bool = False):
    """Corpus metrics (eval_helper.py:457-480). Returns
    (bleu, cider, rouge, meteor) each as (score, per-key scores)."""
    candidates = check_candidates(corpus, candidates)
    candidates = organize_candidates(corpus, candidates)
    bleu = Bleu(4).compute_score(corpus, candidates)
    cider = Cider().compute_score(corpus, candidates)
    rouge = Rouge().compute_score(corpus, candidates)
    if use_meteor_jar:
        from scan2cap_tpu.eval.capeval.meteor import MeteorJava
        scorer = MeteorJava()
    else:
        scorer = Meteor()
    meteor = scorer.compute_score(corpus, candidates)
    # which matcher stages scored METEOR is part of the result — absolute
    # values are only comparable across runs with the same backend
    print(f"[score_captions] METEOR backend: {scorer.backend}")
    return bleu, cider, rouge, meteor


def eval_cap(
    eval_step,
    state,
    dataset,
    loader,
    organized: Dict,
    min_iou: float = 0.5,
    corpus: Optional[Dict] = None,
    use_meteor_jar: bool = False,
    use_nms: bool = True,
    intermediates: Optional[Dict] = None,
):
    """Full caption evaluation (eval_helper.py:388-512):
    corpus prep → model feed → metric scoring."""
    if corpus is None:
        corpus = prepare_corpus(dataset.scanrefer_full
                                if hasattr(dataset, "scanrefer_full")
                                else dataset.scanrefer)
    candidates = feed_scene_cap(
        eval_step, state, dataset, loader, organized, min_iou,
        use_nms=use_nms, intermediates=intermediates)
    return score_captions(corpus, candidates, use_meteor_jar)
