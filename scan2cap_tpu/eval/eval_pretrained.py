"""Caption evaluation for the pretrained (caption-only) track —
lib/eval_helper_pretrained.py.

"gt" mode (feed_gt_cap, :105-163): candidates keyed by the stored per-box
object ids (oracle boxes, no IoU gate).  "votenet" mode (feed_votenet_cap,
:163+): proposals gated by objectness mask ∧ IoU(pred, ref GT) like the
scene path.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from scan2cap_tpu.eval.eval_helper import decode_caption, score_captions
from scan2cap_tpu.ops.boxes import box3d_iou_batch


def feed_pretrained_cap(
    eval_step,              # (batch) -> out dict with lang_cap tokens
    dataset,
    loader,
    organized: Dict,
    mode: str = "gt",
    min_iou: float = 0.5,
) -> Dict[str, List[str]]:
    candidates: Dict[str, List[str]] = {}
    idx2word = dataset.vocabulary["idx2word"]
    emb = jnp.asarray(dataset.emb_table)
    for batch in loader:
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        jb["glove_emb_table"] = emb
        out = eval_step(jb)
        caps = np.asarray(out["lang_cap"])               # (B, K, T)
        masks = np.asarray(batch["bbox_mask"])
        obj_ids = np.asarray(batch["scene_object_ids"])
        if mode == "votenet":
            ious = np.asarray(box3d_iou_batch(
                jb["bbox_corner"],
                jb["ref_box_corner_label"][:, None]))
            keep = (masks == 1) & (ious > min_iou)
        else:
            keep = masks == 1
        for b in range(caps.shape[0]):
            scene_id = dataset.scanrefer[int(batch["dataset_idx"][b])]["scene_id"]
            for k in np.where(keep[b])[0]:
                object_id = str(int(obj_ids[b, k]))
                try:
                    ann_list = list(organized[scene_id][object_id].keys())
                    object_name = organized[scene_id][object_id][
                        ann_list[0]]["object_name"]
                except KeyError:
                    continue
                key = f"{scene_id}|{object_id}|{object_name}"
                candidates[key] = [decode_caption(caps[b, k], idx2word)]
    return candidates


def eval_pretrained_cap(eval_step, dataset, loader, organized, corpus,
                        mode: str = "gt", min_iou: float = 0.5,
                        use_meteor_jar: bool = False):
    candidates = feed_pretrained_cap(
        eval_step, dataset, loader, organized, mode, min_iou)
    return score_captions(corpus, candidates, use_meteor_jar)
