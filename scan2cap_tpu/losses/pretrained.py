"""Pretrained-track losses — lib/loss_helper_pretrained.py.

"gt" mode: plain token CE averaged over non-pad tokens (torch
CrossEntropyLoss(ignore_index=0) mean reduction, :26-42); "votenet" mode:
IoU-gated CE identical to the scene path (:43-77).  Total =
cap + 0.1 * orientation [+ 0.1 * distance] (:167-204).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from scan2cap_tpu.losses.detection import _ce_logits
from scan2cap_tpu.losses.caption import (
    compute_cap_loss, compute_node_orientation_loss, compute_node_distance_loss)


def compute_cap_loss_gt(data_dict: dict) -> Tuple[jax.Array, jax.Array]:
    """Mean CE over non-pad target tokens (gt mode)."""
    pred_caps = data_dict["lang_cap"]                 # (B, T, V)
    lang_len = data_dict["lang_len"]
    num_words = jnp.max(lang_len)
    T = pred_caps.shape[1]
    targets = data_dict["lang_ids"][:, 1:T + 1].astype(jnp.int32)

    step_mask = (jnp.arange(T)[None, :] < (num_words - 1)).astype(jnp.float32)
    pad_mask = (targets != 0).astype(jnp.float32) * step_mask

    ce = _ce_logits(pred_caps, targets) * pad_mask
    cap_loss = jnp.sum(ce) / (jnp.sum(pad_mask) + 1e-6)

    preds = jnp.argmax(pred_caps, axis=-1)
    cap_acc = (jnp.sum((preds == targets).astype(jnp.float32) * pad_mask)
               / (jnp.sum(pad_mask) + 1e-6))
    return cap_loss, cap_acc


def get_pretrained_loss(data_dict: dict, mode: str = "gt",
                        orientation: bool = False, distance: bool = False,
                        num_bins: int = 6) -> dict:
    d = dict(data_dict)
    zero = jnp.zeros((), jnp.float32)
    if mode == "gt":
        cap_loss, cap_acc = compute_cap_loss_gt(d)
    else:
        cap_loss, cap_acc = compute_cap_loss(d)
    d["cap_loss"], d["cap_acc"] = cap_loss, cap_acc

    if orientation:
        # pretrained data carries per-proposal object ids directly; the
        # rotation labels are already proposal-aligned
        if "object_assignment" not in d:
            B, K = d["bbox_mask"].shape
            d["object_assignment"] = jnp.tile(
                jnp.arange(K, dtype=jnp.int32)[None], (B, 1))
        ori_loss, ori_acc = compute_node_orientation_loss(d, num_bins)
        d["ori_loss"], d["ori_acc"] = ori_loss, ori_acc
    else:
        d["ori_loss"], d["ori_acc"] = zero, zero

    if distance:
        d["dist_loss"] = compute_node_distance_loss(d)
    else:
        d["dist_loss"] = zero

    d["loss"] = cap_loss + 0.1 * d["ori_loss"] + (
        0.1 * d["dist_loss"] if distance else 0.0)
    return d
