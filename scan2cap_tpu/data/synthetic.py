"""Synthetic ScanRefer-style scenes for tests and benchmarks.

Produces a batched ``data_dict`` with exactly the keys/shapes of the
reference dataset output (lib/dataset.py:503-540): random rooms with a few
axis-aligned boxes, points sampled on/around them, vote labels (center -
point for in-box points, tiled x3 per lib/dataset.py:427-442), padded box
labels to MAX_NUM_OBJ, GT corner boxes, random-token captions with GloVe-like
random embeddings.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from scan2cap_tpu.config import ModelConfig, SCANNET_MEAN_SIZE_ARR


def make_vocab(num_vocabs: int = 64, emb_size: int = 300,
               seed: int = 0) -> Dict:
    """A toy vocabulary with the reference's 4 special tokens at ids 0-3
    (lib/dataset.py:182) and a random embedding table."""
    rs = np.random.RandomState(seed)
    words = ["pad_", "unk", "sos", "eos"] + [
        f"word{i}" for i in range(num_vocabs - 4)]
    word2idx = {w: i for i, w in enumerate(words)}
    idx2word = {str(i): w for i, w in enumerate(words)}
    table = rs.randn(num_vocabs, emb_size).astype(np.float32) * 0.1
    table[0] = 0.0  # pad embedding
    return {
        "word2idx": word2idx,
        "idx2word": idx2word,
        "emb_table": table,
    }


def make_scene_batch(
    cfg: ModelConfig,
    batch_size: int = 2,
    num_objects: int = 4,
    vocab: Optional[Dict] = None,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    rs = np.random.RandomState(seed)
    if vocab is None:
        vocab = make_vocab(emb_size=cfg.emb_size)
    V = len(vocab["word2idx"])
    N = cfg.num_points
    M = cfg.max_num_obj
    T = cfg.max_des_len + 2
    in_dim = cfg.input_feature_dim

    pc = np.zeros((batch_size, N, 3 + in_dim), np.float32)
    vote_label = np.zeros((batch_size, N, 9), np.float32)
    vote_label_mask = np.zeros((batch_size, N), np.int32)
    center_label = np.zeros((batch_size, M, 3), np.float32)
    box_label_mask = np.zeros((batch_size, M), np.float32)
    heading_class_label = np.zeros((batch_size, M), np.int32)
    heading_residual_label = np.zeros((batch_size, M), np.float32)
    size_class_label = np.zeros((batch_size, M), np.int32)
    size_residual_label = np.zeros((batch_size, M, 3), np.float32)
    sem_cls_label = np.zeros((batch_size, M), np.int32)
    gt_box_corner_label = np.zeros((batch_size, M, 8, 3), np.float32)
    gt_box_masks = np.zeros((batch_size, M), np.int32)
    gt_box_object_ids = np.zeros((batch_size, M), np.int32)
    scene_object_ids = np.zeros((batch_size, M), np.int32)
    rotations = np.zeros((batch_size, M, 3, 3), np.float32)
    rotation_masks = np.zeros((batch_size, M), np.int32)
    ref_box_corner_label = np.zeros((batch_size, 8, 3), np.float32)
    ref_center_label = np.zeros((batch_size, 3), np.float32)
    ref_size_class_label = np.zeros((batch_size,), np.int32)
    ref_size_residual_label = np.zeros((batch_size, 3), np.float32)
    lang_feat = np.zeros((batch_size, T, cfg.emb_size), np.float32)
    lang_ids = np.zeros((batch_size, T), np.int32)
    lang_len = np.zeros((batch_size,), np.int32)
    object_ids = np.zeros((batch_size,), np.int32)

    table = vocab["emb_table"]
    sos_id = vocab["word2idx"]["sos"]
    eos_id = vocab["word2idx"]["eos"]

    for b in range(batch_size):
        # room-scale background points
        pc[b, :, 0:2] = rs.uniform(-4, 4, (N, 2))
        pc[b, :, 2] = rs.uniform(0, 0.05, N)

        pts_per_obj = N // (2 * num_objects)
        cursor = 0
        for o in range(num_objects):
            cls = rs.randint(0, cfg.num_class)
            size = SCANNET_MEAN_SIZE_ARR[cls] * rs.uniform(0.8, 1.2, 3)
            center = np.array([
                rs.uniform(-3, 3), rs.uniform(-3, 3), size[2] / 2 + 0.05])
            lo, hi = center - size / 2, center + size / 2
            pts = rs.uniform(lo, hi, (pts_per_obj, 3)).astype(np.float32)
            pc[b, cursor:cursor + pts_per_obj, :3] = pts
            # votes: every in-box point votes to the box center of its points
            pcenter = 0.5 * (pts.min(0) + pts.max(0))
            vote = (pcenter - pts).astype(np.float32)
            vote_label[b, cursor:cursor + pts_per_obj] = np.tile(vote, (1, 3))
            vote_label_mask[b, cursor:cursor + pts_per_obj] = 1
            cursor += pts_per_obj

            center_label[b, o] = center
            box_label_mask[b, o] = 1
            size_class_label[b, o] = cls
            size_residual_label[b, o] = size - SCANNET_MEAN_SIZE_ARR[cls]
            sem_cls_label[b, o] = cls
            gt_box_masks[b, o] = 1
            gt_box_object_ids[b, o] = o
            scene_object_ids[b, o] = o
            # corner order matches get_3d_box (heading 0)
            sx = np.array([1, 1, -1, -1, 1, 1, -1, -1]) * size[0] / 2
            sy = np.array([1, -1, -1, 1, 1, -1, -1, 1]) * size[1] / 2
            sz = np.array([1, 1, 1, 1, -1, -1, -1, -1]) * size[2] / 2
            gt_box_corner_label[b, o] = np.stack([sx, sy, sz], 1) + center
            theta = rs.uniform(0, np.pi)
            c, s = np.cos(theta), np.sin(theta)
            rotations[b, o] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            rotation_masks[b, o] = 1

        # reference target = object 0
        ref = rs.randint(0, num_objects)
        object_ids[b] = ref
        ref_box_corner_label[b] = gt_box_corner_label[b, ref]
        ref_center_label[b] = center_label[b, ref]
        ref_size_class_label[b] = size_class_label[b, ref]
        ref_size_residual_label[b] = size_residual_label[b, ref]

        # caption: sos w1..wk eos pad...
        k = rs.randint(3, cfg.max_des_len)
        ids = [sos_id] + list(rs.randint(4, V, k)) + [eos_id]
        lang_ids[b, :len(ids)] = ids
        lang_len[b] = len(ids)
        lang_feat[b, :len(ids)] = table[ids]

        if cfg.use_height:
            floor = np.percentile(pc[b, :, 2], 0.99)
            pc[b, :, 3 + 3 * cfg.use_color + 3 * cfg.use_normal
               + 128 * cfg.use_multiview] = pc[b, :, 2] - floor

    return {
        "point_clouds": pc,
        "lang_feat": lang_feat,
        "lang_len": lang_len,
        "lang_ids": lang_ids,
        "center_label": center_label,
        "heading_class_label": heading_class_label,
        "heading_residual_label": heading_residual_label,
        "size_class_label": size_class_label,
        "size_residual_label": size_residual_label,
        "sem_cls_label": sem_cls_label,
        "box_label_mask": box_label_mask,
        "vote_label": vote_label,
        "vote_label_mask": vote_label_mask,
        "scene_object_ids": scene_object_ids,
        "scene_object_rotations": rotations,
        "scene_object_rotation_masks": rotation_masks,
        "gt_box_corner_label": gt_box_corner_label,
        "gt_box_masks": gt_box_masks,
        "gt_box_object_ids": gt_box_object_ids,
        "ref_box_corner_label": ref_box_corner_label,
        "ref_center_label": ref_center_label,
        "ref_size_class_label": ref_size_class_label,
        "ref_size_residual_label": ref_size_residual_label,
        "object_id": object_ids,
        "glove_emb_table": table,
    }


def stage_scene_batch(host_batch: dict, cfg) -> dict:
    """Place a ``make_scene_batch`` result on device, assembling the
    all-zero feature channels (color/normal/multiview) there instead of
    uploading them — synthetic scenes carry signal only in xyz + height,
    and this host's tunnel is ~1.6 MB/s (a full 135-channel flagship cloud
    would be ~170 MB/batch).  Labels and small tensors upload as-is.
    Shared by scripts/quality_trajectory.py and the training demo."""
    import jax.numpy as jnp
    import numpy as np

    out = {}
    pc = host_batch["point_clouds"]
    height_ch = (3 + 3 * cfg.use_color + 3 * cfg.use_normal
                 + 128 * cfg.use_multiview)
    n_zero = pc.shape[-1] - 4  # channels between xyz and height
    xyz = jnp.asarray(np.ascontiguousarray(pc[..., :3]))
    if cfg.use_height and n_zero >= 0:
        height = jnp.asarray(np.ascontiguousarray(pc[..., height_ch]))
        zeros = jnp.zeros(pc.shape[:-1] + (n_zero,), jnp.float32)
        out["point_clouds"] = jnp.concatenate(
            [xyz, zeros, height[..., None]], axis=-1)
    else:
        out["point_clouds"] = jnp.asarray(pc)
    for k, v in host_batch.items():
        if k != "point_clouds":
            out[k] = jnp.asarray(v)
    return out


def make_device_train_batch(cfg, batch_size: int, vocab: dict,
                            num_objects: int = 8, seed: int = 0,
                            key_seed: int = 7):
    """Device-resident synthetic train batch for benchmarks/micro-profiles.

    Small label tensors come from a 1-scene host batch tiled to
    ``batch_size`` (the benching host link is ~1.6 MB/s — see CLAUDE.md);
    every N-sized tensor (point_clouds, vote_label(+mask)) is synthesized
    ON DEVICE from a PRNG key.  Shared by bench.py and the
    scripts/micro_train_* profiles so the batch recipe cannot drift.
    """
    import jax
    import jax.numpy as jnp

    host = make_scene_batch(cfg, batch_size=1, num_objects=num_objects,
                            vocab=vocab, seed=seed)
    big = {"point_clouds", "vote_label", "vote_label_mask"}
    batch = {k: jnp.tile(jnp.asarray(v), (batch_size,) + (1,) * (v.ndim - 1))
             for k, v in host.items() if k not in big}
    key0 = jax.random.PRNGKey(key_seed)
    N = cfg.num_points
    in_dim = 3 + cfg.input_feature_dim
    xyz = jax.random.uniform(key0, (batch_size, N, 3), minval=-4.0,
                             maxval=4.0)
    feats = jax.random.normal(jax.random.fold_in(key0, 1),
                              (batch_size, N, in_dim - 3)) * 0.1
    batch["point_clouds"] = jnp.concatenate([xyz, feats], -1)
    batch["vote_label"] = jax.random.normal(
        jax.random.fold_in(key0, 2), (batch_size, N, 9)) * 0.1
    batch["vote_label_mask"] = (jax.random.uniform(
        jax.random.fold_in(key0, 3), (batch_size, N)) < 0.5).astype(jnp.int32)
    batch["glove_emb_table"] = jnp.asarray(vocab["emb_table"])
    return batch
