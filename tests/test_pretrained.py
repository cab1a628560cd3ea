"""Pretrained (caption-only) track: model, loss, and HDF5 datasets."""

import numpy as np
import h5py
import jax
import jax.numpy as jnp
import pytest

from scan2cap_tpu.config import ModelConfig
from scan2cap_tpu.data.synthetic import make_vocab
from scan2cap_tpu.models.capnet_pretrained import CapNetPretrained
from scan2cap_tpu.losses.pretrained import get_pretrained_loss, compute_cap_loss_gt

CFG = ModelConfig(num_proposals=16, num_locals=4, max_num_obj=8,
                  use_topdown=True, use_relation=True, use_orientation=True,
                  num_graph_steps=2, min_iou=-1.0)


def _gt_batch(rng, vocab, B=2, K=16):
    T = CFG.max_des_len + 2
    table = vocab["emb_table"]
    lang_ids = np.zeros((B, T), np.int32)
    lang_feat = np.zeros((B, T, 300), np.float32)
    lang_len = np.zeros((B,), np.int32)
    for b in range(B):
        k = rng.randint(3, 8)
        ids = [2] + list(rng.randint(4, len(table), k)) + [3]
        lang_ids[b, :len(ids)] = ids
        lang_feat[b, :len(ids)] = table[ids]
        lang_len[b] = len(ids)
    corners = rng.rand(B, K, 8, 3).astype(np.float32)
    return {
        "bbox_feature": jnp.asarray(rng.randn(B, K, 128).astype(np.float32)),
        "bbox_corner": jnp.asarray(corners),
        "bbox_mask": jnp.ones((B, K), jnp.int32),
        "bbox_idx": jnp.asarray(rng.randint(0, K, B).astype(np.int32)),
        "lang_feat": jnp.asarray(lang_feat),
        "lang_ids": jnp.asarray(lang_ids),
        "lang_len": jnp.asarray(lang_len),
        "glove_emb_table": jnp.asarray(table),
        "scene_object_rotations": jnp.asarray(
            np.tile(np.eye(3, dtype=np.float32), (B, K, 1, 1))),
        "scene_object_rotation_masks": jnp.ones((B, K), jnp.int32),
        "center_label": jnp.asarray(rng.rand(B, K, 3).astype(np.float32)),
    }


def test_pretrained_gt_forward_and_loss(rng):
    vocab = make_vocab(num_vocabs=32)
    batch = _gt_batch(rng, vocab)
    model = CapNetPretrained(CFG, mode="gt", num_vocabs=32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    apply = jax.jit(model.apply,
                    static_argnames=("use_tf", "is_eval", "train"))
    out = apply(variables, batch, use_tf=True, is_eval=False, train=False)
    assert out["lang_cap"].shape == (2, CFG.max_des_len + 1, 32)
    # oracle mode: target ious forced to 1 -> all boxes good
    assert bool(jnp.all(out["good_bbox_masks"]))

    out = get_pretrained_loss(out, mode="gt", orientation=True)
    assert np.isfinite(float(out["loss"]))
    assert np.isfinite(float(out["ori_loss"]))

    # eval decode path
    out_e = apply(variables, batch, use_tf=False, is_eval=True, train=False)
    assert out_e["lang_cap"].shape == (2, 16, CFG.max_des_len - 1)


def test_cap_loss_gt_normalization(rng):
    # mean over non-pad tokens, NOT over (good x steps)
    B, T, V = 2, 7, 11
    lang_len = np.array([5, 8])
    lang_ids = rng.randint(1, V, (B, T + 1)).astype(np.int32)
    for b in range(B):
        lang_ids[b, lang_len[b]:] = 0
    logits = rng.randn(B, T, V).astype(np.float32)
    d = {"lang_cap": jnp.asarray(logits), "lang_ids": jnp.asarray(lang_ids),
         "lang_len": jnp.asarray(lang_len)}
    loss, acc = compute_cap_loss_gt(d)

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)
    num_words = lang_len.max()
    tgt = lang_ids[:, 1:num_words]
    ce = -np.log(np.take_along_axis(
        softmax(logits[:, :num_words - 1]), tgt[..., None], -1)[..., 0])
    mask = tgt != 0
    want = ce[mask].mean()
    assert abs(float(loss) - want) < 1e-5


def test_pretrained_hdf5_datasets(tmp_path, rng):
    from scan2cap_tpu.data.dataset_pretrained import (
        PretrainedGTDataset, PretrainedVoteNetDataset)
    from tests.test_dataset import make_fixture_glove

    words = ["a", "chair"]
    glove = make_fixture_glove(words)
    scanrefer = [{"scene_id": "scene0000_00", "object_id": "1",
                  "object_name": "chair", "ann_id": "0",
                  "token": ["a", "chair"]}]

    # GT database
    gt_path = str(tmp_path / "gt.hdf5")
    with h5py.File(gt_path, "w") as f:
        for epoch in range(2):
            p = f"{epoch}|scene0000_00"
            f[p + "_gt_ids"] = np.array([0, 1, 2])
            f[p + "_features"] = rng.randn(3, 128).astype(np.float32)
            f[p + "_gt_corners"] = rng.rand(3, 8, 3).astype(np.float32)
    ds = PretrainedGTDataset(scanrefer, gt_path, split="train", glove=glove,
                             num_preset_epochs=2, K=8)
    d = ds.__getitem__(0, rs=np.random.RandomState(0))
    assert d["bbox_feature"].shape == (8, 128)
    assert d["bbox_mask"].sum() == 3
    assert int(d["bbox_idx"]) == 1  # object_id 1 at position 1
    assert d["lang_ids"][0] == 2    # sos

    # VoteNet database
    vn_path = str(tmp_path / "vn.hdf5")
    with h5py.File(vn_path, "w") as f:
        p = "0|scene0000_00"
        f[p + "_object_ids"] = np.array([1, 0])
        f[p + "_features"] = rng.randn(2, 128).astype(np.float32)
        f[p + "_bbox_corners"] = rng.rand(2, 8, 3).astype(np.float32)
        f[p + "_gt_ids"] = np.array([0, 1])
        f[p + "_gt_corners"] = rng.rand(2, 8, 3).astype(np.float32)
    ds2 = PretrainedVoteNetDataset(scanrefer, vn_path, split="val",
                                   glove=glove, K=8, max_gt=4)
    d2 = ds2.__getitem__(0, rs=np.random.RandomState(0))
    assert d2["bbox_feature"].shape == (8, 128)
    assert d2["objectness_scores"].shape == (8, 2)
    # masked proposals have ~1 objectness prob on class 1
    assert d2["objectness_scores"][0, 1] > 0.99
    # padded slots are the reference's fill construction [1e-8, 1e-8]
    # (lib/dataset_pretrained.py:861-862) — NOT a near-one-hot class 0
    np.testing.assert_allclose(d2["objectness_scores"][5], [1e-8, 1e-8])
    assert d2["ref_box_corner_label"].shape == (8, 3)
    assert d2["gt_box_masks"].sum() == 2


def test_feed_pretrained_cap(rng, tmp_path):
    """feed_pretrained_cap assembles candidates keyed by stored object ids."""
    import jax
    from scan2cap_tpu.eval.eval_pretrained import feed_pretrained_cap

    vocab = make_vocab(num_vocabs=32)
    batch = _gt_batch(rng, vocab)
    model = CapNetPretrained(CFG, mode="gt", num_vocabs=32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)

    class DS:
        vocabulary = vocab
        emb_table = vocab["emb_table"]
        scanrefer = [{"scene_id": "scene0000_00"},
                     {"scene_id": "scene0001_00"}]

    loader = [{
        **{k: np.asarray(v) for k, v in batch.items()},
        "bbox_mask": np.concatenate(
            [np.ones((2, 4), np.int32), np.zeros((2, 12), np.int32)], 1),
        "scene_object_ids": np.tile(np.arange(16, dtype=np.int32), (2, 1)),
        "dataset_idx": np.arange(2, dtype=np.int32),
    }]
    organized = {
        s: {str(o): {"0": {"object_name": "chair"}} for o in range(4)}
        for s in ("scene0000_00", "scene0001_00")}

    @jax.jit
    def estep(b):
        return model.apply(variables, b, use_tf=False, is_eval=True,
                           train=False)

    cands = feed_pretrained_cap(estep, DS(), loader, organized, mode="gt")
    # 2 scenes x 4 valid boxes with organized entries
    assert len(cands) == 8
    assert all(v[0].startswith("sos") for v in cands.values())
