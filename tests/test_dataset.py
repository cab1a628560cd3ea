"""Dataset pipeline tests on generated fixture scenes (no real ScanNet)."""

import json
import os

import numpy as np
import pytest

from scan2cap_tpu.data.dataset import (
    ScannetReferenceDataset, Loader, get_scanrefer, DC_NYU2CLS,
    rotate_aligned_boxes_along_axis,
)
from scan2cap_tpu.data.vocab import (
    build_vocabulary, build_embedding_table, encode_caption,
)
from scan2cap_tpu.utils.pc_utils import rotz


def make_fixture_scene(path, scene_id, rng, n_points=2000, n_obj=3):
    """Write the 4 per-scene .npy files the loader expects
    (data/scannet/batch_load_scannet_data.py output schema)."""
    verts = np.zeros((n_points, 9), np.float32)
    verts[:, 0:3] = rng.rand(n_points, 3) * 6 - 3
    verts[:, 3:6] = rng.randint(0, 255, (n_points, 3))
    verts[:, 6:9] = rng.randn(n_points, 3)
    ins = np.zeros(n_points, np.int32)
    sem = np.zeros(n_points, np.int32)
    bboxes = np.zeros((n_obj, 8), np.float32)
    ppo = n_points // (n_obj + 1)
    for o in range(n_obj):
        lo, hi = o * ppo, (o + 1) * ppo
        center = rng.rand(3) * 4 - 2
        size = rng.rand(3) * 0.8 + 0.3
        verts[lo:hi, 0:3] = center + (rng.rand(ppo, 3) - 0.5) * size
        ins[lo:hi] = o + 1
        sem[lo:hi] = 5  # chair
        bboxes[o] = [*center, *size, 5, o]  # nyu40 id 5, instance id o
    np.save(os.path.join(path, f"{scene_id}_aligned_vert.npy"), verts)
    np.save(os.path.join(path, f"{scene_id}_ins_label.npy"), ins)
    np.save(os.path.join(path, f"{scene_id}_sem_label.npy"), sem)
    np.save(os.path.join(path, f"{scene_id}_aligned_bbox.npy"), bboxes)


def make_fixture_glove(words):
    rs = np.random.RandomState(7)
    return {w: rs.randn(300).astype(np.float32) for w in
            list(words) + ["pad_", "unk", "sos", "eos"]}


@pytest.fixture
def fixture_data(tmp_path, rng):
    scenes = ["scene0000_00", "scene0001_00"]
    for s in scenes:
        make_fixture_scene(str(tmp_path), s, rng)
    words = ["this", "is", "a", "red", "chair", "next", "to", "the", "table"]
    glove = make_fixture_glove(words)
    scanrefer = []
    for s in scenes:
        for obj in range(2):
            scanrefer.append({
                "scene_id": s, "object_id": str(obj),
                "object_name": "chair", "ann_id": "0",
                "token": ["this", "is", "a", "red", "chair"],
                "description": "this is a red chair",
            })
    return str(tmp_path), scanrefer, glove


def _make_dataset(fixture_data, **kw):
    data_dir, scanrefer, glove = fixture_data
    return ScannetReferenceDataset(
        scanrefer, [d["scene_id"] for d in scanrefer],
        scannet_data_dir=data_dir, glove_path="", glove=glove,
        num_points=1024, max_num_obj=16,
        use_height=True, use_color=True, use_normal=True, **kw)


def test_dataset_shapes_and_votes(fixture_data):
    ds = _make_dataset(fixture_data)
    d = ds.__getitem__(0, rs=np.random.RandomState(0))
    assert d["point_clouds"].shape == (1024, 3 + 3 + 3 + 1)
    assert d["lang_feat"].shape == (32, 300)
    assert d["lang_ids"].shape == (32,)
    assert d["vote_label"].shape == (1024, 9)
    assert d["center_label"].shape == (16, 3)
    assert d["gt_box_corner_label"].shape == (16, 8, 3)
    # captions: sos + 5 words + eos
    assert int(d["lang_len"]) == 7
    assert d["lang_ids"][0] == ds.vocabulary["word2idx"]["sos"]
    assert d["lang_ids"][6] == ds.vocabulary["word2idx"]["eos"]
    assert d["lang_ids"][7] == 0
    # votes: masked points vote toward their instance AABB center
    vm = d["vote_label_mask"].astype(bool)
    assert vm.sum() > 0
    # the 3 tiled votes are identical
    np.testing.assert_allclose(d["vote_label"][:, :3], d["vote_label"][:, 3:6])
    # 3 boxes labeled, all chairs (class 2)
    assert int(d["num_bbox"]) == 3
    np.testing.assert_array_equal(d["sem_cls_label"][:3], 2)
    assert d["box_label_mask"][:3].sum() == 3
    # ref target box corresponds to object_id 0
    assert d["ref_box_label"][0] == 1
    # gt corners consistent with center labels
    centers = (d["gt_box_corner_label"][:3].min(1)
               + d["gt_box_corner_label"][:3].max(1)) / 2
    np.testing.assert_allclose(centers, d["center_label"][:3], atol=1e-4)


def test_dataset_augmentation_reproducible(fixture_data):
    ds = _make_dataset(fixture_data, augment=True)
    d1 = ds.__getitem__(0, rs=np.random.RandomState(5))
    d2 = ds.__getitem__(0, rs=np.random.RandomState(5))
    np.testing.assert_array_equal(d1["point_clouds"], d2["point_clouds"])
    d3 = ds.__getitem__(0, rs=np.random.RandomState(6))
    assert not np.allclose(d1["point_clouds"], d3["point_clouds"])
    # votes computed after augmentation: masked votes still point to centers
    vm = d1["vote_label_mask"].astype(bool)
    pts = d1["point_clouds"][vm, :3]
    votes = d1["vote_label"][vm, :3]
    assert np.abs(votes).max() < 3.0  # offsets stay box-scale


def test_loader_batching(fixture_data):
    ds = _make_dataset(fixture_data)
    loader = Loader(ds, batch_size=2, shuffle=True, seed=1, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["point_clouds"].shape == (2, 1024, 10)
    assert b["lang_ids"].shape == (2, 32)


def test_vocab_and_embedding(fixture_data):
    _, scanrefer, glove = fixture_data
    vocab = build_vocabulary(scanrefer, glove)
    assert [vocab["word2idx"][w] for w in ("pad_", "unk", "sos", "eos")] == [0, 1, 2, 3]
    table = build_embedding_table(vocab, glove)
    assert table.shape == (len(vocab["word2idx"]), 300)
    np.testing.assert_allclose(
        table[vocab["word2idx"]["chair"]], glove["chair"])
    emb, ids, ln = encode_caption(["red", "chair", "zzz"], vocab, glove)
    assert ln == 5
    assert ids[3] == vocab["word2idx"]["unk"]  # oov word
    np.testing.assert_allclose(emb[2], glove["chair"])


def test_nyu2cls_mapping():
    assert DC_NYU2CLS[5] == 2    # chair
    assert DC_NYU2CLS[4] == 1    # bed
    assert DC_NYU2CLS[39] == 17  # otherfurniture -> others
    assert 1 not in DC_NYU2CLS   # wall excluded
    assert 22 not in DC_NYU2CLS  # ceiling excluded


def test_rotate_aligned_boxes_along_axis_small_angle(rng):
    boxes = np.concatenate([rng.randn(5, 3), rng.rand(5, 3) + 0.5], axis=1)
    rot = rotz(0.0)
    out = rotate_aligned_boxes_along_axis(boxes, rot, "z")
    np.testing.assert_allclose(out, boxes, atol=1e-6)


def test_loader_host_sharding(tmp_path, rng):
    # hosts draw disjoint interleaved slices of the same permutation that
    # union to (almost) the full epoch; every host runs equal step counts
    class _Toy:
        def __len__(self):
            return 21

        def __getitem__(self, i, rs=None):
            return {"idx": np.int32(i)}

    from scan2cap_tpu.data.dataset import Loader
    seen = []
    for shard in range(4):
        ld = Loader(_Toy(), batch_size=2, shuffle=True, seed=3,
                    num_shards=4, shard_id=shard, drop_last=True)
        assert len(ld) == 2                       # 21 // 4 = 5 -> 2 batches
        got = [int(v) for b in ld for v in b["idx"]]
        assert len(got) == 4
        seen.append(set(got))
    for a in range(4):
        for b in range(a + 1, 4):
            assert not (seen[a] & seen[b]), (a, b)


def test_dataset_handles_unannotated_test_scene(tmp_path, rng):
    # hidden-benchmark test scenes have zero labels and no boxes
    # (scannet_preprocess export's no-aggregation branch); the dataset must
    # degrade gracefully (reference needed a separate TestDataset class)
    import pickle
    scannet = tmp_path / "scannet_data"
    scannet.mkdir()
    n = 800
    verts = np.zeros((n, 9), np.float32)
    verts[:, :3] = rng.rand(n, 3) * 4
    verts[:, 3:6] = rng.randint(0, 255, (n, 3))
    np.save(scannet / "scene0707_00_aligned_vert.npy", verts)
    np.save(scannet / "scene0707_00_ins_label.npy", np.zeros(n, np.int32))
    np.save(scannet / "scene0707_00_sem_label.npy", np.zeros(n, np.int32))
    np.save(scannet / "scene0707_00_aligned_bbox.npy",
            np.zeros((0, 8), np.float32))
    glove_path = tmp_path / "glove.p"
    with open(glove_path, "wb") as f:
        pickle.dump(make_fixture_glove(["a", "chair"]), f)

    from scan2cap_tpu.data.dataset import ScannetReferenceDataset
    entries = [{"scene_id": "scene0707_00", "object_id": "0", "ann_id": "0",
                "object_name": "unknown", "token": ["a", "chair"],
                "description": "a chair"}]
    ds = ScannetReferenceDataset(
        entries, ["scene0707_00"], split="test", augment=False,
        scannet_data_dir=str(scannet), glove_path=str(glove_path),
        num_points=512)
    s = ds.__getitem__(0, np.random.RandomState(0))
    assert s["point_clouds"].shape == (512, 3)
    assert int(s["gt_box_masks"].sum()) == 0
    assert np.isfinite(s["point_clouds"]).all()


def test_loader_early_break_does_not_replay(tmp_path, rng):
    # breaking out of an epoch must still consume it: the next pass draws a
    # fresh permutation (no silently correlated epochs)
    class _Toy:
        def __len__(self):
            return 16

        def __getitem__(self, i, rs=None):
            return {"idx": np.int32(i)}

    from scan2cap_tpu.data.dataset import Loader
    ld = Loader(_Toy(), batch_size=2, shuffle=True, seed=5)
    first = []
    for b in ld:                       # break after one batch
        first.append([int(v) for v in b["idx"]])
        break
    second = [[int(v) for v in b["idx"]] for b in ld]
    assert ld.epoch == 2
    assert first[0] != second[0]       # different permutation


class _ToyRing:
    def __len__(self):
        return 20

    def __getitem__(self, i, rs=None):
        return {"idx": np.int32(i), "vec": np.full((5,), i, np.float32)}


def test_loader_ring_buffers_match_plain(tmp_path):
    """Loader(reuse_buffers=True) yields the same batches as the default
    path for the same seed/epoch (workers write into the reusable ring in
    arbitrary order but at fixed row slots), provided the consumer copies
    within the documented 2-batch window."""
    ds = _ToyRing()
    plain = Loader(ds, batch_size=2, shuffle=True, seed=11, num_workers=3)
    ring = Loader(ds, batch_size=2, shuffle=True, seed=11, num_workers=3,
                  reuse_buffers=True)
    got_plain = [{k: v.copy() for k, v in b.items()} for b in plain]
    got_ring = [{k: v.copy() for k, v in b.items()} for b in ring]
    assert len(got_plain) == len(got_ring) > 0
    for bp, br in zip(got_plain, got_ring):
        assert set(bp) == set(br)
        for k in bp:
            np.testing.assert_array_equal(bp[k], br[k])


def test_loader_ring_overwrites_after_window():
    """The ring contract: a batch retained past the reuse distance IS
    overwritten (this is what buys the zero-allocation steady state) —
    consumers must copy/upload first, as the solver does."""
    ds = _ToyRing()
    ring = Loader(ds, batch_size=2, shuffle=False, seed=0, num_workers=2,
                  reuse_buffers=True)
    nbuf = Loader.PREFETCH_BATCHES + 2
    if len(ring) <= nbuf:
        pytest.skip("toy dataset too small to cycle the ring")
    it = iter(ring)
    first = next(it)
    first_copy = {k: v.copy() for k, v in first.items()}
    overwritten = False
    for b, batch in enumerate(it, start=1):
        if b % nbuf == 0:   # same slot as batch 0
            overwritten = any(
                not np.array_equal(first[k], first_copy[k]) for k in first)
            break
    assert overwritten


def test_loader_ring_window_holds_across_epochs():
    """The 2-batch validity window must survive an epoch boundary: a
    consumer still holding the LAST batch of epoch N is not overwritten by
    epoch N+1's initial prefetch (the slot counter persists, so the new
    epoch's batches land in the slots after it)."""
    ds = _ToyRing()
    ring = Loader(ds, batch_size=2, shuffle=False, seed=0, num_workers=2,
                  reuse_buffers=True)
    last = None
    for last in ring:                 # epoch 0 to completion
        pass
    held = {k: v.copy() for k, v in last.items()}
    it = iter(ring)                   # epoch 1: starts the initial prefetch
    first = next(it)                  # consume ONE batch (window = 2)
    for f in ring._inflight:          # settle in-flight writes, then check
        for fut in f[1]:
            fut.result()
    for k in held:
        np.testing.assert_array_equal(last[k], held[k])
    del first, it


def test_loader_ring_persists_across_epochs(fixture_data):
    # the reuse_buffers ring + worker pool are instance state: epoch 2 must
    # reuse epoch 1's preallocated batch arrays (the zero-fresh-page steady
    # state the ring exists for), and an early-broken epoch must not corrupt
    # the next one
    ds = _make_dataset(fixture_data)
    loader = Loader(ds, batch_size=2, shuffle=True, seed=3,
                    num_workers=2, reuse_buffers=True)
    first = [dict(b) for b in loader]          # epoch 0 (copies the dict shells)
    assert len(first) == len(loader)
    # break epoch 1 early mid-prefetch
    for i, b in enumerate(loader):
        if i == 0:
            break
    out = list(loader)                          # epoch 2 runs clean
    assert len(out) == len(loader)
    # every epoch-2 batch is served from the INSTANCE ring (slots rotate
    # across epochs — the persistent window — but the preallocated arrays
    # are the same pool, and the pool never grows past the ring size)
    ring_ids = {id(arr) for buf in loader._buffers if buf
                for arr in buf.values()}
    ids_epoch2 = {id(v) for b in out for v in b.values()}
    assert ids_epoch2 <= ring_ids, "epoch-2 batches not served from the ring"
    assert sum(b is not None for b in loader._buffers) <= len(loader._buffers)
    loader.close()
