"""Golden-value tests for loss terms vs numpy re-implementations of
lib/loss_helper.py."""

import numpy as np
import jax
import jax.numpy as jnp

from scan2cap_tpu.config import ModelConfig, SCANNET_MEAN_SIZE_ARR
from scan2cap_tpu.losses import (
    compute_vote_loss, compute_objectness_loss, compute_cap_loss,
    get_scene_cap_loss,
)
from scan2cap_tpu.losses.caption import radian_to_label
from scan2cap_tpu.data.synthetic import make_scene_batch, make_vocab
from scan2cap_tpu.models import CapNet


def softmax_np(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def ce_np(logits, labels):
    p = softmax_np(logits)
    return -np.log(np.take_along_axis(p, labels[..., None], -1)[..., 0] + 1e-30)


def test_objectness_loss_golden(rng):
    B, K, M = 2, 8, 5
    d = {
        "aggregated_vote_xyz": jnp.asarray(rng.randn(B, K, 3).astype(np.float32)),
        "center_label": jnp.asarray(rng.randn(B, M, 3).astype(np.float32)),
        "objectness_scores": jnp.asarray(rng.randn(B, K, 2).astype(np.float32)),
    }
    loss, label, mask, assign = compute_objectness_loss(d)

    # numpy golden
    axyz = np.asarray(d["aggregated_vote_xyz"])
    gt = np.asarray(d["center_label"])
    dist = ((axyz[:, :, None] - gt[:, None]) ** 2).sum(-1)
    d1, i1 = dist.min(-1), dist.argmin(-1)
    eu = np.sqrt(d1 + 1e-6)
    lab = (eu < 0.3).astype(np.int64)
    msk = ((eu < 0.3) | (eu > 0.6)).astype(np.float32)
    w = np.where(lab == 1, 0.8, 0.2)
    ce = ce_np(np.asarray(d["objectness_scores"]), lab) * w
    want = (ce * msk).sum() / (msk.sum() + 1e-6)

    np.testing.assert_array_equal(np.asarray(label), lab)
    np.testing.assert_array_equal(np.asarray(mask), msk)
    np.testing.assert_array_equal(np.asarray(assign), i1)
    assert abs(float(loss) - want) < 1e-5


def test_vote_loss_golden(rng):
    B, S, N = 2, 6, 20
    seed_inds = rng.randint(0, N, (B, S)).astype(np.int32)
    d = {
        "seed_xyz": jnp.asarray(rng.randn(B, S, 3).astype(np.float32)),
        "vote_xyz": jnp.asarray(rng.randn(B, S, 3).astype(np.float32)),
        "seed_inds": jnp.asarray(seed_inds),
        "vote_label": jnp.asarray(rng.randn(B, N, 9).astype(np.float32)),
        "vote_label_mask": jnp.asarray(
            (rng.rand(B, N) > 0.5).astype(np.int32)),
    }
    loss = compute_vote_loss(d)

    seed_xyz = np.asarray(d["seed_xyz"])
    vote_xyz = np.asarray(d["vote_xyz"])
    vl = np.asarray(d["vote_label"])
    vm = np.asarray(d["vote_label_mask"])
    total, wsum = 0.0, 0.0
    for b in range(B):
        for s in range(S):
            gt = vl[b, seed_inds[b, s]].reshape(3, 3) + seed_xyz[b, s]
            # vote_factor=1: distance from each gt vote to the (single) vote,
            # then min over gt votes
            dists = np.abs(gt - vote_xyz[b, s]).sum(-1)
            total += dists.min() * vm[b, seed_inds[b, s]]
            wsum += vm[b, seed_inds[b, s]]
    want = total / (wsum + 1e-6)
    assert abs(float(loss) - want) < 1e-5


def test_cap_loss_golden(rng):
    B, T, V = 3, 7, 11
    lang_len = np.array([5, 8, 3])  # max 8 -> num_words-1 = 7 steps
    lang_ids = rng.randint(1, V, (B, T + 1)).astype(np.int32)
    for b in range(B):
        lang_ids[b, lang_len[b]:] = 0
    logits = rng.randn(B, T, V).astype(np.float32)
    good = np.array([True, False, True])
    d = {
        "lang_cap": jnp.asarray(logits),
        "lang_ids": jnp.asarray(lang_ids),
        "lang_len": jnp.asarray(lang_len),
        "good_bbox_masks": jnp.asarray(good),
    }
    loss, acc = compute_cap_loss(d)

    # numpy golden replicating loss_helper.py:189-230
    num_words = lang_len.max()
    tgt = lang_ids[:, 1:num_words]
    ce = ce_np(logits[:, :num_words - 1], tgt)
    ce = ce * (tgt != 0)  # ignore_index=0
    gm = np.repeat(good[:, None], num_words - 1, 1)
    want = (ce * gm).sum() / (gm.sum() + 1e-6)
    assert abs(float(loss) - want) < 1e-5


def test_radian_to_label_bins():
    import torch
    radians = np.linspace(0, np.pi - 1e-4, 25).astype(np.float32)
    got = np.asarray(radian_to_label(jnp.asarray(radians), 6))
    boundaries = torch.arange(np.pi / 6, np.pi - 1e-8, np.pi / 6)
    want = torch.bucketize(torch.from_numpy(radians), boundaries).numpy()
    np.testing.assert_array_equal(got, want)
    assert got.min() == 0 and got.max() == 5


def test_end_to_end_loss_and_grads():
    cfg = ModelConfig(
        num_points=512, num_proposals=16, sa_npoints=(128, 64, 32, 16),
        max_num_obj=8, num_locals=4, use_topdown=True, use_relation=True,
        use_orientation=True, use_distance=True, num_graph_steps=2,
        min_iou=-1.0)  # untrained proposals never reach IoU>0.25; keep gate open
    vocab = make_vocab(num_vocabs=32)
    batch = make_scene_batch(cfg, batch_size=2, num_objects=3, vocab=vocab)
    d = {k: jnp.asarray(v) for k, v in batch.items()}
    model = CapNet(cfg, num_vocabs=32)
    # jit both stages: unjitted, this runs op-by-op (minutes of dispatch)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), d, train=False)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            d, use_tf=True, is_eval=False, train=True,
            mutable=["batch_stats"])
        out = get_scene_cap_loss(
            out, detection=True, caption=True, orientation=True, distance=True)
        return out["loss"], out

    (loss, out), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
    assert np.isfinite(float(loss))
    for k in ("vote_loss", "objectness_loss", "box_loss", "cap_loss",
              "ori_loss", "dist_loss", "obj_acc", "pos_ratio"):
        assert np.isfinite(float(out[k])), k
    # gradients reach every major submodule
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = {jax.tree_util.keystr(p).split("'")[1]
               for p, g in flat if float(jnp.abs(g).sum()) > 0}
    for sub in ("backbone_net", "vgen", "proposal", "graph", "caption"):
        assert sub in nonzero, f"no grads in {sub}"


def test_softmax_ranking_loss_golden(rng):
    # lib/loss.py SoftmaxRankingLoss: -mean_B sum_N log(softmax(x)+eps)*y
    from scan2cap_tpu.losses.ranking import softmax_ranking_loss

    x = rng.randn(4, 6).astype(np.float32)
    y = np.zeros((4, 6), np.float32)
    y[np.arange(4), rng.randint(0, 6, 4)] = 1.0
    y[0, 3] = 1.0                                 # multi-hot row
    ex = np.exp(x + 1e-8 - (x + 1e-8).max(1, keepdims=True))
    probs = ex / ex.sum(1, keepdims=True)
    want = float(np.mean(-np.sum(np.log(probs + 1e-8) * y, axis=1)))
    got = float(softmax_ranking_loss(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # gradient pushes the target logit up
    g = jax.grad(lambda a: softmax_ranking_loss(a, jnp.asarray(y)))(
        jnp.asarray(x))
    assert float(g[1, np.argmax(y[1])]) < 0
