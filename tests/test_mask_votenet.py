"""MaskVoteNet model + loss + dataset tests."""

import numpy as np
import jax
import jax.numpy as jnp

from scan2cap_tpu.config import ModelConfig
from scan2cap_tpu.models.mask_votenet import MaskVoteNet
from scan2cap_tpu.losses.mask_votenet import get_mask_votenet_loss

TINY = ModelConfig(
    num_points=256, num_proposals=1, sa_npoints=(64, 32, 16, 16),
    max_num_obj=1, use_height=True)


def _batch(rng, B=2, N=256, in_dim=2):  # height + mask
    center = rng.rand(B, 3).astype(np.float32)
    size = (rng.rand(B, 3) * 0.5 + 0.3).astype(np.float32)
    pc = np.zeros((B, N, 3 + in_dim), np.float32)
    votes = np.zeros((B, N, 9), np.float32)
    for b in range(B):
        pts = center[b] + (rng.rand(N, 3).astype(np.float32) - 0.5) * size[b]
        pc[b, :, :3] = pts
        pc[b, :, -1] = 1.0  # mask channel
        c = 0.5 * (pts.min(0) + pts.max(0))
        votes[b] = np.tile(c - pts, (1, 3))
    sx = np.array([1, 1, -1, -1, 1, 1, -1, -1])
    sy = np.array([1, -1, -1, 1, 1, -1, -1, 1])
    sz = np.array([1, 1, 1, 1, -1, -1, -1, -1])
    corners = np.stack([size[:, 0:1] / 2 * sx, size[:, 1:2] / 2 * sy,
                        size[:, 2:3] / 2 * sz], -1) + center[:, None, :]
    from scan2cap_tpu.config import SCANNET_MEAN_SIZE_ARR
    cls = rng.randint(0, 18, B)
    return {
        "point_clouds": jnp.asarray(pc),
        "center_label": jnp.asarray(center[:, None, :]),
        "size_class_label": jnp.asarray(cls[:, None].astype(np.int32)),
        "size_residual_label": jnp.asarray(
            (size - SCANNET_MEAN_SIZE_ARR[cls])[:, None, :]),
        "sem_cls_label": jnp.asarray(cls[:, None].astype(np.int32)),
        "box_label_mask": jnp.ones((B, 1)),
        "vote_label": jnp.asarray(votes),
        "vote_label_mask": jnp.ones((B, N), jnp.int32),
        "bbox_corner_label": jnp.asarray(corners.astype(np.float32)),
    }


import pytest


@pytest.fixture(scope="module")
def tiny_mvn():
    """One compiled MaskVoteNet + batch shared across the model tests."""
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    model = MaskVoteNet(TINY)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    return model, variables, batch


def test_mask_votenet_forward_and_loss(tiny_mvn):
    model, variables, batch = tiny_mvn
    out = jax.jit(model.apply, static_argnames=("train",))(
        variables, batch, train=False)
    assert out["center"].shape == (2, 1, 3)
    assert out["size_scores"].shape == (2, 1, 18)
    assert out["sem_cls_scores"].shape == (2, 1, 18)
    assert "objectness_scores" not in out  # no objectness head

    out = jax.jit(get_mask_votenet_loss)(out)
    for k in ("loss", "vote_loss", "box_loss", "sem_cls_loss", "miou",
              "sem_cls_acc"):
        assert np.isfinite(float(out[k])), k
    assert 0.0 <= float(out["miou"]) <= 1.0


def test_mask_votenet_loss_decreases(tiny_mvn):
    import optax
    model, variables, batch = tiny_mvn
    # lr 5e-3 converges this overfit in half the steps of the original 1e-3
    # x 120 (measured curves: ratio 0.46 @60 steps vs 0.52 @120) — the scan
    # execution was ~20 s of suite wall clock on this 1-vCPU host
    tx = optax.adam(5e-3)
    opt_state = tx.init(variables["params"])

    def step(carry, _):
        params, batch_stats, opt_state = carry

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch,
                train=True, mutable=["batch_stats"])
            out = get_mask_votenet_loss(out)
            return out["loss"], mut["batch_stats"]
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), stats, opt_state2), loss

    # all steps in one lax.scan program: a per-step python loop pays
    # dispatch overhead per step and dominated this test's wall clock
    @jax.jit
    def run(params, stats, opt_state):
        _, losses = jax.lax.scan(step, (params, stats, opt_state), None,
                                 length=60)
        return losses

    losses = np.asarray(
        run(variables["params"], variables["batch_stats"], opt_state))
    # overfit smoke test: converges after the noisy early phase
    assert np.mean(losses[-10:]) < 0.7 * np.mean(losses[:10]), \
        (np.mean(losses[:10]), np.mean(losses[-10:]))


def test_mask_dataset(tmp_path, rng):
    from tests.test_dataset import make_fixture_scene, make_fixture_glove
    from scan2cap_tpu.data.dataset_maskvotenet import MaskScannetReferenceDataset

    make_fixture_scene(str(tmp_path), "scene0000_00", rng)
    glove = make_fixture_glove(["a", "chair"])
    scanrefer = [
        {"scene_id": "scene0000_00", "object_id": "0", "object_name": "chair",
         "ann_id": "0", "token": ["a", "chair"]},
        {"scene_id": "scene0000_00", "object_id": "0", "object_name": "chair",
         "ann_id": "1", "token": ["a", "chair"]},  # duplicate -> filtered
        {"scene_id": "scene0000_00", "object_id": "1", "object_name": "chair",
         "ann_id": "0", "token": ["a", "chair"]},
    ]
    ds = MaskScannetReferenceDataset(
        scanrefer, ["scene0000_00"], scannet_data_dir=str(tmp_path),
        glove_path="", glove=glove, num_points=512, use_height=True)
    assert len(ds) == 2  # deduped
    d = ds.__getitem__(0, rs=np.random.RandomState(0))
    # xyz + height + mask
    assert d["point_clouds"].shape == (512, 5)
    # at least MIN points on the object
    assert d["point_clouds"][:, -1].sum() >= 512 // 2
    assert d["vote_label_mask"].all()
    assert d["center_label"].shape == (1, 3)
    assert d["bbox_corner_label"].shape == (8, 3)
    # votes point at the masked-object center
    m = d["point_clouds"][:, -1] == 1
    pts = d["point_clouds"][m, :3]
    c = 0.5 * (pts.min(0) + pts.max(0))
    np.testing.assert_allclose(
        d["vote_label"][m, :3] + pts, np.broadcast_to(c, pts.shape), atol=1e-5)
