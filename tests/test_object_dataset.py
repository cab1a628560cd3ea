"""Object-centric dataset + encoder + object cap loss tests."""

import numpy as np
import jax
import jax.numpy as jnp

from scan2cap_tpu.data.dataset_object import ScannetObjectDataset
from scan2cap_tpu.models.encoder import PointnetEncoder
from scan2cap_tpu.losses.total import get_object_cap_loss


def _dataset(tmp_path, rng, **kw):
    from tests.test_dataset import make_fixture_scene, make_fixture_glove
    make_fixture_scene(str(tmp_path), "scene0000_00", rng)
    glove = make_fixture_glove(["a", "chair"])
    scanrefer = [
        {"scene_id": "scene0000_00", "object_id": str(o), "ann_id": "0",
         "object_name": "chair", "token": ["a", "chair"]} for o in range(2)]
    return ScannetObjectDataset(
        scanrefer, ["scene0000_00"], scannet_data_dir=str(tmp_path),
        glove_path="", glove=glove, num_points=256, max_num_obj=4,
        use_height=True, **kw)


def test_object_dataset_single(tmp_path, rng):
    ds = _dataset(tmp_path, rng)
    d = ds.__getitem__(0, rs=np.random.RandomState(0))
    # xyz + height + mask channel
    assert d["point_clouds"].shape == (256, 5)
    assert d["point_clouds"][:, -1].max() == 1.0
    assert d["object_cat"] == 2  # chair
    assert d["lang_ids"][0] == 2


def test_object_dataset_whole_scene(tmp_path, rng):
    ds = _dataset(tmp_path, rng, whole_scene=True, is_eval=True)
    assert len(ds) == 1  # deduped by scene
    d = ds.__getitem__(0, rs=np.random.RandomState(0))
    assert d["point_clouds"].shape == (4, 256, 5)
    assert d["target_masks"].sum() == 3
    assert d["object_bbox_corners"].shape == (4, 8, 3)


def test_encoder_whole_scene_eval_only(rng):
    """whole_scene mode: eval forward works (masked per-object features);
    train mode fails loudly — train-mode BN would fold the zero-padded
    invalid crops into the batch statistics (the reference chunks over
    valid crops only, encoder_module.py:111-163)."""
    import pytest

    model = PointnetEncoder(input_feature_dim=2, whole_scene=True,
                            sa_npoints=(64, 32, 16, 8))
    pc = jnp.asarray(rng.rand(1, 3, 256, 5).astype(np.float32))
    batch = {"point_clouds": pc,
             "target_masks": jnp.asarray([[1, 1, 0]], jnp.int32)}
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    out = jax.jit(model.apply, static_argnames=("train",))(
        variables, batch, train=False)
    assert out["enc_features"].shape == (1, 3, 128)
    # invalid crop slots are zero-masked
    assert float(jnp.abs(out["enc_features"][0, 2]).max()) == 0.0
    assert float(jnp.abs(out["enc_features"][0, 0]).max()) > 0.0

    with pytest.raises(ValueError, match="eval/extraction-only"):
        model.init(jax.random.PRNGKey(0), batch, train=True)


def test_encoder_and_object_loss(tmp_path, rng):
    ds = _dataset(tmp_path, rng)
    samples = [ds.__getitem__(i, rs=np.random.RandomState(i)) for i in range(2)]
    batch = {k: jnp.asarray(np.stack([s[k] for s in samples]))
             for k in samples[0]}
    model = PointnetEncoder(input_feature_dim=2, num_classes=18,
                            sa_npoints=(64, 32, 16, 8))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    out = jax.jit(model.apply, static_argnames=("train",))(
        variables, batch, train=False)
    assert out["enc_features"].shape == (2, 128)
    assert out["enc_preds"].shape == (2, 18)

    out = get_object_cap_loss(out, classify=True, caption=False)
    assert np.isfinite(float(out["loss"]))
    assert 0.0 <= float(out["cls_acc"]) <= 1.0
