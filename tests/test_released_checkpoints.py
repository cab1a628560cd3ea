"""Converter coverage over the reference's RELEASED checkpoints.

The reference ships eight trained detector/extractor checkpoints
(/root/reference/pretrained/*/model.pth — the warm-starts its
scripts/train.py:80-105 and extract_*_features.py load).  These tests
convert each REAL file and export it back, asserting the round-trip is
bit-exact over every tensor — so the converter demonstrably covers every
key the released artifacts actually contain (dtype quirks, BN running
stats, num_batches_tracked), not just torch-initialized replicas.  The
full-chain OUTPUT parity on real weights lives in
test_convert_votenet_chain.py::test_released_checkpoint_chain_parity.
"""

import glob
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from scan2cap_tpu.convert import (convert_votenet_checkpoint,
                                  export_votenet_checkpoint)

RELEASED = sorted(glob.glob("/root/reference/pretrained/*/model.pth"))


@pytest.mark.skipif(not RELEASED, reason="released checkpoints not present")
@pytest.mark.parametrize("pth", RELEASED,
                         ids=[p.split("/")[-2] for p in RELEASED])
def test_released_checkpoint_round_trips_bit_exact(pth):
    params, stats = convert_votenet_checkpoint(pth)
    sd_back = export_votenet_checkpoint(params, stats)
    sd_ref = torch.load(pth, map_location="cpu")
    # detection tree only: drop keys outside backbone_net/vgen/proposal
    # (released files contain exactly these three modules today; a future
    # variant with extra heads should fail loudly below, not silently pass)
    ref_keys = {k for k in sd_ref
                if k.split(".")[0] in ("backbone_net", "vgen", "proposal")}
    assert ref_keys == set(sd_ref.keys()), sorted(
        set(sd_ref) - ref_keys)[:5]
    missing = ref_keys - set(sd_back.keys())
    extra = set(sd_back.keys()) - ref_keys
    assert not missing, sorted(missing)[:5]
    assert not extra, sorted(extra)[:5]
    for k in sorted(ref_keys):
        a = sd_ref[k].detach().cpu().numpy()
        b = sd_back[k].detach().cpu().numpy()
        if k.endswith("num_batches_tracked"):
            continue  # export restarts the counter; torch ignores it in eval
        np.testing.assert_array_equal(a, b, err_msg=k)


MASK_PTH = ("/root/reference/pretrained/"
            "XYZ_MULTIVIEW_NORMAL_MASK_VOTENET/model.pth")


@pytest.mark.skipif(not os.path.exists(MASK_PTH),
                    reason="released checkpoint not present")
def test_released_mask_votenet_mounts_and_runs():
    """The released GT-feature extractor (the --pth target of
    scripts/extract_gt_features.py) mounts into MaskVoteNet at the
    matching multiview+normal config (sa1 in-width 136 = 3 + height +
    normal + 128 multiview + 1 target-mask channel) and produces finite
    features/boxes on a synthetic masked scene."""
    import jax
    import jax.numpy as jnp

    from scan2cap_tpu.config import ModelConfig
    from scan2cap_tpu.convert import _merge, convert_votenet_checkpoint
    from scan2cap_tpu.data.synthetic import make_scene_batch, make_vocab
    from scan2cap_tpu.models.mask_votenet import MaskVoteNet

    cfg = ModelConfig(num_points=1024, sa_npoints=(256, 128, 64, 32),
                      num_proposals=1, max_num_obj=1, no_caption=True,
                      use_normal=True, use_multiview=True)
    vocab = make_vocab(num_vocabs=16, emb_size=300)
    batch = make_scene_batch(cfg, batch_size=1, num_objects=1, vocab=vocab,
                             seed=0)
    batch["point_clouds"] = np.concatenate(
        [batch["point_clouds"],
         np.zeros(batch["point_clouds"].shape[:-1] + (1,), np.float32)], -1)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = MaskVoteNet(cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False)
    cparams, cstats = convert_votenet_checkpoint(MASK_PTH)
    params = _merge(variables["params"], cparams)
    stats = _merge(variables["batch_stats"], cstats)
    out = jax.jit(model.apply, static_argnames=("train",))(
        {"params": params, "batch_stats": stats}, batch, train=False)
    for k in ("aggregated_vote_features", "center", "size_scores"):
        assert np.isfinite(np.asarray(out[k])).all(), k


FLAGSHIP_PTH = ("/root/reference/pretrained/"
                "PRETRAIN_VOTENET_XYZ_MULTIVIEW_NORMAL/model.pth")


@pytest.mark.skipif(not os.path.exists(FLAGSHIP_PTH),
                    reason="released checkpoint not present")
def test_released_flagship_variant_mounts_into_multiview_config():
    """The reference's flagship training recipe warm-starts CapNet from
    PRETRAIN_VOTENET_XYZ_MULTIVIEW_NORMAL (scripts/train.py:80-105 +
    slurm/train.job:24).  Mount the REAL released file into the matching
    multiview+normal config here (sa1 in-width 135 = 3 + height + normal
    + 128 multiview) and check the loaded detector produces finite,
    non-degenerate outputs.  test_convert.py covers the XYZ variant."""
    import jax
    import jax.numpy as jnp

    from scan2cap_tpu.config import Config, ModelConfig
    from scan2cap_tpu.convert import mount_detection_weights
    from scan2cap_tpu.data.synthetic import make_scene_batch, make_vocab
    from scan2cap_tpu.models import CapNet
    from scan2cap_tpu.train import create_train_state

    mcfg = ModelConfig(num_points=1024, num_proposals=32,
                       sa_npoints=(256, 128, 64, 32), max_num_obj=8,
                       use_normal=True, use_multiview=True,
                       no_caption=True)
    cfg = Config(model=mcfg)
    vocab = make_vocab(num_vocabs=16)
    batch = make_scene_batch(mcfg, batch_size=1, num_objects=3, vocab=vocab)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = CapNet(mcfg, num_vocabs=16)
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
    state = mount_detection_weights(state, FLAGSHIP_PTH)
    out = jax.jit(model.apply,
                  static_argnames=("use_tf", "is_eval", "train"))(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch, use_tf=True, is_eval=False, train=False)
    assert np.isfinite(np.asarray(out["objectness_scores"])).all()
    probs = jax.nn.softmax(out["objectness_scores"], -1)[..., 1]
    assert 0 < float(jnp.mean(probs)) < 1
