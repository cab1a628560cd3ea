"""Checkpoint-converter tests: load a released VoteNet .pth into the Flax
CapNet and verify layer-level parity against torch on CPU."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

PTH = "/root/reference/pretrained/PRETRAIN_VOTENET_XYZ/model.pth"
HAS_PTH = os.path.exists(PTH)


@pytest.mark.skipif(not HAS_PTH, reason="released checkpoint not present")
def test_convert_shapes_match_model():
    from scan2cap_tpu.config import Config, ModelConfig
    from scan2cap_tpu.convert import convert_votenet_checkpoint, mount_detection_weights
    from scan2cap_tpu.data.synthetic import make_scene_batch, make_vocab
    from scan2cap_tpu.models import CapNet
    from scan2cap_tpu.train import create_train_state

    # XYZ variant: height only (input_feature_dim = 1)
    mcfg = ModelConfig(num_points=1024, num_proposals=32,
                       sa_npoints=(256, 128, 64, 32), max_num_obj=8,
                       use_height=True, no_caption=True)
    cfg = Config(model=mcfg)
    vocab = make_vocab(num_vocabs=16)
    batch = make_scene_batch(mcfg, batch_size=1, num_objects=3, vocab=vocab)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = CapNet(mcfg, num_vocabs=16)
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))

    params, stats = convert_votenet_checkpoint(PTH)
    # every converted leaf matches the initialized model's shape
    flat_model = jax.tree_util.tree_flatten_with_path(state.params)[0]
    model_shapes = {jax.tree_util.keystr(p): v.shape for p, v in flat_model}
    flat_conv = jax.tree_util.tree_flatten_with_path(params)[0]
    n_checked = 0
    for p, v in flat_conv:
        key = jax.tree_util.keystr(p)
        assert key in model_shapes, f"unknown param {key}"
        assert model_shapes[key] == v.shape, (key, model_shapes[key], v.shape)
        n_checked += 1
    assert n_checked > 50

    state2 = mount_detection_weights(state, PTH)
    out = jax.jit(model.apply,
                  static_argnames=("use_tf", "is_eval", "train"))(
        {"params": state2.params, "batch_stats": state2.batch_stats},
        batch, use_tf=True, is_eval=False, train=False)
    assert np.isfinite(np.asarray(out["objectness_scores"])).all()
    # loaded head produces non-degenerate objectness on random scenes
    probs = jax.nn.softmax(out["objectness_scores"], -1)[..., 1]
    assert 0 < float(jnp.mean(probs)) < 1


@pytest.mark.skipif(not HAS_PTH, reason="released checkpoint not present")
def test_shared_mlp_matches_torch_with_converted_weights(rng):
    """sa1 SharedMLP forward == torch conv+BN eval forward, same weights."""
    import torch
    from scan2cap_tpu.convert import convert_votenet_checkpoint
    from scan2cap_tpu.models.layers import SharedMLP

    params, stats = convert_votenet_checkpoint(PTH)
    p = params["backbone_net"]["sa1"]["mlp"]
    s = stats["backbone_net"]["sa1"]["mlp"]

    x = rng.randn(2, 7, 5, 4).astype(np.float32)  # (B, npoint, nsample, 4)

    mlp = SharedMLP((64, 64, 128))
    variables = {"params": p, "batch_stats": s}
    got = np.asarray(mlp.apply(variables, jnp.asarray(x), train=False))

    sd = torch.load(PTH, map_location="cpu")
    t = torch.from_numpy(np.transpose(x.reshape(2, 35, 4), (0, 2, 1))
                         ).reshape(2, 4, 7, 5)
    for j in range(3):
        w = sd[f"backbone_net.sa1.mlp_module.layer{j}.conv.weight"]
        conv = torch.nn.Conv2d(w.shape[1], w.shape[0], 1, bias=False)
        conv.weight.data = w
        bn = torch.nn.BatchNorm2d(w.shape[0])
        bn.weight.data = sd[f"backbone_net.sa1.mlp_module.layer{j}.bn.bn.weight"]
        bn.bias.data = sd[f"backbone_net.sa1.mlp_module.layer{j}.bn.bn.bias"]
        bn.running_mean.data = sd[f"backbone_net.sa1.mlp_module.layer{j}.bn.bn.running_mean"]
        bn.running_var.data = sd[f"backbone_net.sa1.mlp_module.layer{j}.bn.bn.running_var"]
        bn.eval()
        with torch.no_grad():
            t = torch.relu(bn(conv(t)))
    want = np.transpose(t.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_export_votenet_round_trips(tmp_path):
    # Flax -> .pth (reference key layout) -> Flax must be the identity on
    # the detection modules; the forward mapping is itself validated against
    # torch goldens above, so the inverse inherits that contract
    import jax
    import jax.numpy as jnp
    from scan2cap_tpu.config import ModelConfig
    from scan2cap_tpu.models import CapNet
    from scan2cap_tpu.convert import (convert_votenet_checkpoint,
                                      export_votenet_checkpoint)
    from scan2cap_tpu.data.synthetic import make_scene_batch, make_vocab

    cfg = ModelConfig(num_points=1024, sa_npoints=(64, 32, 16, 8),
                      max_num_obj=8, no_caption=True)
    vocab = make_vocab(num_vocabs=32, emb_size=300)
    batch = make_scene_batch(cfg, batch_size=1, num_objects=2, vocab=vocab,
                             seed=0)
    model = CapNet(cfg, num_vocabs=32)
    variables = jax.jit(model.init,
                        static_argnames=("use_tf", "is_eval", "train"))(
        jax.random.PRNGKey(1),
        {k: jnp.asarray(v) for k, v in batch.items()},
        use_tf=True, is_eval=False, train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    out = str(tmp_path / "exported.pth")
    sd = export_votenet_checkpoint(params, stats, out)
    # the reference loads with strict state_dicts: BN buffers must be there
    assert "backbone_net.sa1.mlp_module.layer0.bn.bn.num_batches_tracked" in sd
    assert sd["vgen.conv1.weight"].shape[-1] == 1          # conv1d layout

    back_p, back_s = convert_votenet_checkpoint(out)
    for sub in ("backbone_net", "vgen", "proposal"):
        got = jax.tree_util.tree_leaves_with_path(back_p[sub])
        for path, leaf in got:
            want = params[sub]
            for k in path:
                want = want[k.key]
            np.testing.assert_array_equal(leaf, np.asarray(want),
                                          err_msg=f"{sub}{path}")
        got_s = jax.tree_util.tree_leaves_with_path(back_s.get(sub, {}))
        for path, leaf in got_s:
            want = stats[sub]
            for k in path:
                want = want[k.key]
            np.testing.assert_array_equal(leaf, np.asarray(want),
                                          err_msg=f"stats {sub}{path}")


def test_maskvotenet_pth_round_trip(tmp_path):
    # MaskVoteNet's torch tree shares VoteNet's module names and Sequential
    # indices (reference models/mask_votenet.py:145-166), so the VoteNet
    # converter pair must round-trip its (backbone/vgen/proposal) tree too —
    # this is the --pth path of scripts/extract_gt_features.py
    import jax
    import jax.numpy as jnp
    from scan2cap_tpu.config import ModelConfig
    from scan2cap_tpu.models.mask_votenet import MaskVoteNet
    from scan2cap_tpu.convert import (convert_votenet_checkpoint,
                                      export_votenet_checkpoint, _merge)
    from scan2cap_tpu.data.synthetic import make_scene_batch, make_vocab

    cfg = ModelConfig(num_points=1024, sa_npoints=(64, 32, 16, 8),
                      num_proposals=1, max_num_obj=1, no_caption=True)
    vocab = make_vocab(num_vocabs=16, emb_size=300)
    batch = make_scene_batch(cfg, batch_size=1, num_objects=1, vocab=vocab,
                             seed=0)
    batch["point_clouds"] = np.concatenate(
        [batch["point_clouds"],
         np.zeros(batch["point_clouds"].shape[:-1] + (1,), np.float32)], -1)
    model = MaskVoteNet(cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in batch.items()}, train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    out = str(tmp_path / "mvn.pth")
    export_votenet_checkpoint(params, stats, out)
    back_p, back_s = convert_votenet_checkpoint(out)
    merged_p = _merge(params, back_p)
    merged_s = _merge(stats, back_s)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(merged_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(stats),
                    jax.tree_util.tree_leaves(merged_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
