"""Whole-chain converted-VoteNet parity.

convert.py's layer-granular tests (test_convert.py) verify shapes and one
SharedMLP; this test asserts the actual warm-start contract
(/root/reference/scripts/train.py:80-105): a torch VoteNet state_dict with
the reference's key layout, converted and mounted, must produce the same
backbone → voting → proposal outputs end-to-end.

The torch replica consumes the SAME sampling/grouping indices as the Flax
model (recomputed with this repo's CUDA-parity-tested ops — see
tests/test_ops_*.py for the index-semantics goldens), so the comparison
isolates exactly what the converter maps: conv/BN/PReLU weights and their
layout.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from scan2cap_tpu.config import ModelConfig
from scan2cap_tpu.convert import _merge, convert_votenet_checkpoint
from scan2cap_tpu.models import CapNet
from scan2cap_tpu.ops import (
    ball_query, furthest_point_sample, gather_points, three_nn)
from scan2cap_tpu.ops.interpolate import interpolation_weights

B, N = 2, 512
SA_NPOINTS = (128, 64, 32, 16)
SA_RADII = (0.2, 0.4, 0.8, 1.2)
SA_NSAMPLES = (64, 32, 16, 16)
NUM_PROPOSAL = 32
NH, NS, NC = 1, 18, 18
OUT_CH = 2 + 3 + NH * 2 + NS * 4 + NC


class SharedMLPT(tnn.Module):
    """Reference SharedMLP key layout: layer{j}.conv + layer{j}.bn.bn."""

    def __init__(self, widths):
        super().__init__()
        self.n = len(widths) - 1
        for j in range(self.n):
            layer = tnn.Module()
            layer.conv = tnn.Conv2d(widths[j], widths[j + 1], 1, bias=False)
            bn_wrap = tnn.Module()
            bn_wrap.bn = tnn.BatchNorm2d(widths[j + 1])
            layer.bn = bn_wrap
            self.add_module(f"layer{j}", layer)

    def forward(self, x):
        for j in range(self.n):
            layer = getattr(self, f"layer{j}")
            x = F.relu(layer.bn.bn(layer.conv(x)))
        return x


def _named(**children):
    m = tnn.Module()
    for k, v in children.items():
        m.add_module(k, v)
    return m


def build_torch_votenet(in_feat_dim):
    model = tnn.Module()
    model.backbone_net = _named(
        sa1=_named(mlp_module=SharedMLPT([3 + in_feat_dim, 64, 64, 128])),
        sa2=_named(mlp_module=SharedMLPT([3 + 128, 128, 128, 256])),
        sa3=_named(mlp_module=SharedMLPT([3 + 256, 128, 128, 256])),
        sa4=_named(mlp_module=SharedMLPT([3 + 256, 128, 128, 256])),
        fp1=_named(mlp=SharedMLPT([256 + 256, 256, 256])),
        fp2=_named(mlp=SharedMLPT([256 + 256, 256, 256])),
    )
    model.vgen = _named(
        conv1=tnn.Conv1d(256, 256, 1), conv2=tnn.Conv1d(256, 256, 1),
        conv3=tnn.Conv1d(256, 3 + 256, 1),
        bn1=tnn.BatchNorm1d(256), bn2=tnn.BatchNorm1d(256))
    model.proposal = _named(
        vote_aggregation=_named(mlp_module=SharedMLPT([3 + 256, 128, 128, 128])),
        proposal=tnn.Sequential(
            tnn.Conv1d(128, 128, 1, bias=False), tnn.BatchNorm1d(128),
            tnn.ReLU(), tnn.Conv1d(128, 128, 1, bias=False),
            tnn.BatchNorm1d(128), tnn.ReLU(),
            tnn.Conv1d(128, OUT_CH, 1)))
    return model


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
        else:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
    model.load_state_dict(sd)


def _bidx(idx):
    return torch.arange(idx.shape[0])[:, None, None]


def sa_forward_t(mlp, xyz, feats, new_xyz, idx, radius):
    """xyz (B,N,3), feats (B,N,C)|None, idx (B,M,S) -> (B,M,outC)."""
    g_xyz = (xyz[_bidx(idx), idx] - new_xyz[:, :, None, :]) / radius
    grouped = (torch.cat([g_xyz, feats[_bidx(idx), idx]], -1)
               if feats is not None else g_xyz)
    out = mlp(grouped.permute(0, 3, 1, 2))        # (B,C',M,S)
    return out.max(-1).values.permute(0, 2, 1)    # (B,M,outC)


def fp_forward_t(mlp, skip_feats, known_feats, idx, weight):
    """known_feats (B,m,C), idx/weight (B,n,3) -> (B,n,outC)."""
    interp = (known_feats[_bidx(idx), idx] * weight[..., None]).sum(2)
    cat = torch.cat([interp, skip_feats], -1)      # interp first, fp:393-401
    out = mlp(cat.permute(0, 2, 1)[..., None])
    return out.squeeze(-1).permute(0, 2, 1)


RELEASED_PTH = "/root/reference/pretrained/PRETRAIN_VOTENET_XYZ/model.pth"


def test_converted_votenet_chain_parity(tmp_path):
    cfg = ModelConfig(
        num_points=N, num_proposals=NUM_PROPOSAL, sa_npoints=SA_NPOINTS,
        no_caption=True, num_graph_steps=0,
        use_normal=True, use_multiview=True)
    tmodel = build_torch_votenet(cfg.input_feature_dim)
    _randomize(tmodel)
    path = tmp_path / "votenet.pth"
    torch.save(tmodel.state_dict(), str(path))
    _chain_parity(cfg, tmodel, str(path))


@pytest.mark.skipif(not os.path.exists(RELEASED_PTH),
                    reason="released checkpoint not present")
def test_released_checkpoint_chain_parity():
    """Same chain comparison, but with the REAL released detector
    (reference pretrained/PRETRAIN_VOTENET_XYZ — the warm-start the
    reference's scripts/train.py:80-105 loads): trained weights and
    BN running statistics, not synthetic ones, through both frameworks.
    Weight shapes are npoint-independent, so the tiny eval shapes stand
    in for the canonical ones."""
    cfg = ModelConfig(num_points=N, num_proposals=NUM_PROPOSAL,
                      sa_npoints=SA_NPOINTS, no_caption=True,
                      num_graph_steps=0)  # defaults = height-only: XYZ ckpt
    tmodel = build_torch_votenet(cfg.input_feature_dim)
    tmodel.load_state_dict(torch.load(RELEASED_PTH, map_location="cpu"))
    _chain_parity(cfg, tmodel, RELEASED_PTH)


def _chain_parity(cfg, tmodel, path):
    in_feat = cfg.input_feature_dim

    rng = np.random.RandomState(3)
    pc = np.concatenate([
        rng.uniform(-2, 2, (B, N, 3)),
        rng.randn(B, N, in_feat) * 0.1], -1).astype(np.float32)

    tmodel.eval()

    # ---- flax side: init, mount converted weights, forward ----
    model = CapNet(cfg)
    batch = {"point_clouds": jnp.asarray(pc)}
    variables = jax.jit(model.init,
                        static_argnames=("use_tf", "is_eval", "train"))(
        jax.random.PRNGKey(0), batch, use_tf=False, is_eval=True, train=False)
    cparams, cstats = convert_votenet_checkpoint(str(path))
    params = _merge(variables["params"], cparams)
    stats = _merge(variables["batch_stats"], cstats)
    d = jax.jit(model.apply,
                static_argnames=("use_tf", "is_eval", "train"))(
        {"params": params, "batch_stats": stats}, batch,
        use_tf=False, is_eval=True, train=False)

    # ---- torch side: same op indices, reference-order compute ----
    xyz_j = jnp.asarray(pc[..., :3])
    feats_t = torch.from_numpy(pc[..., 3:]) if in_feat else None
    xyz_t = torch.from_numpy(pc[..., :3])

    with torch.no_grad():
        cur_xyz_j, cur_feats_t = xyz_j, feats_t
        cur_xyz_t = xyz_t
        sa_mods = [tmodel.backbone_net.sa1.mlp_module,
                   tmodel.backbone_net.sa2.mlp_module,
                   tmodel.backbone_net.sa3.mlp_module,
                   tmodel.backbone_net.sa4.mlp_module]
        sa_out = []
        for i in range(4):
            inds = furthest_point_sample(cur_xyz_j, SA_NPOINTS[i])
            new_xyz_j = gather_points(cur_xyz_j, inds)
            idx = ball_query(cur_xyz_j, new_xyz_j, SA_RADII[i], SA_NSAMPLES[i])
            new_xyz_t = torch.from_numpy(np.asarray(new_xyz_j))
            idx_t = torch.from_numpy(np.asarray(idx)).long()
            feats = sa_forward_t(sa_mods[i], cur_xyz_t, cur_feats_t,
                                 new_xyz_t, idx_t, SA_RADII[i])
            sa_out.append((new_xyz_j, new_xyz_t, feats))
            cur_xyz_j, cur_xyz_t, cur_feats_t = new_xyz_j, new_xyz_t, feats

        # FP1: sa3 <- sa4; FP2: sa2 <- fp1
        def fp(mlp, un_j, kn_j, skip_t, kn_t):
            dist, idx = three_nn(un_j, kn_j)
            w = interpolation_weights(dist)
            return fp_forward_t(mlp, skip_t,
                                kn_t, torch.from_numpy(np.asarray(idx)).long(),
                                torch.from_numpy(np.asarray(w)))

        fp1 = fp(tmodel.backbone_net.fp1.mlp, sa_out[2][0], sa_out[3][0],
                 sa_out[2][2], sa_out[3][2])
        fp2 = fp(tmodel.backbone_net.fp2.mlp, sa_out[1][0], sa_out[2][0],
                 sa_out[1][2], fp1)

        np.testing.assert_allclose(np.asarray(d["fp2_features"]),
                                   fp2.numpy(), atol=1e-4, rtol=1e-3)

        # voting (voting_module.py:33-60) + L2 norm (capnet.py:96-98)
        v = fp2.permute(0, 2, 1)
        v1 = F.relu(tmodel.vgen.bn1(tmodel.vgen.conv1(v)))
        v2 = F.relu(tmodel.vgen.bn2(tmodel.vgen.conv2(v1)))
        net = tmodel.vgen.conv3(v2).permute(0, 2, 1)       # (B,S,3+256)
        vote_xyz_t = sa_out[1][1] + net[..., :3]
        vote_feats_t = fp2 + net[..., 3:]
        vote_feats_t = vote_feats_t / vote_feats_t.norm(dim=-1, keepdim=True)

        np.testing.assert_allclose(np.asarray(d["vote_xyz"]),
                                   vote_xyz_t.numpy(), atol=1e-4, rtol=1e-3)

        # vote aggregation + head, indices from the flax-produced votes
        vote_xyz_j = jnp.asarray(vote_xyz_t.numpy())
        agg_inds = furthest_point_sample(vote_xyz_j, NUM_PROPOSAL)
        agg_xyz_j = gather_points(vote_xyz_j, agg_inds)
        vidx = ball_query(vote_xyz_j, agg_xyz_j, 0.3, 16)
        agg_feats = sa_forward_t(
            tmodel.proposal.vote_aggregation.mlp_module, vote_xyz_t,
            vote_feats_t, torch.from_numpy(np.asarray(agg_xyz_j)),
            torch.from_numpy(np.asarray(vidx)).long(), 0.3)
        head = tmodel.proposal.proposal(agg_feats.permute(0, 2, 1))
        head = head.permute(0, 2, 1).numpy()               # (B,K,OUT_CH)

    np.testing.assert_allclose(np.asarray(d["aggregated_vote_xyz"]),
                               np.asarray(agg_xyz_j), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d["objectness_scores"]),
                               head[..., 0:2], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(d["center"]),
        np.asarray(agg_xyz_j) + head[..., 2:5], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d["heading_scores"]),
                               head[..., 5:5 + NH], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d["size_scores"]),
                               head[..., 5 + 2 * NH:5 + 2 * NH + NS],
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(d["size_residuals_normalized"]).reshape(B, NUM_PROPOSAL, -1),
        head[..., 5 + 2 * NH + NS:5 + 2 * NH + 4 * NS], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(d["sem_cls_scores"]),
                               head[..., 5 + 2 * NH + 4 * NS:],
                               atol=1e-3, rtol=1e-3)
