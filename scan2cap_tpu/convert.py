"""Torch checkpoint converter — load the reference's released ``.pth``
weights (pretrained/PRETRAIN_VOTENET_* and *_MASK_VOTENET, scripts/train.py:80-105
warm-start path) into this framework's Flax parameter tree.

Layout mapping (channels-last here vs torch channels-first):
  conv2d 1x1 (out,in,1,1) / conv1d 1 (out,in,1)  ->  Dense kernel (in,out)
  BN weight/bias/running_mean/running_var        ->  scale/bias + batch_stats
Module paths:
  backbone_net.sa{i}.mlp_module.layer{j}  -> backbone_net/sa{i}/mlp/{dense,bn}_{j}
  backbone_net.fp{i}.mlp.layer{j}         -> backbone_net/fp{i}/mlp/{dense,bn}_{j}
  vgen.conv{1,2,3} / bn{1,2}              -> vgen/conv{k} / bn{k}
  proposal.vote_aggregation.mlp_module    -> proposal/vote_aggregation/mlp
  proposal.proposal.{0,1,3,4,6}           -> proposal/{conv1,bn1,conv2,bn2,conv3}
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _load_state_dict(pth_path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(pth_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()
            if not k.endswith("num_batches_tracked")}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """(out, in, 1[, 1]) -> (in, out)."""
    return w.reshape(w.shape[0], w.shape[1]).T.copy()


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value, np.float32)


def _convert_shared_mlp(sd, prefix, params, stats, base):
    j = 0
    while f"{prefix}.layer{j}.conv.weight" in sd:
        _set(params, base + (f"dense_{j}", "kernel"),
             _conv_kernel(sd[f"{prefix}.layer{j}.conv.weight"]))
        if f"{prefix}.layer{j}.conv.bias" in sd:
            _set(params, base + (f"dense_{j}", "bias"),
                 sd[f"{prefix}.layer{j}.conv.bias"])
        bn = f"{prefix}.layer{j}.bn.bn"
        _set(params, base + (f"bn_{j}", "scale"), sd[bn + ".weight"])
        _set(params, base + (f"bn_{j}", "bias"), sd[bn + ".bias"])
        _set(stats, base + (f"bn_{j}", "mean"), sd[bn + ".running_mean"])
        _set(stats, base + (f"bn_{j}", "var"), sd[bn + ".running_var"])
        j += 1
    if j == 0:
        raise KeyError(f"no SharedMLP layers under {prefix}")


def _convert_bn(sd, prefix, params, stats, base):
    _set(params, base + ("scale",), sd[prefix + ".weight"])
    _set(params, base + ("bias",), sd[prefix + ".bias"])
    _set(stats, base + ("mean",), sd[prefix + ".running_mean"])
    _set(stats, base + ("var",), sd[prefix + ".running_var"])


def _convert_conv(sd, prefix, params, base):
    _set(params, base + ("kernel",), _conv_kernel(sd[prefix + ".weight"]))
    if prefix + ".bias" in sd:
        _set(params, base + ("bias",), sd[prefix + ".bias"])


def convert_votenet_checkpoint(pth_path: str) -> Tuple[dict, dict]:
    """Returns (params, batch_stats) subtrees for backbone_net/vgen/proposal —
    the detection modules the trainer mounts (scripts/train.py:82-105)."""
    sd = _load_state_dict(pth_path)
    params: dict = {}
    stats: dict = {}

    for i in (1, 2, 3, 4):
        _convert_shared_mlp(sd, f"backbone_net.sa{i}.mlp_module",
                            params, stats, ("backbone_net", f"sa{i}", "mlp"))
    for i in (1, 2):
        _convert_shared_mlp(sd, f"backbone_net.fp{i}.mlp",
                            params, stats, ("backbone_net", f"fp{i}", "mlp"))

    for k in (1, 2, 3):
        _convert_conv(sd, f"vgen.conv{k}", params, ("vgen", f"conv{k}"))
    for k in (1, 2):
        _convert_bn(sd, f"vgen.bn{k}", params, stats, ("vgen", f"bn{k}"))

    _convert_shared_mlp(sd, "proposal.vote_aggregation.mlp_module",
                        params, stats,
                        ("proposal", "vote_aggregation", "mlp"))
    _convert_conv(sd, "proposal.proposal.0", params, ("proposal", "conv1"))
    _convert_bn(sd, "proposal.proposal.1", params, stats, ("proposal", "bn1"))
    _convert_conv(sd, "proposal.proposal.3", params, ("proposal", "conv2"))
    _convert_bn(sd, "proposal.proposal.4", params, stats, ("proposal", "bn2"))
    _convert_conv(sd, "proposal.proposal.6", params, ("proposal", "conv3"))
    return params, stats


def mount_detection_weights(state, pth_path: str):
    """Warm-start a TrainState's detection submodules from a released
    VoteNet .pth (the reference mounts backbone/vgen/proposal by attribute
    assignment, scripts/train.py:100-105)."""
    conv_params, conv_stats = convert_votenet_checkpoint(pth_path)
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for sub in ("backbone_net", "vgen", "proposal"):
        if sub in conv_params:
            params[sub] = _merge(params.get(sub, {}), conv_params[sub])
            stats[sub] = _merge(stats.get(sub, {}), conv_stats.get(sub, {}))
    return state.replace(params=params, batch_stats=stats)


def _merge(dst, src):
    out = dict(dst)
    for k, v in src.items():
        out[k] = _merge(out[k], v) if (
            isinstance(v, dict) and isinstance(out.get(k), dict)) else v
    return out
