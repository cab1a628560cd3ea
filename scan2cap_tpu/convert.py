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

from typing import Dict, Optional, Tuple

import numpy as np


def _load_state_dict(pth) -> Dict[str, np.ndarray]:
    """Load a ``.pth`` path — or pass through an already-loaded dict, so
    callers that probe the keys first (scripts/eval.py's caption-vs-
    detection sniff) don't deserialize a multi-hundred-MB file twice."""
    if isinstance(pth, dict):
        return pth
    import torch
    sd = torch.load(pth, map_location="cpu")
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
    return _convert_detection_tree(_load_state_dict(pth_path))


def _convert_detection_tree(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
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


# ---------------------------------------------------------------------------
# Full CapNet: graph + caption modules (the model.pth the reference's eval
# and benchmark paths load — scripts/eval.py:106-108, benchmark/predict.py:102)
# ---------------------------------------------------------------------------


def _convert_linear(sd, prefix, params, base):
    """torch nn.Linear weight (out, in) -> Dense kernel (in, out)."""
    _set(params, base + ("kernel",),
         np.ascontiguousarray(sd[prefix + ".weight"].T))
    if prefix + ".bias" in sd:
        _set(params, base + ("bias",), sd[prefix + ".bias"])


def _convert_gru(sd, prefix, params, base):
    """torch nn.GRUCell -> models/layers.GRUCell (ih/hh Dense pairs).

    Both sides fuse the three gates on the output axis in the same (r, z, n)
    order (torch.nn.GRUCell docs; models/layers.py GRUCell), so the fused
    matrices transpose directly."""
    _set(params, base + ("ih", "kernel"), sd[prefix + ".weight_ih"].T)
    _set(params, base + ("ih", "bias"), sd[prefix + ".bias_ih"])
    _set(params, base + ("hh", "kernel"), sd[prefix + ".weight_hh"].T)
    _set(params, base + ("hh", "bias"), sd[prefix + ".bias_hh"])


def convert_graph_module(sd: Dict[str, np.ndarray], params: dict) -> int:
    """GraphModule weights (reference models/graph_module.py:132-152):
    ``graph.gc_layers.{i}`` is an EdgeConv (map_edge Sequential, Linear at
    indices 0 and 2) or a torch_geometric GCNConv (``lin`` + separate
    ``bias``); ``graph.edge_layer``/``graph.edge_predict`` exist when
    return_orientation.  Returns the number of graph layers found."""
    i = 0
    while True:
        base = ("graph", f"gc_{i}")
        if f"graph.gc_layers.{i}.map_edge.0.weight" in sd:       # EdgeConv
            _convert_linear(sd, f"graph.gc_layers.{i}.map_edge.0",
                            params, base + ("map_edge_0",))
            _convert_linear(sd, f"graph.gc_layers.{i}.map_edge.2",
                            params, base + ("map_edge_1",))
        elif f"graph.gc_layers.{i}.lin.weight" in sd:            # GCNConv
            _convert_linear(sd, f"graph.gc_layers.{i}.lin",
                            params, base + ("lin",))
            out = sd[f"graph.gc_layers.{i}.lin.weight"].shape[0]
            # PyG's internal lin carries no bias; GCNConvDense's does
            _set(params, base + ("lin", "bias"), np.zeros(out, np.float32))
            _set(params, base + ("bias",),
                 sd[f"graph.gc_layers.{i}.bias"])
        elif f"graph.gc_layers.{i}.weight" in sd:
            # legacy torch_geometric (<=1.6, the reference's era) stored
            # GCNConv.weight directly as (in_channels, out_channels)
            w = sd[f"graph.gc_layers.{i}.weight"]
            _set(params, base + ("lin", "kernel"), w)
            _set(params, base + ("lin", "bias"),
                 np.zeros(w.shape[1], np.float32))
            _set(params, base + ("bias",),
                 sd[f"graph.gc_layers.{i}.bias"])
        else:
            break
        i += 1
    if i == 0:
        raise KeyError("no graph.gc_layers.* in state_dict")
    if "graph.edge_layer.map_edge.0.weight" in sd:
        _convert_linear(sd, "graph.edge_layer.map_edge.0",
                        params, ("graph", "edge_layer", "map_edge_0"))
        _convert_linear(sd, "graph.edge_layer.map_edge.2",
                        params, ("graph", "edge_layer", "map_edge_1"))
        _convert_linear(sd, "graph.edge_predict",
                        params, ("graph", "edge_predict"))
    return i


def convert_caption_module(sd: Dict[str, np.ndarray], params: dict) -> str:
    """Caption decoder weights: TopDownSceneCaptionModule
    (reference models/caption_module.py:225-248) or the plain
    SceneCaptionModule (caption_module.py:40-65), detected by key presence.
    Returns which variant was found ("topdown" | "scene")."""
    if "caption.map_topdown.0.weight" in sd:
        _convert_linear(sd, "caption.map_topdown.0",
                        params, ("caption", "map_topdown"))
        _convert_gru(sd, "caption.recurrent_cell_1",
                     params, ("caption", "recurrent_cell_1"))
        for name in ("map_feat", "map_hidd", "attend"):
            _convert_linear(sd, f"caption.{name}", params, ("caption", name))
        _convert_linear(sd, "caption.map_lang.0",
                        params, ("caption", "map_lang"))
        _convert_gru(sd, "caption.recurrent_cell_2",
                     params, ("caption", "recurrent_cell_2"))
        variant = "topdown"
    elif "caption.map_feat.0.weight" in sd:
        _convert_linear(sd, "caption.map_feat.0",
                        params, ("caption", "map_feat"))
        _convert_gru(sd, "caption.recurrent_cell",
                     params, ("caption", "recurrent_cell"))
        variant = "scene"
    else:
        raise KeyError("no caption.* module in state_dict")
    _convert_linear(sd, "caption.classifier", params, ("caption", "classifier"))
    return variant


def convert_capnet_checkpoint(pth_path: str,
                              num_vocabs_padded: Optional[int] = None
                              ) -> Tuple[dict, dict]:
    """Full Scan2Cap ``model.pth`` -> (params, batch_stats) for CapNet:
    detection (backbone_net/vgen/proposal) + graph + caption, each converted
    when present (scripts/eval.py:106-108 loads exactly this artifact; a
    --no_caption or num_graph_steps=0 checkpoint simply lacks those keys).

    ``num_vocabs_padded``: zero-pad the caption classifier to this width so
    the tree loads into a vocab-padded CapNet (num_vocabs_padded; the pad
    columns are inert — caption._mask_pad_logits)."""
    sd = _load_state_dict(pth_path)
    params, stats = _convert_detection_tree(sd)
    if any(k.startswith("graph.") for k in sd):
        convert_graph_module(sd, params)
    if any(k.startswith("caption.") for k in sd):
        convert_caption_module(sd, params)
        if num_vocabs_padded:
            params = pad_caption_classifier(params, num_vocabs_padded)
    return params, stats


def pad_caption_classifier(params: dict, num_vocabs_padded: int) -> dict:
    """Zero-pad the caption classifier's output dim to ``num_vocabs_padded``
    (a TP-friendly width from parallel.padded_vocab) so an unpadded
    checkpoint loads into a vocab-padded model.  Zero pad columns produce
    logit 0, which caption._mask_pad_logits overwrites with -1e30, so the
    padded model's loss and eval tokens match the unpadded model up to f32
    reassociation of the widened classifier gemm (last-ulp).  Returns a new
    tree (input params are not mutated)."""
    cap = params.get("caption")
    if not cap or "classifier" not in cap:
        raise KeyError("params carry no caption.classifier")
    k = np.asarray(cap["classifier"]["kernel"])
    b = np.asarray(cap["classifier"]["bias"])
    v = k.shape[1]
    if num_vocabs_padded < v:
        raise ValueError(f"num_vocabs_padded={num_vocabs_padded} < "
                         f"classifier width {v}")
    if num_vocabs_padded == v:
        return params
    pk = np.zeros((k.shape[0], num_vocabs_padded), k.dtype)
    pk[:, :v] = k
    pb = np.zeros((num_vocabs_padded,), b.dtype)
    pb[:v] = b
    out = dict(params)
    out["caption"] = dict(cap)
    out["caption"]["classifier"] = {"kernel": pk, "bias": pb}
    return out


def slice_caption_classifier(params: dict, num_vocabs: int) -> dict:
    """Inverse of pad_caption_classifier: cut a vocab-padded run's classifier
    back to the real vocabulary width (for export to the reference layout or
    for loading into an unpadded model).  Returns a new tree."""
    cap = params.get("caption")
    if not cap or "classifier" not in cap:
        raise KeyError("params carry no caption.classifier")
    k = np.asarray(cap["classifier"]["kernel"])
    b = np.asarray(cap["classifier"]["bias"])
    if num_vocabs > k.shape[1]:
        raise ValueError(f"num_vocabs={num_vocabs} > "
                         f"classifier width {k.shape[1]}")
    out = dict(params)
    out["caption"] = dict(cap)
    out["caption"]["classifier"] = {"kernel": np.ascontiguousarray(k[:, :num_vocabs]),
                                    "bias": np.ascontiguousarray(b[:num_vocabs])}
    return out


# ---------------------------------------------------------------------------
# ENet (scannetv2_enet.pth) — the multiview-feature trunk
# ---------------------------------------------------------------------------
#
# The reference rebuilds a torch7-exported ENet as a flat nn.Sequential of 27
# top-level modules (lib/enet.py:130-694) and create_enet_for_3d truncates it
# into fixed(0-17) + trainable(18-25) + classifier(26) (enet.py:697-715).
# state_dict key layout (Lambda* subclasses nn.Sequential, so children are
# named by index):
#   0.0.{weight,bias}       initial 3->13 conv        (branch 1 = maxpool)
#   2.* / 3.weight          initial BN(16) / PReLU(16)
#   m in 4..25: one bottleneck each —
#     m.0.0.0.weight        proj conv (1x1, or 2x2/2 when downsampling), no bias
#     m.0.0.1.* / 2.weight  bn1 / prelu1
#     regular/dilated:  m.0.0.3.{weight,bias} core 3x3 conv (HAS bias),
#                       m.0.0.4.* bn2, 5 prelu2, 6 expand, 7 bn3
#     asymmetric:       m.0.0.3.weight 1x5 conv (no bias),
#                       m.0.0.4.{weight,bias} 5x1 conv (HAS bias),
#                       m.0.0.5.* bn2, 6 prelu2, 7 expand, 8 bn3
#     m.2.weight            prelu_out
#   26.0.weight             1x1 classifier conv, no bias
#
# This framework's ENet keeps every pre-BN conv bias-free: a constant bias
# feeding a BatchNorm is a no-op in train mode (the batch mean absorbs it)
# and equals shifting running_mean in eval mode — so the converter folds
# torch's core-conv biases into the following BN's running_mean exactly.

# (dilation, asym) sequence of stages 2 and 3 (mirrors models/enet.py)
_ENET_STAGE2 = [(1, 0), (2, 0), (1, 5), (4, 0), (1, 0), (8, 0), (1, 5), (16, 0)]


def _conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    return np.transpose(w, (2, 3, 1, 0)).copy()


def _convert_bn_folded(sd, prefix, params, stats, base, fold_bias=None):
    _set(params, base + ("scale",), sd[prefix + ".weight"])
    _set(params, base + ("bias",), sd[prefix + ".bias"])
    mean = sd[prefix + ".running_mean"]
    if fold_bias is not None:
        mean = mean - fold_bias
    _set(stats, base + ("mean",), mean)
    _set(stats, base + ("var",), sd[prefix + ".running_var"])


def convert_enet_checkpoint(pth_path: str, include_classifier: bool = False
                            ) -> Tuple[dict, dict]:
    """Map the reference's scannetv2_enet.pth onto ENetEncoder (or, with
    ``include_classifier``, ENetClassifier) — returns (params, batch_stats)."""
    sd = _load_state_dict(pth_path)
    params: dict = {}
    stats: dict = {}

    _set(params, ("initial", "conv", "kernel"), _conv2d_kernel(sd["0.0.weight"]))
    _set(params, ("initial", "conv", "bias"), sd["0.0.bias"])
    _convert_bn_folded(sd, "2", params, stats, ("initial", "bn"))
    _set(params, ("initial", "prelu", "alpha"), sd["3.weight"])

    blocks = [(4 + i, f"b1_{i}", False) for i in range(5)]
    blocks += [(9, "b2_0", False)]
    blocks += [(10 + i, f"b2_{i + 1}", asym != 0)
               for i, (_, asym) in enumerate(_ENET_STAGE2)]
    blocks += [(18 + i, f"b3_{i + 1}", asym != 0)
               for i, (_, asym) in enumerate(_ENET_STAGE2)]

    for m, name, asym in blocks:
        pre = f"{m}.0.0"
        base = (name,)
        _set(params, base + ("proj", "kernel"),
             _conv2d_kernel(sd[f"{pre}.0.weight"]))
        _convert_bn_folded(sd, f"{pre}.1", params, stats, base + ("bn1",))
        _set(params, base + ("prelu1", "alpha"), sd[f"{pre}.2.weight"])
        if asym:
            _set(params, base + ("conv_a", "kernel"),
                 _conv2d_kernel(sd[f"{pre}.3.weight"]))
            _set(params, base + ("conv_b", "kernel"),
                 _conv2d_kernel(sd[f"{pre}.4.weight"]))
            core_bias = sd.get(f"{pre}.4.bias")
            off = 1
        else:
            _set(params, base + ("conv", "kernel"),
                 _conv2d_kernel(sd[f"{pre}.3.weight"]))
            core_bias = sd.get(f"{pre}.3.bias")
            off = 0
        _convert_bn_folded(sd, f"{pre}.{4 + off}", params, stats,
                           base + ("bn2",), fold_bias=core_bias)
        _set(params, base + ("prelu2", "alpha"), sd[f"{pre}.{5 + off}.weight"])
        _set(params, base + ("expand", "kernel"),
             _conv2d_kernel(sd[f"{pre}.{6 + off}.weight"]))
        _convert_bn_folded(sd, f"{pre}.{7 + off}", params, stats,
                           base + ("bn3",))
        _set(params, base + ("prelu_out", "alpha"), sd[f"{m}.2.weight"])

    if include_classifier:
        cls_kernel = _conv2d_kernel(sd["26.0.weight"])
        params = {"encoder": params, "classifier": {"kernel": cls_kernel}}
        stats = {"encoder": stats}
    return params, stats


def mount_capnet_weights(state, pth_path: str):
    """Mount a FULL Scan2Cap ``model.pth`` (detection + graph + caption)
    onto a TrainState — the artifact the reference's eval/benchmark load
    (scripts/eval.py:106-108, benchmark/predict.py:102)."""
    conv_params, conv_stats = convert_capnet_checkpoint(pth_path)
    params = _merge(dict(state.params), conv_params)
    stats = _merge(dict(state.batch_stats), conv_stats)
    return state.replace(params=params, batch_stats=stats)


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


# ---------------------------------------------------------------------------
# Reverse direction: Flax -> reference .pth (migration path back)
# ---------------------------------------------------------------------------


def _get(tree: dict, path: Tuple[str, ...]):
    return np.asarray(_get_node(tree, path))


def _dense_to_conv(k: np.ndarray, conv1d: bool) -> np.ndarray:
    """Dense kernel (in, out) -> torch conv weight (out, in, 1[, 1])."""
    w = np.ascontiguousarray(k.T)
    return w[..., None] if conv1d else w[..., None, None]


def export_votenet_checkpoint(params: dict, batch_stats: dict,
                              out_path: Optional[str] = None) -> dict:
    """Inverse of convert_votenet_checkpoint: emit the detection modules
    (backbone_net/vgen/proposal) as a torch state_dict in the reference's
    exact key layout (scripts/train.py:80-105 warm-start contract), so a
    model trained here can be loaded by the reference (or by this repo's
    own --use_pretrained path).  Returns the state_dict; writes it with
    torch.save when ``out_path`` is given.
    """
    import torch

    sd: dict = {}

    def put(key, arr, conv=None):
        a = np.asarray(arr, np.float32)
        if conv is not None:
            a = _dense_to_conv(a, conv1d=(conv == "1d"))
        sd[key] = torch.from_numpy(np.ascontiguousarray(a).copy())

    def put_mlp(prefix, base):
        j = 0
        while f"dense_{j}" in _get_node(params, base):
            put(f"{prefix}.layer{j}.conv.weight",
                _get(params, base + (f"dense_{j}", "kernel")), conv="2d")
            leaf = _get_node(params, base)[f"dense_{j}"]
            if "bias" in leaf:
                put(f"{prefix}.layer{j}.conv.bias", leaf["bias"])
            bn = f"{prefix}.layer{j}.bn.bn"
            put(bn + ".weight", _get(params, base + (f"bn_{j}", "scale")))
            put(bn + ".bias", _get(params, base + (f"bn_{j}", "bias")))
            put(bn + ".running_mean",
                _get(batch_stats, base + (f"bn_{j}", "mean")))
            put(bn + ".running_var",
                _get(batch_stats, base + (f"bn_{j}", "var")))
            sd[bn + ".num_batches_tracked"] = torch.zeros((), dtype=torch.long)
            j += 1

    def put_bn(prefix, base):
        put(prefix + ".weight", _get(params, base + ("scale",)))
        put(prefix + ".bias", _get(params, base + ("bias",)))
        put(prefix + ".running_mean", _get(batch_stats, base + ("mean",)))
        put(prefix + ".running_var", _get(batch_stats, base + ("var",)))
        sd[prefix + ".num_batches_tracked"] = torch.zeros((), dtype=torch.long)

    def put_conv(prefix, base):
        leaf = _get_node(params, base)
        put(prefix + ".weight", leaf["kernel"], conv="1d")
        if "bias" in leaf:
            put(prefix + ".bias", leaf["bias"])

    for i in (1, 2, 3, 4):
        put_mlp(f"backbone_net.sa{i}.mlp_module",
                ("backbone_net", f"sa{i}", "mlp"))
    for i in (1, 2):
        put_mlp(f"backbone_net.fp{i}.mlp", ("backbone_net", f"fp{i}", "mlp"))
    for k in (1, 2, 3):
        put_conv(f"vgen.conv{k}", ("vgen", f"conv{k}"))
    for k in (1, 2):
        put_bn(f"vgen.bn{k}", ("vgen", f"bn{k}"))
    put_mlp("proposal.vote_aggregation.mlp_module",
            ("proposal", "vote_aggregation", "mlp"))
    put_conv("proposal.proposal.0", ("proposal", "conv1"))
    put_bn("proposal.proposal.1", ("proposal", "bn1"))
    put_conv("proposal.proposal.3", ("proposal", "conv2"))
    put_bn("proposal.proposal.4", ("proposal", "bn2"))
    put_conv("proposal.proposal.6", ("proposal", "conv3"))

    if out_path is not None:
        torch.save(sd, out_path)
    return sd


def export_capnet_checkpoint(params: dict, batch_stats: dict,
                             out_path: Optional[str] = None,
                             num_vocabs: Optional[int] = None) -> dict:
    """Inverse of convert_capnet_checkpoint: emit a FULL ``model.pth``
    (detection + graph + caption) in the reference's exact key layout, so a
    model trained here can be loaded by the reference's eval/benchmark
    scripts (scripts/eval.py:106-108, benchmark/predict.py:102).

    ``num_vocabs``: when exporting a vocab-padded run (CapNet
    num_vocabs_padded), pass the real vocabulary size to slice the inert pad
    columns off the classifier so the .pth matches the reference width."""
    import torch

    if num_vocabs is not None and "caption" in params:
        params = slice_caption_classifier(params, num_vocabs)

    sd = (export_votenet_checkpoint(params, batch_stats)
          if "backbone_net" in params else {})

    def put_linear(prefix, base):
        leaf = _get_node(params, base)
        w = np.ascontiguousarray(np.asarray(leaf["kernel"], np.float32).T)
        sd[prefix + ".weight"] = torch.from_numpy(w.copy())
        if "bias" in leaf:
            sd[prefix + ".bias"] = torch.from_numpy(
                np.asarray(leaf["bias"], np.float32).copy())

    def put_gru(prefix, base):
        for half in ("ih", "hh"):
            leaf = _get_node(params, base + (half,))
            sd[f"{prefix}.weight_{half}"] = torch.from_numpy(
                np.ascontiguousarray(np.asarray(leaf["kernel"], np.float32).T)
                .copy())
            sd[f"{prefix}.bias_{half}"] = torch.from_numpy(
                np.asarray(leaf["bias"], np.float32).copy())

    graph = params.get("graph", {})
    i = 0
    while f"gc_{i}" in graph:
        layer = graph[f"gc_{i}"]
        if "map_edge_0" in layer:                                 # EdgeConv
            put_linear(f"graph.gc_layers.{i}.map_edge.0",
                       ("graph", f"gc_{i}", "map_edge_0"))
            put_linear(f"graph.gc_layers.{i}.map_edge.2",
                       ("graph", f"gc_{i}", "map_edge_1"))
        else:                                                     # GCNConv
            # PyG's internal lin is bias-free: a nonzero Dense bias here
            # passes through the (input-dependent) degree normalization and
            # cannot be folded into GCNConv's post-norm bias exactly.
            lin_bias = np.asarray(layer["lin"].get("bias", np.zeros(1)))
            if np.abs(lin_bias).max() > 1e-6:
                raise ValueError(
                    f"graph.gc_{i}.lin has a nonzero bias; torch_geometric "
                    "GCNConv has no pre-normalization bias to map it onto")
            w = np.ascontiguousarray(
                np.asarray(layer["lin"]["kernel"], np.float32).T)
            sd[f"graph.gc_layers.{i}.lin.weight"] = torch.from_numpy(w.copy())
            sd[f"graph.gc_layers.{i}.bias"] = torch.from_numpy(
                np.asarray(layer["bias"], np.float32).copy())
        i += 1
    if "edge_layer" in graph:
        put_linear("graph.edge_layer.map_edge.0",
                   ("graph", "edge_layer", "map_edge_0"))
        put_linear("graph.edge_layer.map_edge.2",
                   ("graph", "edge_layer", "map_edge_1"))
        put_linear("graph.edge_predict", ("graph", "edge_predict"))

    caption = params.get("caption", {})
    if "map_topdown" in caption:                                  # TopDown
        put_linear("caption.map_topdown.0", ("caption", "map_topdown"))
        put_gru("caption.recurrent_cell_1", ("caption", "recurrent_cell_1"))
        for name in ("map_feat", "map_hidd", "attend"):
            put_linear(f"caption.{name}", ("caption", name))
        put_linear("caption.map_lang.0", ("caption", "map_lang"))
        put_gru("caption.recurrent_cell_2", ("caption", "recurrent_cell_2"))
    elif "recurrent_cell" in caption:                             # Scene
        put_linear("caption.map_feat.0", ("caption", "map_feat"))
        put_gru("caption.recurrent_cell", ("caption", "recurrent_cell"))
    if caption:
        put_linear("caption.classifier", ("caption", "classifier"))

    if out_path is not None:
        torch.save(sd, out_path)
    return sd


def _get_node(tree: dict, path: Tuple[str, ...]) -> dict:
    node = tree
    for p in path:
        node = node[p]
    return node
