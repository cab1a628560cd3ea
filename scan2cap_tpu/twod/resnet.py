"""ResNet-v1 bottleneck feature extractor from a torchvision ``.pth``.

The reference's 2D pipeline extracts 2048-d features with torchvision's
pretrained ``resnet101`` minus the fc layer
(Scan2Cap-2D/preprocessing/model.py:6-57, ``ResNet101NoFC``).  This host
has no torchvision and no network, so faithful features are reachable only
the way the 3D pipeline reaches its released detectors: convert the
checkpoint file directly (the ``convert.py`` pattern, proven for
VoteNet/MaskVoteNet/ENet).

``convert_resnet_checkpoint`` maps a torchvision-layout ``resnet101``
state_dict (``conv1/bn1/layer{1..4}.{i}.conv{1..3}|bn{1..3}|downsample``)
onto a nested numpy tree; ``resnet_apply`` runs the eval-mode forward in
JAX (channels-last, eval BN precomputed to per-channel scale/shift,
global average pool — the ``children()[:-1]`` truncation keeps avgpool and
drops fc).  Block counts are inferred from the keys, so the same converter
serves resnet50/101/152 and the tiny replicas the parity test builds.
"""

from __future__ import annotations

import functools
import re
from typing import Dict, Union

import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-5  # torchvision BatchNorm2d default


def _bn_scale_shift(sd: Dict[str, np.ndarray], prefix: str):
    gamma = sd[prefix + ".weight"].astype(np.float64)
    beta = sd[prefix + ".bias"].astype(np.float64)
    mean = sd[prefix + ".running_mean"].astype(np.float64)
    var = sd[prefix + ".running_var"].astype(np.float64)
    scale = gamma / np.sqrt(var + _BN_EPS)
    shift = beta - mean * scale
    return scale.astype(np.float32), shift.astype(np.float32)


def _conv_bn(sd: Dict[str, np.ndarray], conv_prefix: str, bn_prefix: str):
    w = sd[conv_prefix + ".weight"]                     # (O, I, kH, kW)
    scale, shift = _bn_scale_shift(sd, bn_prefix)
    return {
        "kernel": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),  # HWIO
        "scale": scale,
        "shift": shift,
    }


def convert_resnet_checkpoint(
        src: Union[str, Dict[str, np.ndarray]]) -> dict:
    """torchvision ResNet state_dict (path or dict) -> params tree.

    Output layout::

        {"stem": {kernel, scale, shift},
         "layer1": [block, ...], ..., "layer4": [block, ...]}

    where block = {"conv1"|"conv2"|"conv3": {kernel, scale, shift},
    optionally "downsample": {kernel, scale, shift}, "stride": int}.
    """
    if isinstance(src, str):
        from scan2cap_tpu.convert import _load_state_dict
        sd = _load_state_dict(src)
    else:
        sd = {k: np.asarray(v) for k, v in src.items()
              if not k.endswith("num_batches_tracked")}

    params = {"stem": _conv_bn(sd, "conv1", "bn1")}
    for layer in (1, 2, 3, 4):
        blocks = sorted({
            int(m.group(1))
            for k in sd
            for m in [re.match(rf"layer{layer}\.(\d+)\.", k)] if m})
        assert blocks == list(range(len(blocks))), (layer, blocks)
        out = []
        for i in blocks:
            base = f"layer{layer}.{i}"
            block = {
                "conv1": _conv_bn(sd, base + ".conv1", base + ".bn1"),
                "conv2": _conv_bn(sd, base + ".conv2", base + ".bn2"),
                "conv3": _conv_bn(sd, base + ".conv3", base + ".bn3"),
                # torchvision Bottleneck carries the stride on conv2;
                # layer1 keeps stride 1, layers 2-4 downsample in block 0
                "stride": 2 if (layer > 1 and i == 0) else 1,
            }
            if base + ".downsample.0.weight" in sd:
                block["downsample"] = _conv_bn(
                    sd, base + ".downsample.0", base + ".downsample.1")
            out.append(block)
        params[f"layer{layer}"] = out
    return params


def _conv(x, p, stride=1, padding=0):
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["kernel"]), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y * jnp.asarray(p["scale"]) + jnp.asarray(p["shift"])


def _bottleneck(x, block, stride):
    y = jax.nn.relu(_conv(x, block["conv1"]))
    kh = block["conv2"]["kernel"].shape[0]
    y = jax.nn.relu(_conv(y, block["conv2"], stride=stride, padding=kh // 2))
    y = _conv(y, block["conv3"])
    if "downsample" in block:
        x = _conv(x, block["downsample"], stride=stride)
    return jax.nn.relu(x + y)


def _split_static(params):
    """Separate the Python-int strides (static under jit) from the weight
    leaves (traced under jit)."""
    weights = {"stem": params["stem"]}
    strides = {}
    for layer in ("layer1", "layer2", "layer3", "layer4"):
        weights[layer] = [
            {k: v for k, v in b.items() if k != "stride"}
            for b in params[layer]]
        strides[layer] = tuple(b["stride"] for b in params[layer])
    return weights, strides


def _forward(weights, images, strides):
    x = jax.nn.relu(_conv(x=images, p=weights["stem"], stride=2, padding=3))
    # MaxPool2d(3, stride=2, padding=1): -inf padding, like torch
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    for layer in ("layer1", "layer2", "layer3", "layer4"):
        for block, s in zip(weights[layer], strides[layer]):
            x = _bottleneck(x, block, s)
    return jnp.mean(x, axis=(1, 2))


def resnet_apply(params: dict, images: jax.Array) -> jax.Array:
    """Eval-mode forward: (B, H, W, 3) normalized images -> (B, C) pooled
    features (C = 2048 for resnet50/101/152)."""
    weights, strides = _split_static(params)
    return _forward(weights, images, strides)


def make_pth_extractor(pth_path: str):
    """fn(images (B,H,W,3) float [0,1]) -> (B, 2048), from a torchvision
    resnet ``.pth``; carries ``.backend = "resnet:pth"``."""
    params = convert_resnet_checkpoint(pth_path)
    weights, strides = _split_static(params)
    jitted = jax.jit(functools.partial(_forward, strides=strides))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    # preprocessing is host-side tooling: pin the extractor to the CPU
    # backend so per-crop calls don't ride a slow host<->TPU link
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None

    def extract(images: np.ndarray) -> np.ndarray:
        x = (np.asarray(images, np.float32) - mean) / std
        if cpu is not None:
            with jax.default_device(cpu):
                return np.asarray(jitted(weights, jnp.asarray(x)))
        return np.asarray(jitted(weights, jnp.asarray(x)))

    extract.backend = "resnet:pth"
    extract.params = params
    return extract
