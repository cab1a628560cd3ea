"""ENet .pth converter parity: a torch model with the reference's exact
state_dict key layout (lib/enet.py:130-694 — flat Sequential of 27 modules,
Lambda* branch containers named by index) is built with random weights,
exported, converted with convert_enet_checkpoint, and the Flax
ENetEncoder/ENetClassifier must reproduce the torch activations.

This validates the full --use_multiview feature path is checkpoint-
compatible with the released scannetv2_enet.pth (create_enet_for_3d,
lib/enet.py:697-715) without needing the stripped blob itself.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from scan2cap_tpu.convert import convert_enet_checkpoint
from scan2cap_tpu.models.enet import ENetClassifier, ENetEncoder

STAGE2 = [(1, 0), (2, 0), (1, 5), (4, 0), (1, 0), (8, 0), (1, 5), (16, 0)]


class Cat(tnn.Sequential):
    """Branch container concatenating child outputs on channels (LambdaMap
    of [conv, maxpool] + LambdaReduce cat in the reference)."""

    def forward(self, x):
        return torch.cat([m(x) for m in self], 1)


class Add(tnn.Sequential):
    """Branch container summing child outputs (ConcatTable + CAddTable)."""

    def forward(self, x):
        return sum(m(x) for m in self)


class ChannelPad(tnn.Module):
    def __init__(self, pad):
        super().__init__()
        self.pad = pad

    def forward(self, x):
        return F.pad(x, (0, 0, 0, 0, 0, self.pad))


def _main_branch(in_ch, out_ch, internal, down=False, dilation=1, asym=0,
                 dropout=0.1):
    mods = []
    if down:
        mods.append(tnn.Conv2d(in_ch, internal, 2, 2, 0, bias=False))
    else:
        mods.append(tnn.Conv2d(in_ch, internal, 1, 1, 0, bias=False))
    mods += [tnn.BatchNorm2d(internal, eps=1e-3), tnn.PReLU(internal)]
    if asym:
        # 1xk (no bias) then kx1 (with bias) — enet.py:310-312
        mods.append(tnn.Conv2d(internal, internal, (1, asym), 1,
                               (0, asym // 2), bias=False))
        mods.append(tnn.Conv2d(internal, internal, (asym, 1), 1,
                               (asym // 2, 0)))
    else:
        mods.append(tnn.Conv2d(internal, internal, 3, 1, dilation,
                               dilation=dilation))
    mods += [tnn.BatchNorm2d(internal, eps=1e-3), tnn.PReLU(internal),
             tnn.Conv2d(internal, out_ch, 1, 1, 0, bias=False),
             tnn.BatchNorm2d(out_ch, eps=1e-3), tnn.Dropout2d(dropout)]
    return tnn.Sequential(*mods)


def _bottleneck(in_ch, out_ch, internal, down=False, dilation=1, asym=0,
                dropout=0.1):
    main = _main_branch(in_ch, out_ch, internal, down, dilation, asym, dropout)
    if down:
        short = tnn.Sequential(tnn.Identity(), tnn.MaxPool2d(2, 2),
                               ChannelPad(out_ch - in_ch))
    else:
        short = tnn.Sequential(tnn.Identity())
    return tnn.Sequential(Add(main, short), tnn.Identity(),
                          tnn.PReLU(out_ch))


def build_reference_enet(num_classes=41):
    """Same module tree (and therefore state_dict keys) as create_enet."""
    mods = [
        Cat(tnn.Conv2d(3, 13, 3, 2, 1), tnn.MaxPool2d(2, 2)),
        tnn.Identity(),                      # the reference's LambdaReduce
        tnn.BatchNorm2d(16, eps=1e-3),
        tnn.PReLU(16),
        _bottleneck(16, 64, 16, down=True, dropout=0.01),
    ]
    mods += [_bottleneck(64, 64, 16, dropout=0.01) for _ in range(4)]
    mods.append(_bottleneck(64, 128, 32, down=True))
    for dil, asym in STAGE2:
        mods.append(_bottleneck(128, 128, 32, dilation=dil, asym=asym))
    for dil, asym in STAGE2:
        mods.append(_bottleneck(128, 128, 32, dilation=dil, asym=asym))
    mods.append(tnn.Sequential(tnn.Conv2d(128, num_classes, 1, 1, 0,
                                          bias=False)))
    return tnn.Sequential(*mods)


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


@pytest.fixture(scope="module")
def torch_enet(tmp_path_factory):
    model = build_reference_enet()
    _randomize(model)
    model.eval()
    path = tmp_path_factory.mktemp("enet") / "scannetv2_enet.pth"
    torch.save(model.state_dict(), str(path))
    return model, str(path)


def test_state_dict_keys_match_reference_layout(torch_enet):
    model, _ = torch_enet
    keys = set(model.state_dict().keys())
    # spot-check the documented layout (module indices from enet.py:130-694)
    for k in ["0.0.weight", "0.0.bias", "2.running_mean", "3.weight",
              "4.0.0.0.weight", "4.0.0.3.bias", "4.2.weight",
              "12.0.0.3.weight", "12.0.0.4.bias",   # asym pair @ b2_3
              "25.0.0.7.running_var", "26.0.weight"]:
        assert k in keys, k
    assert "4.0.0.0.bias" not in keys          # proj convs are bias-free
    assert "12.0.0.3.bias" not in keys         # 1x5 conv is bias-free
    assert "26.0.bias" not in keys             # classifier is bias-free


def test_enet_trunk_activation_parity(torch_enet):
    model, path = torch_enet
    x = np.random.RandomState(1).randn(2, 64, 80, 3).astype(np.float32)

    with torch.no_grad():
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        trunk_t = model[:26](tx).numpy()       # fixed+trainable, enet.py:703
        logits_t = model(tx).numpy()

    params, stats = convert_enet_checkpoint(path)
    enc = ENetEncoder()
    feat = jax.jit(lambda v, x: enc.apply(v, x, train=False))(
        {"params": params, "batch_stats": stats}, jnp.asarray(x))
    feat = np.transpose(np.asarray(feat), (0, 3, 1, 2))
    assert feat.shape == trunk_t.shape
    np.testing.assert_allclose(feat, trunk_t, atol=1e-4, rtol=1e-4)

    cparams, cstats = convert_enet_checkpoint(path, include_classifier=True)
    clf = ENetClassifier()
    feat2, logits = jax.jit(lambda v, x: clf.apply(v, x, train=False))(
        {"params": cparams, "batch_stats": cstats}, jnp.asarray(x))
    logits = np.transpose(np.asarray(logits), (0, 3, 1, 2))
    np.testing.assert_allclose(logits, logits_t, atol=1e-4, rtol=1e-4)


def test_converted_tree_matches_init_structure(torch_enet):
    """The converted tree must be a drop-in for model.init's — any param the
    converter misses (or misnames) fails here."""
    _, path = torch_enet
    params, stats = convert_enet_checkpoint(path)
    enc = ENetEncoder()
    variables = jax.jit(enc.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False)

    def paths(tree, pre=()):
        if isinstance(tree, dict):
            out = set()
            for k, v in tree.items():
                out |= paths(v, pre + (k,))
            return out
        return {pre}

    assert paths(params) == paths(variables["params"])
    assert paths(stats) == paths(variables["batch_stats"])
    for p in paths(params):
        a = params
        b = variables["params"]
        for k in p:
            a, b = a[k], b[k]
        assert a.shape == tuple(b.shape), (p, a.shape, b.shape)
