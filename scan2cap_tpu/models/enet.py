"""ENet semantic-segmentation encoder — Flax rebuild of lib/enet.py.

The reference rebuilds a torch7-exported ENet layer-by-layer (enet.py:130-695)
and truncates it into a fixed 128-d feature trunk + a trainable tail + a
classifier (create_enet_for_3d, enet.py:697-715).  Here the standard ENet
encoder (Paszke et al. 2016) is implemented natively:

  initial block: conv3x3/2 (13ch) ∥ maxpool → concat 16ch
  stage 1: downsample bottleneck 16→64, 4× regular bottlenecks
  stage 2: downsample 64→128, then the dilated/asymmetric sequence
           [reg, dil2, asym5, dil4, reg, dil8, asym5, dil16]
  stage 3: the same sequence without downsampling (128ch)

The 3D pipeline consumes the 128-channel stage-3 output at 1/8 resolution
(328×256 frames → 41×32 feature maps, scripts/compute_multiview_features.py);
``ENetClassifier`` adds the 1x1 conv head used for label projection checks.
NCHW→NHWC: channels-last like the rest of the framework.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25),
                           (self.features,))
        return jnp.where(x >= 0, x, alpha * x)


class InitialBlock(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        conv = nn.Conv(13, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       name="conv")(x)
        pool = nn.max_pool(x, (2, 2), strides=(2, 2))
        out = jnp.concatenate([conv, pool], axis=-1)     # 16 channels
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-3, name="bn")(out)
        return PReLU(16, name="prelu")(out)


class Bottleneck(nn.Module):
    """ENet bottleneck: 1x1 (or 2x2/2 when downsampling) → core conv → 1x1,
    residual add with optional channel-padded maxpool shortcut."""

    out_ch: int
    internal: int
    downsample: bool = False
    dilation: int = 1
    asymmetric: int = 0          # kernel size of the 5x1/1x5 pair, 0 = off
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, train=True):
        in_ch = x.shape[-1]
        h = x
        if self.downsample:
            h = nn.Conv(self.internal, (2, 2), strides=(2, 2), padding="VALID",
                        use_bias=False, name="proj")(h)
        else:
            h = nn.Conv(self.internal, (1, 1), use_bias=False, name="proj")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, name="bn1")(h)
        h = PReLU(self.internal, name="prelu1")(h)

        if self.asymmetric:
            # 1xk then kx1, the reference's order (enet.py:310-312) — the
            # pair is linear but zero-padding makes the composition
            # order-sensitive at borders, so checkpoint parity needs it
            k = self.asymmetric
            h = nn.Conv(self.internal, (1, k),
                        padding=((0, 0), (k // 2, k // 2)),
                        use_bias=False, name="conv_a")(h)
            h = nn.Conv(self.internal, (k, 1),
                        padding=((k // 2, k // 2), (0, 0)),
                        use_bias=False, name="conv_b")(h)
        else:
            d = self.dilation
            h = nn.Conv(self.internal, (3, 3), padding=((d, d), (d, d)),
                        kernel_dilation=(d, d), use_bias=False,
                        name="conv")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, name="bn2")(h)
        h = PReLU(self.internal, name="prelu2")(h)

        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="expand")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, name="bn3")(h)
        # spatial dropout per the reference stages (enet.py rates 0.01/0.1);
        # inert at train=False (the extraction path) — fine-tuning with
        # train=True requires a "dropout" rng at apply, which flax enforces
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)

        shortcut = x
        if self.downsample:
            shortcut = nn.max_pool(shortcut, (2, 2), strides=(2, 2))
        if self.out_ch != in_ch:
            pad = self.out_ch - in_ch
            shortcut = jnp.pad(shortcut,
                               ((0, 0), (0, 0), (0, 0), (0, pad)))
        return PReLU(self.out_ch, name="prelu_out")(h + shortcut)


class ENetEncoder(nn.Module):
    """Feature trunk: (B, H, W, 3) -> (B, H/8, W/8, 128)."""

    @nn.compact
    def __call__(self, x, train=True):
        x = InitialBlock(name="initial")(x, train)

        x = Bottleneck(64, 16, downsample=True, dropout_rate=0.01,
                       name="b1_0")(x, train)
        for i in range(4):
            x = Bottleneck(64, 16, dropout_rate=0.01,
                           name=f"b1_{i + 1}")(x, train)

        x = Bottleneck(128, 32, downsample=True, name="b2_0")(x, train)
        stage = [(1, 0), (2, 0), (1, 5), (4, 0), (1, 0), (8, 0), (1, 5), (16, 0)]
        for i, (dil, asym) in enumerate(stage):
            x = Bottleneck(128, 32, dilation=dil, asymmetric=asym,
                           name=f"b2_{i + 1}")(x, train)
        for i, (dil, asym) in enumerate(stage):
            x = Bottleneck(128, 32, dilation=dil, asymmetric=asym,
                           name=f"b3_{i + 1}")(x, train)
        return x


class ENetClassifier(nn.Module):
    """Encoder + 1x1 classification head (2D semantic logits at 1/8 res)."""

    num_classes: int = 41

    @nn.compact
    def __call__(self, x, train=True):
        feat = ENetEncoder(name="encoder")(x, train)
        # bias-free like the reference head (enet.py:588-590)
        logits = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                         name="classifier")(feat)
        return feat, logits


def create_enet_for_3d(num_2d_classes: int = 41):
    """API mirror of enet.py:697-715: returns (trunk, classifier) modules —
    the trunk output is the 128-d multiview feature."""
    return ENetEncoder(), ENetClassifier(num_2d_classes)
