"""Shared NN primitives.

Replaces lib/pointnet2/pytorch_utils.py (SharedMLP / Conv1d / BN wrappers) with
channels-last Flax equivalents.  1x1 convs over (B, C, N) become plain Dense
layers over the trailing feature axis — straight MXU matmuls.

BatchNorm takes its momentum as a *call argument* so the reference's
BNMomentumScheduler (pytorch_utils.py BNMomentumScheduler; scripts/train.py:154-156)
is a traced scalar rather than a recompile.  Torch convention: running =
(1 - momentum) * running + momentum * batch_stat, unbiased batch variance in
the running average, biased in the normalizer.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    """Torch-semantics batch norm over the trailing feature axis."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool,
                 momentum: jax.Array | float = 0.1) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        if train:
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x.astype(jnp.float32), axis=reduce_axes)
            var = jnp.var(x.astype(jnp.float32), axis=reduce_axes)
            if not self.is_initializing():
                n = x.size // self.features
                unbiased = var * (n / max(n - 1, 1))
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return ((x - mean) * inv + bias).astype(x.dtype)


class SharedMLP(nn.Module):
    """Stack of Dense(+BN)(+ReLU) over the trailing axis.

    Mirrors pytorch_utils.SharedMLP (conv2d 1x1 + BN2d + ReLU per layer) in
    channels-last form.  ``features`` lists the *output* widths.

    ``compute_dtype``: matmul compute precision — params stay float32; with
    bfloat16 the activations ride the MXU's native input width (BN still
    normalizes in float32 inside).

    ``storage_dtype``: inter-layer ACTIVATION buffer width only — matmuls
    and params stay float32; each layer's post-activation output is cast
    narrow, so the XLA fusion boundary materializes a half-width buffer
    (and the residuals the backward saves follow it).  Targets the
    HBM-bound BN/MLP chain over the (B,M,S,C) grouped activations without
    the bf16-COMPUTE quality collapse (TPU_DESIGN §8: f32 weights, f32
    matmul passes; only the layer-boundary rounding is paid).  Only
    INTERIOR boundaries are narrowed — the last layer's output stays
    float32 (consumers like the max-pool read it once; narrowing it buys
    no HBM on the hot path but would round the stack's output).  Ignored
    when compute_dtype is set (compute narrowing subsumes it).
    """

    features: Sequence[int]
    bn: bool = True
    activation: bool = True  # relu after every layer (reference behavior)
    compute_dtype: Optional[str] = None
    storage_dtype: Optional[str] = None

    def setup(self):
        dtype = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        # layer 0 always computes in f32: project_first's callers decompose
        # Dense(a+b) == Dense(a)+Dense(b) over ABSOLUTE room-scale
        # coordinates, which bf16 would quantize (the narrow dtype pays off
        # on the big post-gather (B,M,S,C) activations, i.e. layers 1+)
        self.denses = [
            nn.Dense(w, use_bias=not self.bn, dtype=dtype if i else None,
                     name=f"dense_{i}")
            for i, w in enumerate(self.features)]
        self.bns = ([BatchNorm(w, name=f"bn_{i}")
                     for i, w in enumerate(self.features)]
                    if self.bn else [])

    def _post(self, x: jax.Array, i: int, train: bool,
              bn_momentum) -> jax.Array:
        if self.bn:
            x = self.bns[i](x, train, bn_momentum)
        if self.activation:
            x = nn.relu(x)
        if (self.storage_dtype and not self.compute_dtype
                and i < len(self.features) - 1):
            # narrow only the INTER-layer buffer; the next Dense (dtype=None)
            # promotes back to f32 against its f32 params, so the matmul
            # itself stays full-precision
            x = x.astype(jnp.dtype(self.storage_dtype))
        return x

    def __call__(self, x: jax.Array, train: bool = True,
                 bn_momentum: jax.Array | float = 0.1) -> jax.Array:
        for i in range(len(self.features)):
            x = self._post(self.denses[i](x), i, train, bn_momentum)
        return x

    def project_first(self, x: jax.Array) -> jax.Array:
        """Layer-0 linear only (no BN/ReLU).  With bn=True it is bias-free,
        so callers may decompose Dense(a + b) == Dense(a) + Dense(b) —
        used by the SA layers to project source points once and gather the
        projection instead of the (wider) raw features."""
        assert self.bn, ("project_first requires bn=True: with a bias the "
                         "Dense(a+b) == Dense(a)+Dense(b) decomposition "
                         "silently drops it")
        return self.denses[0](x)

    def from_first(self, x: jax.Array, train: bool = True,
                   bn_momentum: jax.Array | float = 0.1) -> jax.Array:
        """Finish the stack given layer-0 PRE-activation values."""
        x = self._post(x, 0, train, bn_momentum)
        for i in range(1, len(self.features)):
            x = self._post(self.denses[i](x), i, train, bn_momentum)
        return x


class GRUCell(nn.Module):
    """Torch-parity GRU cell (torch.nn.GRUCell).

    r = sigma(W_ir x + b_ir + W_hr h + b_hr)
    z = sigma(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) * n + z * h

    Kept as one fused (3*H) input matmul + one fused (3*H) hidden matmul.
    """

    hidden_size: int

    @nn.compact
    def __call__(self, x: jax.Array, h: jax.Array) -> jax.Array:
        H = self.hidden_size
        gi = nn.Dense(3 * H, name="ih")(x)
        gh = nn.Dense(3 * H, name="hh")(h)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h
