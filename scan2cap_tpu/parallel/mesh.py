"""Device mesh + sharding helpers.

Data-parallel scenes over the "data" axis; a "model" axis is kept in the mesh
shape so the proposal (K) and point (N) axes can be sharded later without
re-plumbing callers.  All collectives are inserted by XLA from the sharding
annotations (the scaling-book recipe: pick mesh → annotate → let XLA insert
psum/all-gather over ICI).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def padded_vocab(num_vocabs: int, n_model: int, multiple: int = 128) -> int:
    """Smallest vocab size >= ``num_vocabs`` divisible by both ``n_model``
    and ``multiple`` (the TPU lane width).

    Why: the caption classifier's output (vocab) axis can only be
    tensor-parallel when the vocab divides the "model" axis; otherwise the
    sharding falls back to the hidden (contraction) axis, whose psums are
    ACTIVATION-sized and scale linearly with batch.  Measured on the
    flagship config (40k pts / 256 proposals / 8-way (4,2) mesh,
    TPU_DESIGN §12): ScanRefer's vocab of 3433 costs 74.9 MB/step of train
    collectives at global B=8 vs 56.1 MB/step when padded to 3456 — the
    all-to-all term vanishes entirely and the batch-linear all-reduce
    component drops.  Padding adds dead logits (never-emitted ids) which
    train toward -inf like any unused class; single-device semantics are
    unchanged for real token ids.
    """
    import math

    step = math.lcm(max(n_model, 1), max(multiple, 1))
    return -(-num_vocabs // step) * step


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (scene) sharding."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# keys that are global (unbatched) and must be replicated
_REPLICATED_KEYS = frozenset({"glove_emb_table"})


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    """Place a host batch onto the mesh: scene axis sharded over "data",
    global arrays replicated."""
    data_s = batch_sharding(mesh)
    repl = replicate(mesh)
    out = {}
    for k, v in batch.items():
        s = repl if (k in _REPLICATED_KEYS or np.ndim(v) == 0) else data_s
        out[k] = jax.device_put(v, s)
    return out
