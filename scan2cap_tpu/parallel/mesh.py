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
import jax.numpy as jnp
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


def parse_mesh(spec: str, devices=None) -> Mesh:
    """Build a mesh from a CLI ``--mesh DATA,MODEL`` string (e.g. ``8,1`` for
    pure data parallelism, ``4,2`` for DP+TP); ``DATA`` alone means
    ``DATA,1``.  Fails loudly when the host exposes fewer devices than the
    mesh asks for (the production trainer must not silently fall back to a
    sub-mesh the user didn't request)."""
    parts = [int(x) for x in spec.split(",")]
    if len(parts) == 1:
        parts.append(1)
    if len(parts) != 2 or min(parts) < 1:
        raise ValueError(f"--mesh expects DATA,MODEL with both >= 1; "
                         f"got {spec!r}")
    n_data, n_model = parts
    if devices is None:
        devices = jax.devices()
    if n_data * n_model > len(devices):
        raise ValueError(
            f"--mesh {spec} needs {n_data * n_model} devices; only "
            f"{len(devices)} available ({devices[0].platform})")
    return make_mesh(n_data=n_data, n_model=n_model, devices=devices)


def setup_mesh(spec: str, batch_size: int) -> Mesh:
    """Shared trainer-CLI front door for ``--mesh``: parse DATA,MODEL and
    validate that the data axis divides the batch size (DP splits the scene
    axis evenly; mesh_eval_fn's padding only covers EVAL batches).

    Raises SystemExit with the user-facing message — used by scripts/
    train.py, train_maskvotenet.py, train_pretrained.py and
    quality_trajectory.py instead of four copies of this block."""
    mesh = parse_mesh(spec)
    n_data = dict(mesh.shape)["data"]
    if batch_size % n_data != 0:
        raise SystemExit(
            f"--batch_size {batch_size} must be divisible by the mesh "
            f"data axis ({n_data})")
    return mesh


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


def caption_param_spec(path, leaf, n_model: int) -> P:
    """Tensor-parallel PartitionSpec for one CapNet param leaf.

    Caption decoder projections are the only params worth sharding at this
    model size (TPU_DESIGN §12): the classifier's output (vocab) axis when
    divisible by the model axis — pair with ``padded_vocab`` /
    ``CapNet(num_vocabs_padded=...)`` so it is — else its hidden axis, and
    the attention projections' hidden axis.  Everything else replicates
    (detection params are small and feed data-parallel compute)."""
    keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    if "caption" in keys and leaf.ndim == 2:
        if "classifier" in keys:
            if leaf.shape[1] % n_model == 0:
                return P(None, "model")   # vocab-sharded output projection
            if leaf.shape[0] % n_model == 0:
                return P("model", None)   # hidden-sharded (psum of partials)
        if any(k in keys for k in ("map_feat", "map_hidd")) \
                and leaf.shape[1] % n_model == 0:
            return P(None, "model")       # hidden-sharded attention proj
    return P()


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState onto the mesh: caption params TP-sharded over the
    "model" axis (caption_param_spec), everything else replicated.

    opt_state starts replicated — at this model size (6.2M params) the
    redundancy is ~25 MB/device; after the first jitted step XLA's sharding
    propagation re-lays it out to match the gradients anyway."""
    n_model = dict(mesh.shape).get("model", 1)
    param_sharding = jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, caption_param_spec(p, x, n_model)),
        state.params)
    repl = NamedSharding(mesh, P())
    return state.replace(
        params=jax.tree.map(jax.device_put, state.params, param_sharding),
        batch_stats=jax.device_put(state.batch_stats, repl),
        opt_state=jax.device_put(state.opt_state, repl),
        step=jax.device_put(state.step, repl))


def mesh_step_fn(step_fn, mesh: Mesh):
    """Wrap a jitted (state, batch, *args) -> ... step so the Solver can run
    it unchanged over a mesh: each call shards the batch's scene axis over
    "data" (global arrays replicated) and executes under ``jax.set_mesh`` so
    with_sharding_constraint hooks (e.g. the caption eval decode's proposal-
    axis TP) see the ambient mesh."""
    def wrapped(state, batch, *args):
        sbatch = shard_batch(batch, mesh)
        with jax.set_mesh(mesh):
            return step_fn(state, sbatch, *args)
    return wrapped


# keys that are global (unbatched) and must be replicated
_REPLICATED_KEYS = frozenset({"glove_emb_table"})


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    """Place a host batch onto the mesh: scene axis sharded over "data",
    global arrays replicated."""
    data_s = batch_sharding(mesh)
    repl = replicate(mesh)
    n_data = dict(mesh.shape)["data"]
    out = {}
    for k, v in batch.items():
        if k in _REPLICATED_KEYS or np.ndim(v) == 0:
            out[k] = jax.device_put(v, repl)
            continue
        if v.shape[0] % n_data != 0:
            raise ValueError(
                f"batch[{k!r}] scene axis {v.shape[0]} is not divisible by "
                f"the mesh data axis ({n_data}); use a divisible batch size "
                f"(train) or mesh_eval_fn's padding (eval)")
        out[k] = jax.device_put(v, data_s)
    return out


def mesh_eval_fn(step_fn, mesh: Mesh):
    """Wrap a jitted eval step (state, batch, *args) -> dict for mesh
    execution that tolerates uneven final batches (val loaders use
    drop_last=False): the scene axis is padded up to a multiple of the
    "data" axis by tiling the last scene, the step runs under the mesh, and
    per-scene outputs are sliced back to the true batch.  Exact: every eval
    output in make_eval_step's keep_keys is per-scene (detection-loss
    assignment pairs within a scene) and eval-mode BN uses running stats, so
    pad scenes cannot influence real ones."""
    n_data = dict(mesh.shape)["data"]

    def wrapped(state, batch, *args):
        sizes = {np.shape(v)[0] for k, v in batch.items()
                 if k not in _REPLICATED_KEYS and np.ndim(v) > 0}
        assert len(sizes) == 1, f"inconsistent batch leading axes: {sizes}"
        bsz = sizes.pop()
        pad = (-bsz) % n_data
        if pad:
            batch = {
                k: (v if k in _REPLICATED_KEYS or np.ndim(v) == 0
                    else jnp.concatenate(
                        [jnp.asarray(v),
                         jnp.repeat(jnp.asarray(v)[-1:], pad, axis=0)]))
                for k, v in batch.items()}
        sbatch = shard_batch(batch, mesh)
        with jax.set_mesh(mesh):
            out = step_fn(state, sbatch, *args)
        if pad:
            out = jax.tree.map(
                lambda x: (x[:bsz]
                           if np.ndim(x) > 0 and np.shape(x)[0] == bsz + pad
                           else x), out)
        return out

    return wrapped
