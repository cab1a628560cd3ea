"""Mesh + sharding layer.

The reference is single-GPU with no distributed runtime (SURVEY.md §2.4);
this layer is green-field: a device mesh with a "data" axis (scenes) and a
reserved "model" axis (proposal/point sharding headroom), batch-sharded pjit
train/eval steps, gradient all-reduce via XLA collectives over ICI.
"""

from scan2cap_tpu.parallel.mesh import (
    make_mesh,
    parse_mesh,
    setup_mesh,
    padded_vocab,
    shard_batch,
    replicate,
    batch_sharding,
    caption_param_spec,
    shard_train_state,
    mesh_step_fn,
    mesh_eval_fn,
)

__all__ = ["make_mesh", "parse_mesh", "setup_mesh", "padded_vocab",
           "shard_batch",
           "replicate", "batch_sharding", "caption_param_spec",
           "shard_train_state", "mesh_step_fn", "mesh_eval_fn"]
