"""pjit'd train / eval step builders.

One XLA program per step: forward (backbone→voting→proposal→graph→caption),
loss, backward, Adam update, BN running-stat update.  The batch is sharded
over the mesh "data" axis; gradient all-reduce is inserted by XLA.

Optimizer parity: torch.optim.Adam(lr=1e-3, weight_decay=1e-5)
(scripts/train.py:135) — L2-coupled weight decay added to the gradients
*before* the Adam moments, i.e. optax add_decayed_weights → scale_by_adam.
LR and BN momentum enter as traced scalars so the detection-only schedules
(train/schedules.py) never trigger a recompile.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from scan2cap_tpu.config import Config
from scan2cap_tpu.losses import get_scene_cap_loss
from scan2cap_tpu.models import CapNet


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, lr):
        """lr is a traced scalar — schedules never recompile."""
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def make_optimizer(wd: float = 1e-5) -> optax.GradientTransformation:
    """torch Adam with coupled L2 weight decay; the lr scaling is applied in
    apply_gradients from a traced scalar."""
    return optax.chain(
        optax.add_decayed_weights(wd),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
    )


def create_train_state(cfg: Config, model: CapNet, example_batch: Dict,
                       rng: jax.Array, wd: Optional[float] = None) -> TrainState:
    init = jax.jit(model.init, static_argnames=("use_tf", "is_eval", "train"))
    variables = init(rng, example_batch, use_tf=True, is_eval=False,
                     train=False)
    tx = make_optimizer(cfg.train.wd if wd is None else wd)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )


def make_train_step(
    cfg: Config,
    model: CapNet,
    detection: bool = True,
    caption: bool = True,
    orientation: bool = False,
    distance: bool = False,
    use_tf: bool = True,
    donate: bool = True,
) -> Callable[[TrainState, Dict, jax.Array], Tuple[TrainState, Dict]]:
    """Returns jitted (state, batch, lr, bn_momentum) -> (state, metrics)."""

    report_keys = (
        "loss", "vote_loss", "objectness_loss", "box_loss", "center_loss",
        "heading_cls_loss", "heading_reg_loss", "size_cls_loss",
        "size_reg_loss", "sem_cls_loss", "cap_loss", "ori_loss", "dist_loss",
        "cap_acc", "ori_acc", "obj_acc", "pred_ious", "pos_ratio", "neg_ratio",
    )

    def loss_fn(params, batch_stats, batch, bn_momentum):
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, use_tf=use_tf, is_eval=False, train=True,
            bn_momentum=bn_momentum, mutable=["batch_stats"])
        out = get_scene_cap_loss(
            out, detection=detection, caption=caption and not cfg.model.no_caption,
            orientation=orientation, distance=distance,
            num_bins=cfg.model.num_bins,
            num_heading_bin=cfg.model.num_heading_bin,
            num_size_cluster=cfg.model.num_size_cluster)
        return out["loss"], (out, mutated["batch_stats"])

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch: Dict, lr: jax.Array,
                   bn_momentum: jax.Array):
        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   bn_momentum)
        state = state.apply_gradients(grads, lr)
        state = state.replace(batch_stats=new_stats)
        metrics = {k: out[k] for k in report_keys if k in out}
        return state, metrics

    return train_step


def make_eval_step(cfg: Config, model: CapNet,
                   detection_loss: bool = True,
                   keep_attn: bool = False) -> Callable:
    """Returns jitted (state, batch) -> data_dict with eval-mode captions and
    (optionally) object_assignment from the detection loss, as the reference's
    eval path does (lib/eval_helper.py:170)."""

    keep_keys = (
        "lang_cap", "bbox_corner", "bbox_mask", "bbox_feature",
        "objectness_scores", "sem_cls_scores", "center", "heading_scores",
        "heading_residuals", "size_scores", "size_residuals",
        "object_assignment", "objectness_label", "objectness_mask",
        "valid_masks",
    )
    if keep_attn:   # --save_interm: per-step attention over the local slots
        keep_keys = keep_keys + ("topdown_attn", "topdown_attn_slots")

    @jax.jit
    def eval_step(state: TrainState, batch: Dict):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, use_tf=False, is_eval=True, train=False)
        if detection_loss:
            out = get_scene_cap_loss(
                out, detection=True, caption=False,
                num_heading_bin=cfg.model.num_heading_bin,
                num_size_cluster=cfg.model.num_size_cluster)
        return {k: out[k] for k in keep_keys if k in out}

    return eval_step
