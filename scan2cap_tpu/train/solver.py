"""Training solver — rebuild of lib/solver.py.

Per-iteration fetch/forward+backward timing, periodic in-training caption
evaluation (every ``val_step`` iters, lib/solver.py:451-460), best-model
selection by criterion (default CiDEr, lib/solver.py:469-495), best/last/
resume checkpoints, tensorboard + text logging, ETA reports.

The forward/backward/optimizer update is ONE jitted program (train/step.py),
so the reference's separate forward/backward timings collapse into a single
device step time; fetch time is the host input pipeline.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scan2cap_tpu.config import Config
from scan2cap_tpu.train.checkpoints import CheckpointIO
from scan2cap_tpu.train.schedules import bn_momentum, multistep_lr
from scan2cap_tpu.utils.eta import format_eta

ITER_REPORT = (
    "[epoch {epoch}/{total_epoch}][iter {iter}/{total_iter}] "
    "loss {loss:.4f} cap {cap_loss:.4f} box {box_loss:.4f} "
    "obj_acc {obj_acc:.3f} iou {pred_ious:.3f} | "
    "fetch {fetch:.3f}s step {step:.3f}s eta {eta}"
)


class Solver:
    def __init__(
        self,
        cfg: Config,
        model,
        state,
        train_step: Callable,
        train_loader,
        eval_fn: Optional[Callable] = None,   # (state) -> {metric: float}
        stamp: str = "run",
        output_root: Optional[str] = None,
        val_step: int = 2000,
        detection: bool = True,
        caption: bool = True,
        criterion: str = "cider",
        verbose: int = 10,
        lr_decay: bool = False,               # detection-only schedules
        bn_decay: bool = False,
        profile_steps: int = 0,               # jax.profiler trace of steps 2..N
        async_checkpoints: bool = False,      # overlap disk IO with training
    ):
        self.cfg = cfg
        self.model = model
        self.state = state
        self.train_step = train_step
        self.train_loader = train_loader
        self.eval_fn = eval_fn
        self.val_step = val_step
        self.detection = detection
        self.caption = caption
        self.criterion = criterion
        self.verbose = verbose
        self.lr_decay = lr_decay
        self.bn_decay = bn_decay
        self.profile_steps = profile_steps

        self.output = os.path.join(
            output_root or cfg.paths.output, stamp)
        os.makedirs(self.output, exist_ok=True)
        self.ckpt = CheckpointIO(os.path.join(self.output, "ckpt"),
                                 async_save=async_checkpoints)
        self.log_path = os.path.join(self.output, "log.txt")
        self.best = {"epoch": 0, self.criterion: -float("inf")}
        self.global_iter = 0
        self._writers = self._make_writers()
        self.log_history: Dict[str, list] = defaultdict(list)

    def _make_writers(self):
        try:
            from tensorboardX import SummaryWriter
            return {
                "train": SummaryWriter(os.path.join(self.output, "tensorboard/train")),
                "val": SummaryWriter(os.path.join(self.output, "tensorboard/val")),
            }
        except Exception:  # pragma: no cover
            return {}

    def _log(self, msg: str):
        print(msg, flush=True)
        with open(self.log_path, "a") as f:
            f.write(msg + "\n")

    def _write_scalar(self, phase: str, key: str, value: float, it: int):
        if self._writers:
            self._writers[phase].add_scalar(key, value, it)
        self.log_history[f"{phase}/{key}"].append((it, float(value)))

    # ------------------------------------------------------------------
    def __call__(self, epochs: int, verbose: Optional[int] = None,
                 start_epoch: int = 0):
        """Train epochs ``start_epoch``..``epochs``-1.  ``start_epoch`` is
        the GLOBAL epoch offset on resume (scripts/train.py passes the
        restored checkpoint epoch + 1): LR/BN schedules and the resume
        bundle's recorded epoch all use global numbering, so a resumed run
        continues its schedules instead of restarting them from 0 and a
        twice-resumed run never miscounts total epochs."""
        if verbose is not None:
            self.verbose = verbose
        total_iter = (epochs - start_epoch) * len(self.train_loader)
        start = time.time()
        epoch = start_epoch  # the interrupt handler needs it bound even if
        try:                 # Ctrl-C lands before/after the loop body
            for epoch in range(start_epoch, epochs):
                self._log(f"epoch {epoch + 1} starting...")
                lr = (multistep_lr(self.cfg.train.lr, epoch,
                                   self.cfg.train.lr_decay_steps,
                                   self.cfg.train.lr_decay_rate)
                      if self.lr_decay else self.cfg.train.lr)
                mom = (bn_momentum(epoch, self.cfg.train.bn_momentum_init,
                                   self.cfg.train.bn_decay_rate,
                                   self.cfg.train.bn_decay_step,
                                   self.cfg.train.bn_momentum_max)
                       if self.bn_decay else 0.1)
                self._feed_epoch(epoch, epochs, total_iter, start, lr, mom)
                self._save_checkpoint(epoch)
            self.ckpt.wait()              # commit any in-flight async save
            self._dump_log()
        except KeyboardInterrupt:
            # checkpoint-and-exit (lib/solver.py:200-203,497-515)
            self._save_checkpoint(epoch, interrupted=True)
            self.ckpt.wait()
            raise
        return self.best

    # ------------------------------------------------------------------
    def _feed_epoch(self, epoch, total_epochs, total_iter, start, lr, mom):
        lr_j = jnp.asarray(lr, jnp.float32)
        mom_j = jnp.asarray(mom, jnp.float32)
        fetch_times, step_times = [], []
        t_fetch = time.time()
        # one-step-deferred metrics: dispatch is async, so syncing on the
        # CURRENT step's loss would stall the host behind the device every
        # iteration (the reference does exactly that, lib/solver.py:366-446).
        # Realizing the previous step's scalars while the current step runs
        # overlaps host fetch + H2D with device compute.
        pending = None                    # (metrics, iter, dispatch_time)

        def consume(p):
            metrics, it, t_disp = p
            # ONE host transfer for the whole (small) metrics pytree — each
            # individual float() costs a full device round trip (~27 ms on
            # this host link), and a verbose report reads ~20 scalars
            metrics = jax.device_get(metrics)
            loss = float(metrics["loss"])         # sync with step it
            step_times.append(time.time() - t_disp)
            if it % self.verbose == 0:
                mean_fetch = float(np.mean(fetch_times[-self.verbose:]))
                mean_step = float(np.mean(step_times[-self.verbose:]))
                # with the deferred pipeline, step_times already span a full
                # iteration (the overlapped fetch included) — don't add
                # mean_fetch again
                eta = (total_iter - it) * mean_step
                self._log(ITER_REPORT.format(
                    epoch=epoch + 1, total_epoch=total_epochs,
                    iter=it, total_iter=total_iter,
                    loss=loss,
                    cap_loss=float(metrics.get("cap_loss", 0.0)),
                    box_loss=float(metrics.get("box_loss", 0.0)),
                    obj_acc=float(metrics.get("obj_acc", 0.0)),
                    pred_ious=float(metrics.get("pred_ious", 0.0)),
                    fetch=mean_fetch, step=mean_step, eta=format_eta(eta)))
                for k, v in metrics.items():
                    self._write_scalar("train", k, float(v), it)

        for batch in self.train_loader:
            # jnp.array (NOT asarray): the CPU backend aliases numpy memory,
            # and with Loader(reuse_buffers=True) the yielded batch is a
            # reusable ring buffer — the upload must be a real copy
            jbatch = {k: jnp.array(v) for k, v in batch.items()}
            fetch_times.append(time.time() - t_fetch)

            # device trace of warm steps (skip the compile step)
            if self.profile_steps and self.global_iter == 1:
                if pending is not None:
                    consume(pending)      # drain: step 1 must finish before
                    pending = None        # the trace starts
                jax.profiler.start_trace(
                    os.path.join(self.output, "profile"))
            t0 = time.time()
            self.state, metrics = self.train_step(self.state, jbatch, lr_j, mom_j)
            self.global_iter += 1
            if pending is not None:
                consume(pending)
            pending = (metrics, self.global_iter, t0)
            if (self.profile_steps
                    and self.global_iter == 1 + self.profile_steps):
                consume(pending)          # drain before stopping the trace
                pending = None
                jax.profiler.stop_trace()
                self._log(f"profiler trace written to {self.output}/profile")

            if (self.eval_fn is not None
                    and self.global_iter % self.val_step == 0):
                if pending is not None:
                    consume(pending)
                    pending = None
                self._run_eval(epoch)
            t_fetch = time.time()
        if pending is not None:
            consume(pending)

    def _run_eval(self, epoch):
        scores = self.eval_fn(self.state)
        for k, v in scores.items():
            self._write_scalar("val", k, v, self.global_iter)
        crit = scores.get(self.criterion, None)
        report = " ".join(f"{k}={v:.4f}" for k, v in scores.items())
        self._log(f"[eval @ iter {self.global_iter}] {report}")
        if crit is not None and crit > self.best[self.criterion]:
            self.best = {**scores, "epoch": epoch, self.criterion: crit}
            self._log(f"best {self.criterion} improved -> {crit:.4f}; saving model...")
            self.ckpt.save("best", {"params": self.state.params,
                                    "batch_stats": self.state.batch_stats})

    def _save_checkpoint(self, epoch, interrupted=False):
        self.ckpt.save("last", {"params": self.state.params,
                                "batch_stats": self.state.batch_stats})
        self.ckpt.save("resume", {
            "epoch": np.asarray(epoch),
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        })
        if interrupted:
            self._log(f"interrupted at epoch {epoch}; checkpoint saved")

    def _dump_log(self):
        with open(os.path.join(self.output, "scalars.json"), "w") as f:
            json.dump({k: v for k, v in self.log_history.items()}, f)
