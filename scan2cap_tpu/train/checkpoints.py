"""Checkpointing — best / last / resume triad (lib/solver.py:186-188,492-515).

The reference keeps ``model.pth`` (best by criterion), ``model_last.pth``
(every epoch), and a full ``checkpoint.tar`` resume bundle {epoch, model,
optimizer, best}.  Here the same triad is stored with orbax:
  <root>/best, <root>/last, <root>/resume.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class CheckpointIO:
    """Tiny wrapper: orbax when available, npz-pickle fallback.

    ``async_save=True`` returns from ``save`` once the tree is snapshot to
    host memory and lets orbax write to disk in the background (the modern
    replacement for the reference's blocking torch.save, SURVEY.md §5.3-5.4);
    ``wait()`` is the barrier, and save/restore insert it automatically so
    back-to-back operations stay ordered."""

    def __init__(self, root: str, async_save: bool = False):
        self.root = os.path.abspath(root)
        self.async_save = async_save
        os.makedirs(self.root, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer() if _HAS_ORBAX else None

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def wait(self) -> None:
        """Block until any in-flight async save has committed to disk."""
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()

    def save(self, name: str, tree: Dict[str, Any]) -> None:
        path = self._path(name)
        if self._ckptr is not None:
            self.wait()                     # order vs a previous async save
            if os.path.exists(path):
                import shutil
                shutil.rmtree(path)
            self._ckptr.save(path, _to_numpy(tree))
            if not self.async_save:
                self._ckptr.wait_until_finished()
        else:  # pragma: no cover
            import pickle
            with open(path + ".pkl", "wb") as f:
                pickle.dump(_to_numpy(tree), f)

    def restore(self, name: str, target: Optional[Dict] = None):
        path = self._path(name)
        if self._ckptr is not None:
            self.wait()
            return self._ckptr.restore(
                path, target=_to_numpy(target) if target is not None else None)
        import pickle  # pragma: no cover
        with open(path + ".pkl", "rb") as f:
            return pickle.load(f)

    def exists(self, name: str) -> bool:
        path = self._path(name)
        return os.path.exists(path) or os.path.exists(path + ".pkl")

    def restore_best_or_last(self, target: Optional[Dict] = None):
        """best-by-criterion if an eval ever fired, else the last epoch
        (the reference's model.pth vs model_last.pth pair)."""
        return self.restore("best" if self.exists("best") else "last", target)
