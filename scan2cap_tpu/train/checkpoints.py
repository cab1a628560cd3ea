"""Checkpointing — best / last / resume triad (lib/solver.py:186-188,492-515).

The reference keeps ``model.pth`` (best by criterion), ``model_last.pth``
(every epoch), and a full ``checkpoint.tar`` resume bundle {epoch, model,
optimizer, best}.  Here the same triad is stored with orbax:
  <root>/best, <root>/last, <root>/resume.

Crash safety: a save writes to ``<name>.new`` and swaps it in only after the
orbax commit finishes (old → ``<name>.old`` → rename → delete old), so a
kill at any instant leaves at least one complete checkpoint on disk — the
naive delete-then-write order would lose the only copy.
"""

from __future__ import annotations

import os
import shutil
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


def _abstract(tree):
    """Shape/dtype(/sharding) skeleton of a pytree WITHOUT device→host
    transfers — np.asarray on a live parameter tree would pull every array
    over the (slow) host link just to tell orbax its structure.

    Mesh-sharded targets keep their NamedSharding: orbax then restores each
    shard straight to its device instead of materializing a host replica
    first (the sharded-resume contract — save on a (4,2) mesh, restore into
    (4,2) or any other mesh shape; the on-disk form is the unsharded numpy
    tree, so shape changes need no resharding pass)."""
    from jax.sharding import NamedSharding

    def leaf(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            sharding = getattr(x, "sharding", None)
            if isinstance(sharding, NamedSharding):
                return jax.ShapeDtypeStruct(tuple(x.shape), x.dtype,
                                            sharding=sharding)
            return jax.ShapeDtypeStruct(tuple(x.shape), x.dtype)
        x = np.asarray(x)
        return jax.ShapeDtypeStruct(x.shape, x.dtype)
    return jax.tree.map(leaf, tree)


class CheckpointIO:
    """Tiny wrapper: orbax when available, npz-pickle fallback.

    ``async_save=True`` returns from ``save`` once the tree is snapshot to
    host memory and lets orbax write to disk in the background (the modern
    replacement for the reference's blocking torch.save, SURVEY.md §5.3-5.4);
    ``wait()`` is the barrier (it also performs the atomic swap), and
    save/restore/exists insert it automatically so operations stay ordered."""

    def __init__(self, root: str, async_save: bool = False):
        self.root = os.path.abspath(root)
        self.async_save = async_save
        os.makedirs(self.root, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer() if _HAS_ORBAX else None
        self._pending_swap: Optional[tuple] = None
        # recover from a crash that committed .new but didn't finish the
        # swap.  Invariant used below: the swap sequence only starts AFTER
        # the checkpointer commit finishes, and orbax finalizes a save by
        # atomically renaming its own tmp dir into place — so an existing
        # <name>.new is always complete, and always newer than both
        # <name>.old and the final dir.
        for name in os.listdir(self.root):
            if name.endswith(".old"):
                final = os.path.join(self.root, name[:-4])
                new = final + ".new"
                if os.path.exists(new):
                    # crashed mid-swap: promote the committed .new; both the
                    # stale final (if any) and .old are older
                    if os.path.exists(final):
                        shutil.rmtree(final)
                    os.rename(new, final)
                    shutil.rmtree(os.path.join(self.root, name))
                elif os.path.exists(final):
                    shutil.rmtree(os.path.join(self.root, name))
                else:                      # crashed between the two renames
                    os.rename(os.path.join(self.root, name), final)
        for name in os.listdir(self.root):
            if name.endswith(".orbax-checkpoint-tmp"):
                # crash mid-write: orbax's own tmp dir (it atomically
                # renames this into <name>.new at commit) — incomplete by
                # definition, and it would collide with the next save
                shutil.rmtree(os.path.join(self.root, name),
                              ignore_errors=True)
                continue
            if name.endswith(".new"):
                # orphaned committed .new with no .old: crash after the
                # commit but before (or during) the swap of a first-ever
                # save, or after .old was already cleaned — it is the
                # freshest complete checkpoint; promote it (leaving it would
                # lose it to the next save's rmtree)
                final = os.path.join(self.root, name[:-4])
                if os.path.exists(final):
                    shutil.rmtree(final)
                os.rename(os.path.join(self.root, name), final)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def wait(self) -> None:
        """Block until any in-flight async save has committed, then swap the
        committed ``.new`` directory into place."""
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()
        if self._pending_swap is not None:
            tmp, path = self._pending_swap
            self._pending_swap = None
            old = path + ".old"
            if os.path.exists(old):
                shutil.rmtree(old)
            if os.path.exists(path):
                os.rename(path, old)
            os.rename(tmp, path)
            if os.path.exists(old):
                shutil.rmtree(old)

    def save(self, name: str, tree: Dict[str, Any]) -> None:
        path = self._path(name)
        if self._ckptr is not None:
            self.wait()                     # order vs a previous async save
            tmp = path + ".new"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            self._ckptr.save(tmp, _to_numpy(tree))
            self._pending_swap = (tmp, path)
            if not self.async_save:
                self.wait()
        else:  # pragma: no cover
            import pickle
            with open(path + ".pkl.new", "wb") as f:
                pickle.dump(_to_numpy(tree), f)
            os.replace(path + ".pkl.new", path + ".pkl")

    def restore(self, name: str, target: Optional[Dict] = None):
        path = self._path(name)
        if self._ckptr is not None:
            self.wait()
            return self._ckptr.restore(
                path, target=_abstract(target) if target is not None else None)
        import pickle  # pragma: no cover
        with open(path + ".pkl", "rb") as f:
            return pickle.load(f)

    def exists(self, name: str) -> bool:
        self.wait()                         # a pending save counts
        path = self._path(name)
        return os.path.exists(path) or os.path.exists(path + ".pkl")

    def restore_best_or_last(self, target: Optional[Dict] = None):
        """best-by-criterion if an eval ever fired, else the last epoch
        (the reference's model.pth vs model_last.pth pair)."""
        return self.restore("best" if self.exists("best") else "last", target)
