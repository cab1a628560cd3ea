"""Furthest-point sampling + point gathering.

TPU-native replacements for the reference CUDA kernels in
``lib/pointnet2/_ext_src/src/sampling_gpu.cu``:

* ``furthest_point_sample`` — semantics preserved exactly
  (sampling_gpu.cu:69-173 via pointnet2_utils.py:51-80):
    - the first selected index is always 0;
    - a running min-squared-distance array is kept per point;
    - points with squared norm <= 1e-3 are *never* selected and their
      running distance is never used (sampling_gpu.cu:100-101) — this skips
      zero padding in padded clouds;
    - each step picks the argmax of the running min distance (strict ``>``
      comparisons → first index wins ties);
    - output is int32 ``(B, npoint)``; non-differentiable.

* ``gather_points`` — plain XLA gather, differentiable for free
  (sampling_gpu.cu:8-57 did the scatter-add gradient by hand).

The default implementation is a ``lax.fori_loop`` whose body is a fused
distance-update + argmax over the point axis — one XLA while-loop, all state
in registers/VMEM.  A Pallas variant lives in ``ops/pallas/fps.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Force the pure-XLA implementation even on TPU.  Needed when tracing for
# multi-platform jax.export: the Pallas kernel has no CPU lowering, so a
# ("cpu", "tpu") artifact can only contain the XLA form (identical indices,
# ~1.6x slower — acceptable for an exported serving artifact).
FORCE_XLA_FPS = False


def set_fps_implementation(impl: str) -> None:
    """"auto" (Pallas on TPU) or "xla" (portable, export-safe)."""
    global FORCE_XLA_FPS
    assert impl in ("auto", "xla"), impl
    FORCE_XLA_FPS = impl == "xla"


def furthest_point_sample(xyz: jax.Array, npoint: int) -> jax.Array:
    """Iterative furthest-point sampling.

    Dispatches to the Pallas kernel on TPU (VMEM-resident state, ~1.6x the
    XLA while-loop) and to the pure-XLA implementation elsewhere.

    Args:
      xyz: (B, N, 3) float point coordinates.
      npoint: number of points to select (static).

    Returns:
      (B, npoint) int32 indices into the N axis.
    """
    # indices are non-differentiable (pointnet2_utils.py:72-77); cut tangents
    # before the kernel — pallas_call has no JVP rule
    xyz = jax.lax.stop_gradient(xyz)
    if (not FORCE_XLA_FPS and jax.default_backend() == "tpu"
            and xyz.shape[1] >= 512):
        from scan2cap_tpu.ops.pallas.fps import furthest_point_sample_pallas
        return furthest_point_sample_pallas(xyz, npoint)
    return _furthest_point_sample_xla(xyz, npoint)


@functools.partial(jax.jit, static_argnames=("npoint",))
def _furthest_point_sample_xla(xyz: jax.Array, npoint: int) -> jax.Array:
    """Pure-XLA reference implementation (lax.fori_loop)."""
    if xyz.ndim != 3 or xyz.shape[-1] != 3:
        raise ValueError(f"xyz must be (B, N, 3), got {xyz.shape}")
    B, N, _ = xyz.shape
    x = xyz.astype(jnp.float32)

    # Points with ||p||^2 <= 1e-3 are excluded from selection entirely.
    valid = (jnp.sum(x * x, axis=-1) > 1e-3)  # (B, N)

    def body(j, state):
        idxs, min_d2, last = state
        # squared distance from every point to the last selected point
        last_xyz = jnp.take_along_axis(x, last[:, None, None], axis=1)  # (B,1,3)
        d2 = jnp.sum((x - last_xyz) ** 2, axis=-1)                      # (B,N)
        min_d2 = jnp.minimum(min_d2, d2)
        # invalid points can never win: CUDA's running best starts at -1
        score = jnp.where(valid, min_d2, -1.0)
        nxt = jnp.argmax(score, axis=-1).astype(jnp.int32)              # (B,)
        idxs = idxs.at[:, j].set(nxt)
        return idxs, min_d2, nxt

    idxs0 = jnp.zeros((B, npoint), dtype=jnp.int32)  # seed = index 0
    min_d2_0 = jnp.full((B, N), 1e10, dtype=jnp.float32)
    last0 = jnp.zeros((B,), dtype=jnp.int32)
    idxs, _, _ = jax.lax.fori_loop(1, npoint, body, (idxs0, min_d2_0, last0))
    return jax.lax.stop_gradient(idxs)


def gather_points(features: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather feature rows by index.

    Args:
      features: (B, N, C).
      idx: (B, M) int indices into N.

    Returns:
      (B, M, C).  Differentiable w.r.t. ``features`` (scatter-add via autodiff,
      replacing gather_points_grad, sampling_gpu.cu:33-57).
    """
    return jnp.take_along_axis(features, idx[..., None].astype(jnp.int32), axis=1)


def random_sampling_indices(key: jax.Array, n_total: int, n_sample: int) -> jax.Array:
    """Indices for random down/over-sampling to a fixed budget.

    Mirrors utils/pc_utils.py:32-40: sample without replacement when
    n_total >= n_sample, otherwise with replacement.
    """
    if n_total >= n_sample:
        return jax.random.permutation(key, n_total)[:n_sample]
    return jax.random.randint(key, (n_sample,), 0, n_total)
