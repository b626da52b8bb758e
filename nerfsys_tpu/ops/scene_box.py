"""Axis-aligned scene boxes and ray/AABB intersection, TPU-first.

Functional JAX counterpart of the reference SceneBox
(/root/reference/adaptive_nerf/nerfs/scene_box.py:11-217). A SceneBox here is
a registered pytree wrapping a (2, 3) float32 AABB so it can flow through jit
boundaries; all geometry ops are pure jnp and vmap/shard-friendly.

Conventions match the reference exactly:
  - aabb[0] = per-axis minima, aabb[1] = per-axis maxima (world DRB frame).
  - ray_aabb_intersect is a vectorized slab test with eps=1e-8; rays that miss
    (or have tmax <= tmin) are tagged with `invalid_value` in BOTH near and far.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SceneBox:
    """An axis-aligned bounding box, (2, 3): row 0 = min, row 1 = max."""

    aabb: Array  # (2, 3) float32

    # -- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self.aabb,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aabb=children[0])

    # -- constructors ----------------------------------------------------
    @classmethod
    def from_bounds(cls, mins, maxs) -> "SceneBox":
        mins = jnp.asarray(mins, dtype=jnp.float32).reshape(3)
        maxs = jnp.asarray(maxs, dtype=jnp.float32).reshape(3)
        return cls(aabb=jnp.stack([mins, maxs], axis=0))

    @classmethod
    def from_bound_scalar(cls, bound: float) -> "SceneBox":
        b = float(bound)
        return cls.from_bounds([-b, -b, -b], [b, b, b])

    @classmethod
    def from_camera_poses(cls, poses_c2w, scale: float = 1.0) -> "SceneBox":
        """AABB of camera centers, symmetrically scaled about its center.

        poses_c2w: (N, 3, 4) or (N, 4, 4); translation in column 3.
        """
        t = jnp.asarray(poses_c2w)[..., :3, 3]  # (N, 3)
        mins = jnp.min(t, axis=0)
        maxs = jnp.max(t, axis=0)
        center = 0.5 * (mins + maxs)
        half = 0.5 * (maxs - mins) * float(scale)
        return cls.from_bounds(center - half, center + half)

    # -- accessors -------------------------------------------------------
    @property
    def min(self) -> Array:
        return self.aabb[0]

    @property
    def max(self) -> Array:
        return self.aabb[1]

    @property
    def extent(self) -> Array:
        return self.aabb[1] - self.aabb[0]

    @property
    def center(self) -> Array:
        return 0.5 * (self.aabb[0] + self.aabb[1])

    def get_diagonal_length(self) -> Array:
        return jnp.linalg.norm(self.extent)

    # -- geometry --------------------------------------------------------
    def within(self, pts: Array, eps: float = 0.0) -> Array:
        """Boolean mask of points inside the (optionally eps-expanded) box."""
        lo = self.aabb[0] - eps
        hi = self.aabb[1] + eps
        return jnp.all((pts >= lo) & (pts <= hi), axis=-1)

    def ray_aabb_intersect(
        self,
        rays_o: Array,  # (..., 3)
        rays_d: Array,  # (..., 3)
        eps: float = 1e-8,
        max_bound: float = 1e10,
        invalid_value: float = 1e10,
    ) -> Tuple[Array, Array]:
        """Vectorized slab test. Returns (tmin, tmax), invalid rays tagged.

        Matches reference semantics (scene_box.py:45-107): directions with
        |d| < eps are treated as parallel to that slab (t range = ±max_bound
        if origin inside, else miss); tmin is clamped to >= 0.
        """
        return ray_aabb_intersect(
            self.aabb, rays_o, rays_d, eps=eps, max_bound=max_bound,
            invalid_value=invalid_value,
        )

    # -- algebra -----------------------------------------------------------
    def expand(self, factor) -> "SceneBox":
        """Expand about center.

        factor: scalar (symmetric multiplier on half-extent), (3,) per-axis
        multiplier, or (2, 3) asymmetric additive offsets (row 0 subtracted
        from min, row 1 added to max).
        """
        f = jnp.asarray(factor, dtype=jnp.float32)
        if f.ndim == 2:  # asymmetric additive
            return SceneBox(
                aabb=jnp.stack([self.aabb[0] - f[0], self.aabb[1] + f[1]])
            )
        center = self.center
        half = 0.5 * self.extent * f
        return SceneBox(aabb=jnp.stack([center - half, center + half]))

    def union(self, other: "SceneBox") -> "SceneBox":
        return SceneBox(
            aabb=jnp.stack(
                [
                    jnp.minimum(self.aabb[0], other.aabb[0]),
                    jnp.maximum(self.aabb[1], other.aabb[1]),
                ]
            )
        )

    @staticmethod
    def reduce_union(boxes) -> "SceneBox":
        out = boxes[0]
        for b in boxes[1:]:
            out = out.union(b)
        return out

    def __repr__(self) -> str:  # numpy-ify for readable logs
        try:
            a = np.asarray(self.aabb)
            return f"SceneBox(min={a[0].tolist()}, max={a[1].tolist()})"
        except Exception:
            return f"SceneBox(aabb={self.aabb})"


def ray_aabb_intersect(
    aabb: Array,  # (2, 3)
    rays_o: Array,  # (..., 3)
    rays_d: Array,  # (..., 3)
    eps: float = 1e-8,
    max_bound: float = 1e10,
    invalid_value: float = 1e10,
) -> Tuple[Array, Array]:
    """Slab-method ray/AABB intersection, fully vectorized (no control flow).

    Degenerate direction components (|d| < eps) are replaced by eps with the
    original sign so 1/d stays finite; the resulting huge t-range is then
    clipped by the other slabs, which matches the reference's handling.
    """
    aabb = jnp.asarray(aabb, dtype=rays_o.dtype)
    d = rays_d
    # avoid division by ~0: replace tiny components with signed eps
    safe_d = jnp.where(jnp.abs(d) < eps, jnp.where(d >= 0, eps, -eps), d)
    inv_d = 1.0 / safe_d

    t0 = (aabb[0] - rays_o) * inv_d  # (..., 3)
    t1 = (aabb[1] - rays_o) * inv_d
    tsmall = jnp.minimum(t0, t1)
    tbig = jnp.maximum(t0, t1)

    tmin = jnp.max(tsmall, axis=-1)
    tmax = jnp.min(tbig, axis=-1)

    tmin = jnp.clip(tmin, 0.0, max_bound)
    tmax = jnp.clip(tmax, -max_bound, max_bound)

    valid = tmax > tmin
    tmin = jnp.where(valid, tmin, invalid_value)
    tmax = jnp.where(valid, tmax, invalid_value)
    return tmin, tmax


@dataclasses.dataclass(frozen=True)
class OrientedBox:
    """Oriented box (R, T, S) — rotation, translation, per-axis size.

    Counterpart of reference OrientedBox (scene_box.py:220-264); used by the
    viewer for crop boxes.
    """

    R: Array  # (3, 3)
    T: Array  # (3,)
    S: Array  # (3,) full sizes

    def within(self, pts: Array) -> Array:
        local = (pts - self.T) @ self.R  # world->local (R columns = axes)
        half = 0.5 * jnp.asarray(self.S)
        return jnp.all(jnp.abs(local) <= half, axis=-1)

    def to_aabb(self) -> SceneBox:
        """Conservative world-space AABB of the oriented box."""
        half = 0.5 * jnp.asarray(self.S)
        # 8 corners in local frame
        signs = jnp.asarray(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            dtype=jnp.float32,
        )
        corners = (signs * half) @ self.R.T + self.T
        return SceneBox.from_bounds(jnp.min(corners, 0), jnp.max(corners, 0))
