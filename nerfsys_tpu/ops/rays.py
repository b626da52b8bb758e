"""Ray generation and packing, TPU-first.

Functional JAX counterpart of the reference ray sampler
(/root/reference/adaptive_nerf/nerfs/ray_sampling.py). Conventions preserved:

  - Cameras are RUB (Right, Up, Back): pixel (i, j) maps to camera-frame
    direction [(i - cx)/fx, -(j - cy)/fy, -1], unit-normalized.
  - World frame is DRB (Down, Right, Back); c2w is (3, 4) [R | t] already in
    that basis (see data/transformations.py in the reference).
  - A packed ray is a (..., 8) array [ox, oy, oz, dx, dy, dz, near, far].
  - Invalid rays carry `inf` (or a large tag value) in near/far.

Everything here is shape-static and differentiable-safe, so it can sit inside
jit/vmap/shard_map without retraces.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nerfsys_tpu.ops.scene_box import SceneBox

Array = jax.Array


# --------------------------- packing ---------------------------------------
def pack_rays(rays_o: Array, rays_d: Array, near: Array, far: Array) -> Array:
    """Pack [o, d, near, far] along the last dim -> (..., 8)."""
    return jnp.concatenate([rays_o, rays_d, near, far], axis=-1)


def unpack_rays(rays: Array) -> Tuple[Array, Array, Array, Array]:
    """Unpack (..., 8) rays -> flat (N,3) origins/dirs and (N,1) near/far."""
    flat = rays.reshape(-1, 8)
    return flat[:, 0:3], flat[:, 3:6], flat[:, 6:7], flat[:, 7:8]


# --------------------------- directions ------------------------------------
def get_ray_directions(
    H: int,
    W: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    center_pixels: bool = True,
    dtype=jnp.float32,
) -> Array:
    """Unit camera-frame (RUB) directions (H, W, 3) for pinhole intrinsics.

    Matches reference ray_sampling.py:111-136: x right, y up (note the minus
    on the j term), z = -1 into the scene.
    """
    j = jnp.arange(H, dtype=dtype)[:, None]  # rows
    i = jnp.arange(W, dtype=dtype)[None, :]  # cols
    if center_pixels:
        i = i + 0.5
        j = j + 0.5
    x = (i - cx) / fx  # (1, W) -> broadcast
    y = -(j - cy) / fy  # (H, 1)
    x = jnp.broadcast_to(x, (H, W))
    y = jnp.broadcast_to(y, (H, W))
    z = -jnp.ones((H, W), dtype=dtype)
    dirs = jnp.stack([x, y, z], axis=-1)
    norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs / jnp.maximum(norm, 1e-12)


def rays_cam_to_world(dirs_cam: Array, c2w: Array) -> Tuple[Array, Array]:
    """Camera-frame directions -> world-frame (origins, directions)."""
    R = c2w[:3, :3]
    t = c2w[:3, 3]
    dirs_w = dirs_cam @ R.T
    org_w = jnp.broadcast_to(t, dirs_w.shape)
    return org_w, dirs_w


# --------------------------- public API ------------------------------------
def get_rays(
    directions: Array,  # (H, W, 3) or (N, 3) camera-frame unit dirs
    c2w: Array,  # (3, 4) or (4, 4)
    scene_box: Optional[SceneBox] = None,
    near: Optional[float] = None,
    far: Optional[float] = None,
    *,
    aabb_max_bound: float = 1e10,
    aabb_invalid_value: float = 1e10,
) -> Array:
    """Build packed rays (..., 8) = [o, d, near, far].

    near/far either come from ray/AABB intersection against `scene_box`
    (per-ray) or from the scalar near/far arguments. Mirrors reference
    ray_sampling.py:50-108.
    """
    lead_shape = directions.shape[:-1]
    rays_o, rays_d = rays_cam_to_world(directions, c2w)
    o_flat = rays_o.reshape(-1, 3)
    d_flat = rays_d.reshape(-1, 3)

    if scene_box is not None:
        tmin, tmax = scene_box.ray_aabb_intersect(
            o_flat, d_flat, eps=1e-8, max_bound=aabb_max_bound,
            invalid_value=aabb_invalid_value,
        )
        near_vals = tmin[:, None]
        far_vals = tmax[:, None]
    else:
        if near is None or far is None:
            raise ValueError("Provide near/far when scene_box is None")
        n = o_flat.shape[0]
        near_vals = jnp.full((n, 1), float(near), dtype=o_flat.dtype)
        far_vals = jnp.full((n, 1), float(far), dtype=o_flat.dtype)

    packed = jnp.concatenate([o_flat, d_flat, near_vals, far_vals], axis=-1)
    return packed.reshape(*lead_shape, 8)


def clamp_rays_near_far(
    rays: Array,  # (N, 8)
    near_override: Optional[float] = None,
    far_override: Optional[float] = None,
    *,
    eps: float = 1e-6,
    invalid_value: float = jnp.inf,
) -> Tuple[Array, Array]:
    """Clamp packed rays' near/far with optional overrides.

    Returns (rays_clamped, valid_mask). Invalid rays (non-finite bounds or
    far <= near + eps) get near = far = invalid_value. Mirrors reference
    ray_sampling.py:139-176 but is branch-free / jit-safe.
    """
    near = rays[:, 6]
    far = rays[:, 7]
    if near_override is not None:
        near = jnp.maximum(near, jnp.asarray(near_override, rays.dtype))
    if far_override is not None:
        far = jnp.minimum(far, jnp.asarray(far_override, rays.dtype))
    valid = jnp.isfinite(near) & jnp.isfinite(far) & (far > near + eps)
    # Treat the reference's 1e10 "miss" tags as invalid too.
    valid = valid & (near < 1e9) & (far < 1e10)
    inv = jnp.asarray(invalid_value, rays.dtype)
    near = jnp.where(valid, near, inv)
    far = jnp.where(valid, far, inv)
    rays = rays.at[:, 6].set(near).at[:, 7].set(far)
    return rays, valid


def frame_chunk_rays(
    c2w: Array,  # (3, 4) or (4, 4), traced
    intrinsics: Array,  # (4,) [fx, fy, cx, cy], traced
    start,  # traced int32 scalar: first flattened pixel index
    count: int,  # static chunk size
    H: int,
    W: int,
    *,
    scene_box: Optional[SceneBox] = None,
    near: Optional[float] = None,
    far: Optional[float] = None,
    near_override: Optional[float] = None,
    far_override: Optional[float] = None,
    center_pixels: bool = True,
) -> Array:
    """Packed rays (count, 8) for flattened pixels [start, start+count) of
    one pinhole frame, generated ON DEVICE (jit-safe; start/c2w/intrinsics
    are traced, so one compiled program serves every chunk and camera).

    Serving-path counterpart of data/ram_rays.frame_rays: uploading a
    frame becomes ~20 floats (pose + intrinsics) instead of H*W*8 — the
    host->device ray transfer (~20 MB at 800² through the axon tunnel)
    dominated the baked frame latency (BASELINE.md 2026-08-19), and the
    host-side ray-gen time leaves the frame budget entirely. Matches
    frame_rays semantics bit-for-bit: same RUB directions, AABB slab
    test with 1e10 miss tags, and clamp/valid policy (invalid rays get
    inf near/far -> background). Indices past H*W-1 clamp to the last
    pixel; callers drop the padded tail.
    """
    idx = start + jnp.arange(count, dtype=jnp.int32)
    idx = jnp.clip(idx, 0, H * W - 1)
    jj = (idx // W).astype(jnp.float32)
    ii = (idx % W).astype(jnp.float32)
    if center_pixels:
        ii = ii + 0.5
        jj = jj + 0.5
    x = (ii - intrinsics[2]) / intrinsics[0]
    y = -(jj - intrinsics[3]) / intrinsics[1]
    z = -jnp.ones_like(x)
    dirs = jnp.stack([x, y, z], axis=-1)
    dirs = dirs / jnp.maximum(
        jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    rays = get_rays(dirs, c2w, scene_box=scene_box, near=near, far=far)
    rays, _ = clamp_rays_near_far(rays, near_override, far_override)
    return rays


def rays_for_camera(
    c2w: Array,
    H: int,
    W: int,
    intrinsics,  # (4,) [fx, fy, cx, cy]
    scene_box: Optional[SceneBox] = None,
    near: Optional[float] = None,
    far: Optional[float] = None,
    center_pixels: bool = True,
) -> Array:
    """Convenience: full-image packed rays (H, W, 8) for one camera."""
    fx, fy, cx, cy = [float(v) for v in intrinsics]
    dirs = get_ray_directions(H, W, fx, fy, cx, cy, center_pixels)
    return get_rays(dirs, c2w, scene_box=scene_box, near=near, far=far)


# --------------------------- NDC parameterization ---------------------------
def ndc_rays(
    H: int,
    W: int,
    fx: float,
    fy: float,
    near: float,
    rays_o: Array,  # (N, 3) world origins (forward-facing, -z into scene)
    rays_d: Array,  # (N, 3) world directions (need not be unit)
) -> Tuple[Array, Array]:
    """Shift forward-facing rays into Normalized Device Coordinates.

    The original-NeRF LLFF parameterization (BASELINE.json north star:
    "LLFF forward-facing with NDC ray parameterization"): rays are first
    advanced to the z = -near plane, then mapped through the perspective
    projection so that t' in [0, 1] sweeps depth from the near plane to
    infinity. Sampling linearly in t' therefore samples linearly in
    DISPARITY in world space — the right spacing for unbounded
    forward-facing captures.

    Assumes the camera looks down -z in a [right, up, back] world (the LLFF
    loader's recentered frame). Returns (o_ndc, d_ndc), each (N, 3); render
    with near=0, far=1.
    """
    # advance origins to the near plane
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox, oy, oz = rays_o[..., 0], rays_o[..., 1], rays_o[..., 2]
    dx, dy, dz = rays_d[..., 0], rays_d[..., 1], rays_d[..., 2]

    o0 = -1.0 / (W / (2.0 * fx)) * ox / oz
    o1 = -1.0 / (H / (2.0 * fy)) * oy / oz
    o2 = 1.0 + 2.0 * near / oz
    d0 = -1.0 / (W / (2.0 * fx)) * (dx / dz - ox / oz)
    d1 = -1.0 / (H / (2.0 * fy)) * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz

    o_ndc = jnp.stack([o0, o1, o2], axis=-1)
    d_ndc = jnp.stack([d0, d1, d2], axis=-1)
    return o_ndc, d_ndc
