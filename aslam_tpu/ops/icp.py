"""ICP refinement: projective data association + point-to-plane
Gauss-Newton with per-correspondence robust weights.

Replaces both the PCL GICP wrapper (reference
Odometry/generalizedicp.{h,cpp}: plane-to-plane GICP, 10-15 iters,
max_corr_dist 0.05-0.07, adaptive correspondence distance clamped
[0.01, 0.08], generalizedicp.cpp:91-134) and the vendored libicp
(Odometry/icp/: kd-tree point-to-plane, commented out of the build).

TPU-native redesign (SURVEY.md §7.3 item 4: kd-trees don't map to TPU):
correspondences come from *projective association* — transform source
points, project into the target depth image, gather the target point +
normal at that pixel.  This is O(N) gathers instead of O(N log N) tree
walks, fully batched, and the standard choice for frame-to-frame RGB-D
ICP (KinectFusion-style).  Normals come from a dense cross-product over
the backprojected depth image (replacing PCL normal estimation,
utils.cpp:168-182).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from aslam_tpu.config import CameraModel, ICPConfig
from aslam_tpu.ops.linalg import chol_solve
from aslam_tpu.utils.se3 import se3_exp


class ICPResult(NamedTuple):
    T12: jnp.ndarray        # refined source-cam -> target-cam transform
    rmse: jnp.ndarray       # scalar: sqrt(mean point-to-plane residual^2)
    n_corr: jnp.ndarray     # scalar int32 correspondences in final iter
    converged: jnp.ndarray  # scalar bool


def backproject_depth(depth: jnp.ndarray, cam: CameraModel) -> jnp.ndarray:
    """Depth image [H,W] -> camera-frame point image [H,W,3] (0 where
    invalid)."""
    H, W = depth.shape
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    x = (u - cam.cx) / cam.fx * depth
    y = (v - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def normal_map(points: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel normals from central differences of the point image:
    n = normalize(dP/du x dP/dv), oriented toward the camera.  Zero where
    neighbors are invalid (depth holes)."""
    du = jnp.roll(points, -1, axis=1) - jnp.roll(points, 1, axis=1)
    dv = jnp.roll(points, -1, axis=0) - jnp.roll(points, 1, axis=0)
    n = jnp.cross(du, dv)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-9)
    # orient toward camera (points have +z away): n.z should be negative
    flip = jnp.sum(n * points, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    ok = (
        valid
        & jnp.roll(valid, -1, axis=1) & jnp.roll(valid, 1, axis=1)
        & jnp.roll(valid, -1, axis=0) & jnp.roll(valid, 1, axis=0)
        & (norm[..., 0] > 1e-9)
    )
    return jnp.where(ok[..., None], n, 0.0)


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def icp_refine(
    src_pts: jnp.ndarray,     # [N,3] source camera-frame points
    src_valid: jnp.ndarray,   # [N] bool
    target_depth: jnp.ndarray,  # [H,W] target frame depth (m)
    T12_init: jnp.ndarray,    # [4,4] initial source->target transform
    cam: CameraModel,
    cfg: ICPConfig,
) -> ICPResult:
    """Point-to-plane ICP of a source point set onto a target depth map."""
    H, W = target_depth.shape
    tgt_valid = target_depth > 0.05
    tgt_pts = backproject_depth(target_depth, cam)
    tgt_n = normal_map(tgt_pts, tgt_valid)

    def corr_terms(T, max_d):
        p = src_pts @ T[:3, :3].T + T[:3, 3]          # [N,3] in target cam
        z = p[:, 2]
        u = jnp.clip(jnp.round(cam.fx * p[:, 0] / jnp.maximum(z, 1e-6) + cam.cx
                               ).astype(jnp.int32), 0, W - 1)
        v = jnp.clip(jnp.round(cam.fy * p[:, 1] / jnp.maximum(z, 1e-6) + cam.cy
                               ).astype(jnp.int32), 0, H - 1)
        q = tgt_pts[v, u]
        n = tgt_n[v, u]
        has_n = jnp.sum(n * n, axis=-1) > 0.5
        d = p - q
        dist = jnp.linalg.norm(d, axis=-1)
        r = jnp.sum(n * d, axis=-1)                   # point-to-plane
        ok = (
            src_valid & (z > 0.05) & tgt_valid[v, u] & has_n
            & (dist < max_d)
        )
        return p, n, r, ok

    def body(carry, _):
        T, max_d = carry
        p, n, r, ok = corr_terms(T, max_d)
        w = ok.astype(jnp.float32)
        # J = [n, p x n] for left-multiplicative twist [rho, phi]
        J = jnp.concatenate([n, jnp.cross(p, n)], axis=-1)    # [N,6]
        Hm = jnp.einsum("n,ni,nj->ij", w, J, J) + 1e-6 * jnp.eye(6)
        b = jnp.einsum("n,ni,n->i", w, J, r)
        xi = -chol_solve(Hm, b)
        xi = jnp.where(jnp.all(jnp.isfinite(xi)), xi, jnp.zeros(6))
        T_new = se3_exp(xi) @ T
        # adaptive correspondence distance from the residual scale
        # (generalizedicp.cpp:91-134: clamp to [0.01, 0.08])
        n_ok = jnp.maximum(jnp.sum(w), 1.0)
        mean_abs = jnp.sum(jnp.abs(r) * w) / n_ok
        new_max = jnp.clip(3.0 * mean_abs, 0.01, 0.08)
        return (T_new, new_max), None

    init = (T12_init, jnp.asarray(cfg.max_corr_dist, jnp.float32))
    (T, max_d), _ = jax.lax.scan(body, init, None, length=cfg.iterations)

    _, _, r, ok = corr_terms(T, max_d)
    n_corr = jnp.sum(ok.astype(jnp.int32))
    rmse = jnp.sqrt(
        jnp.sum(jnp.where(ok, r * r, 0.0)) / jnp.maximum(n_corr, 1)
    )
    converged = (n_corr >= 10) & jnp.all(jnp.isfinite(T))
    T = jnp.where(converged, T, T12_init)
    return ICPResult(T12=T, rmse=rmse, n_corr=n_corr, converged=converged)


@functools.partial(jax.jit, static_argnames=("cell",))
def voxel_downsample(pts: jnp.ndarray, valid: jnp.ndarray, cell: float = 0.03,
                     max_out: int | None = None):
    """Voxel-grid thinning (replaces pcl::VoxelGrid, frame.cpp:217-238):
    keeps one representative point per occupied voxel via hash-dedup.

    Returns (pts, keep_mask) — same length, padded semantics preserved."""
    q = jnp.floor(pts / cell).astype(jnp.int32)
    # hash voxel coords; first point per hash wins
    h = (q[:, 0] * 73856093) ^ (q[:, 1] * 19349663) ^ (q[:, 2] * 83492791)
    h = jnp.where(valid, h, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(h)
    sorted_h = h[order]
    first = jnp.concatenate([
        jnp.ones((1,), bool), sorted_h[1:] != sorted_h[:-1]
    ])
    keep_sorted = first & (sorted_h != jnp.iinfo(jnp.int32).max)
    keep = jnp.zeros_like(valid).at[order].set(keep_sorted)
    return pts, keep & valid
