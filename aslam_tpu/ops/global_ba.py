"""Global bundle adjustment over the whole map.

Replaces `GlobalBundleAdjustment::Compute` (reference
globalbundleadjustment.cpp:18-191 — g2o LM over all KFs/landmarks, info =
identity, optional robust kernel; never called from the live pipeline).

TPU-native design: at map scale the dense-blocked Schur complement of
ops/lba.py would materialize a [C, L, 6, 3] coupling tensor (gigabytes at
256 KFs x 32k landmarks), so global BA instead uses **alternating
resection-intersection sweeps** (the first-order BA family, cf. FastMap):

  pose sweep:   per-keyframe 6x6 Gauss-Newton with landmarks fixed —
                the edge list IS the kf_lm row structure, so this is one
                batched [K, M] residual evaluation + [K] solves, zero
                gather irregularity and embarrassingly parallel;
  point sweep:  per-landmark 3x3 Gauss-Newton with poses fixed —
                segment-sum scatter + batched 3x3 solves.

Each sweep is one jitted call; the distributed variant shards the KF axis
for pose sweeps (no communication) and psum-reduces landmark blocks
(parallel/sharded_ba.py pattern).  Convergence is linear rather than
quadratic, but each sweep costs O(edges) with perfect locality — the
right trade on this hardware; the windowed Schur solver remains available
for final polishing of bounded subsets.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from aslam_tpu.config import BAConfig, CameraModel
from aslam_tpu.models.mapstate import MapState
from aslam_tpu.ops.ba import huber_weight, project_residual_jac
from aslam_tpu.utils.se3 import se3_exp


class GlobalBAStats(NamedTuple):
    chi2: jnp.ndarray
    n_edges: jnp.ndarray


def _edge_terms(m: MapState, cam: CameraModel, cfg: BAConfig, robust: bool):
    """Residual/Jacobian arrays over the [K, M] observation grid."""
    K, M = m.kf_lm.shape
    lm = jnp.maximum(m.kf_lm, 0)
    pts = m.lm_pos[lm]                                   # [K,M,3]

    def per_kf(T, p, uv, ur):
        return project_residual_jac(T, p, uv, ur, cam)

    r, Jc, Jp, depth_ok = jax.vmap(per_kf)(
        m.kf_T_cw, pts, m.kf_xy, m.kf_ur
    )                                                    # [K,M,...]
    is_stereo = m.kf_ur >= 0
    row_mask = jnp.stack(
        [jnp.ones_like(is_stereo), jnp.ones_like(is_stereo), is_stereo], -1
    )
    r = jnp.where(row_mask, r, 0.0)
    Jc = jnp.where(row_mask[..., None], Jc, 0.0)
    Jp = jnp.where(row_mask[..., None], Jp, 0.0)

    info = jnp.where(m.kf_z > 1e-3, 1.0 / jnp.maximum(m.kf_z, 1e-3) ** 2, 0.0)
    chi2 = jnp.sum(r * r, -1) * info
    chi2_th = jnp.where(is_stereo, cfg.chi2_stereo, cfg.chi2_mono)
    w_huber = huber_weight(chi2, chi2_th) if robust else jnp.ones_like(chi2)
    active = (
        (m.kf_lm >= 0) & m.kf_kp_valid & m.kf_valid[:, None]
        & m.lm_valid[lm] & depth_ok
    )
    w = info * w_huber * active
    return r, Jc, Jp, w, chi2, active, lm


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "robust"))
def ba_sweep(m: MapState, cam: CameraModel, cfg: BAConfig,
             robust: bool = True, lam: float = 1e-4):
    """One alternating sweep: pose update then point update."""
    K, M = m.kf_lm.shape
    L = m.lm_pos.shape[0]

    # ---- pose sweep (landmarks fixed) ----
    r, Jc, _, w, _, _, _ = _edge_terms(m, cam, cfg, robust)
    H = jnp.einsum("km,kmri,kmrj->kij", w, Jc, Jc)       # [K,6,6]
    b = jnp.einsum("km,kmri,kmr->ki", w, Jc, r)
    H = H + lam * jnp.eye(6) * jnp.maximum(
        jnp.trace(H, axis1=-2, axis2=-1)[:, None, None] / 6.0, 1e-6
    ) + 1e-8 * jnp.eye(6)
    dx = -jnp.linalg.solve(H, b[..., None])[..., 0]
    dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
    # gauge: hold the oldest valid KF fixed
    oldest = jnp.argmax(jnp.where(m.kf_valid, -m.kf_id, -(2**30)))
    freeze = (jnp.arange(K) == oldest) | ~m.kf_valid
    dx = jnp.where(freeze[:, None], 0.0, dx)
    new_T = jax.vmap(se3_exp)(dx) @ m.kf_T_cw
    m = m._replace(kf_T_cw=new_T)

    # ---- point sweep (poses fixed) ----
    r, _, Jp, w, chi2, active, lm = _edge_terms(m, cam, cfg, robust)
    wJp = w[..., None, None] * Jp                        # [K,M,3,3]
    Hll = jnp.zeros((L, 3, 3)).at[lm].add(
        jnp.einsum("kmri,kmrj->kmij", wJp, Jp)
    )
    bl = jnp.zeros((L, 3)).at[lm].add(
        jnp.einsum("kmri,kmr->kmi", wJp, r)
    )
    Hll = Hll + lam * jnp.eye(3) * jnp.maximum(
        jnp.trace(Hll, axis1=-2, axis2=-1)[:, None, None] / 3.0, 1e-6
    ) + 1e-8 * jnp.eye(3)
    dxl = -jnp.linalg.solve(Hll, bl[..., None])[..., 0]
    dxl = jnp.where(m.lm_valid[:, None] & jnp.isfinite(dxl), dxl, 0.0)
    m = m._replace(lm_pos=m.lm_pos + dxl)

    stats = GlobalBAStats(
        chi2=jnp.sum(jnp.where(active, chi2, 0.0)),
        n_edges=jnp.sum(active.astype(jnp.int32)),
    )
    return m, stats


def global_ba(m: MapState, cam: CameraModel, cfg: BAConfig,
              iters: int = 20, robust_iters: int = 10):
    """Full-map refinement: robust sweeps then plain sweeps (mirrors the
    5+10 robust/plain split of the local schedule at map scale)."""
    stats = None
    for i in range(iters):
        m, stats = ba_sweep(m, cam, cfg, robust=(i < robust_iters))
    return m, stats


# ------------------------------------------------------------------ chunked

@functools.partial(
    jax.jit, static_argnames=("cam", "cfg", "robust", "kf_chunk")
)
def ba_sweep_chunked(m: MapState, cam: CameraModel, cfg: BAConfig,
                     robust: bool = True, lam: float = 1e-4,
                     kf_chunk: int = 256):
    """Memory-bounded sweep for 10k+-keyframe maps (BASELINE config 5).

    The dense sweep materializes [K, M, 3, 6] Jacobian blocks (~0.8 GB at
    10k x 1k); this variant streams KF rows in chunks of `kf_chunk`
    through a fori_loop, keeping peak extra memory at
    O(kf_chunk * M * 18) while accumulating the landmark normal equations
    across chunks.  Bitwise-equivalent math to ba_sweep.
    """
    K, M = m.kf_lm.shape
    L = m.lm_pos.shape[0]
    assert K % kf_chunk == 0, f"K={K} must divide by kf_chunk={kf_chunk}"
    n_chunks = K // kf_chunk
    oldest = jnp.argmax(jnp.where(m.kf_valid, -m.kf_id, -(2**30)))

    def chunk_view(c):
        s = c * kf_chunk
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, s, kf_chunk)  # noqa: E731
        return m._replace(
            kf_T_cw=sl(m.kf_T_cw), kf_valid=sl(m.kf_valid),
            kf_id=sl(m.kf_id), kf_xy=sl(m.kf_xy), kf_ur=sl(m.kf_ur),
            kf_z=sl(m.kf_z), kf_desc=sl(m.kf_desc),
            kf_octave=sl(m.kf_octave), kf_kp_valid=sl(m.kf_kp_valid),
            kf_lm=sl(m.kf_lm),
        )

    # ---- pose sweep, chunked ----
    def pose_body(c, kf_T_new):
        mc = chunk_view(c)
        r, Jc, _, w, _, _, _ = _edge_terms(mc, cam, cfg, robust)
        H = jnp.einsum("km,kmri,kmrj->kij", w, Jc, Jc)
        b = jnp.einsum("km,kmri,kmr->ki", w, Jc, r)
        H = H + lam * jnp.eye(6) * jnp.maximum(
            jnp.trace(H, axis1=-2, axis2=-1)[:, None, None] / 6.0, 1e-6
        ) + 1e-8 * jnp.eye(6)
        dx = -jnp.linalg.solve(H, b[..., None])[..., 0]
        rows = c * kf_chunk + jnp.arange(kf_chunk)
        freeze = (rows == oldest) | ~mc.kf_valid
        dx = jnp.where(jnp.isfinite(dx) & ~freeze[:, None], dx, 0.0)
        upd = jax.vmap(se3_exp)(dx) @ mc.kf_T_cw
        return jax.lax.dynamic_update_slice_in_dim(
            kf_T_new, upd, c * kf_chunk, axis=0)

    kf_T = jax.lax.fori_loop(0, n_chunks, pose_body, m.kf_T_cw)
    m = m._replace(kf_T_cw=kf_T)

    # ---- point sweep, accumulated over chunks ----
    def point_body(c, acc):
        Hll, bl, chi2_sum, n_act = acc
        mc = chunk_view(c)
        r, _, Jp, w, chi2, active, lm = _edge_terms(mc, cam, cfg, robust)
        wJp = w[..., None, None] * Jp
        Hll = Hll.at[lm].add(jnp.einsum("kmri,kmrj->kmij", wJp, Jp))
        bl = bl.at[lm].add(jnp.einsum("kmri,kmr->kmi", wJp, r))
        chi2_sum = chi2_sum + jnp.sum(jnp.where(active, chi2, 0.0))
        n_act = n_act + jnp.sum(active.astype(jnp.int32))
        return Hll, bl, chi2_sum, n_act

    Hll, bl, chi2_sum, n_act = jax.lax.fori_loop(
        0, n_chunks, point_body,
        (jnp.zeros((L, 3, 3)), jnp.zeros((L, 3)), jnp.float32(0),
         jnp.int32(0)),
    )
    Hll = Hll + lam * jnp.eye(3) * jnp.maximum(
        jnp.trace(Hll, axis1=-2, axis2=-1)[:, None, None] / 3.0, 1e-6
    ) + 1e-8 * jnp.eye(3)
    dxl = -jnp.linalg.solve(Hll, bl[..., None])[..., 0]
    dxl = jnp.where(m.lm_valid[:, None] & jnp.isfinite(dxl), dxl, 0.0)
    m = m._replace(lm_pos=m.lm_pos + dxl)
    return m, GlobalBAStats(chi2=chi2_sum, n_edges=n_act)
