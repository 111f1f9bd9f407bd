"""Device-resident SLAM stepper: the whole per-frame update — feature
extraction, odometry, local-map tracking, keyframe decision AND insertion —
as one jitted program with zero per-frame host round-trips.

Motivation: on pod/tunnel deployments a device->host read costs tens of
milliseconds regardless of size, so any per-frame scalar pull caps the
pipeline far below the device's actual speed (the compute itself is
~1-2 ms/frame).  The reference faces the same structural problem with its
pthread handoffs and solves it with a background mapping thread
(main.cpp:85); the TPU equivalent is:

  * tracking hot path: `slam_step` — fully on device, keyframe insertion
    under `lax.cond` (the branch executes only when taken), pose appended
    to a device-side ring buffer;
  * "LocalMapping thread": the host triggers the per-keyframe refinement
    sequence (fuse/cull/local BA) at a low cadence after reading the
    keyframe counter — one small d2h read every `sync_every` frames.

The host Tracking class (models/tracking.py) remains the step-by-step
reference implementation; this module is the production path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from aslam_tpu.config import SystemConfig
from aslam_tpu.models import frame as frame_mod
from aslam_tpu.models import mapstate as ms
from aslam_tpu.models.extractor import init_adaptive_state
from aslam_tpu.models.odometry import rba_step
from aslam_tpu.models.tracking import carry_associations, track_local_map
from aslam_tpu.utils.se3 import pose_distance


class SlamState(NamedTuple):
    m: ms.MapState
    last_frame: frame_mod.FrameData
    last_assoc: jnp.ndarray     # [M]
    last_kf_T: jnp.ndarray      # [4,4]
    grid_thresholds: jnp.ndarray
    n_kfs: jnp.ndarray          # scalar int32
    next_lm: jnp.ndarray        # scalar int32
    kf_counter: jnp.ndarray     # scalar int32


def init_slam(cfg: SystemConfig, img: np.ndarray, depth: np.ndarray) -> SlamState:
    """Bootstrap: first frame becomes KF 0 with landmarks from every
    valid-depth keypoint (tracking.cpp:80-121)."""
    ad = init_adaptive_state(cfg.extractor)
    frame, ad = frame_mod.make_frame(
        jnp.asarray(img), jnp.asarray(depth), cfg, ad)
    frame = frame_mod.with_pose(frame, jnp.eye(4))
    M = cfg.extractor.max_keypoints
    m = ms.init_map(cfg)
    assoc = jnp.full((M,), -1, jnp.int32)
    m = ms.insert_keyframe(m, frame, assoc, jnp.int32(0), jnp.int32(0))
    m, assoc, n_created = ms.create_landmarks(
        m, frame, assoc, jnp.int32(0), jnp.int32(0),
        max_new=M, th_depth=float(cfg.camera.th_depth),
    )
    return SlamState(
        m=m, last_frame=frame, last_assoc=assoc,
        last_kf_T=frame.T_cw, grid_thresholds=ad.grid_thresholds,
        n_kfs=jnp.int32(1), next_lm=n_created.astype(jnp.int32),
        kf_counter=jnp.int32(1),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "height", "width"))
def slam_step(
    state: SlamState,
    img: jnp.ndarray,
    depth: jnp.ndarray,
    key: jnp.ndarray,
    cfg: SystemConfig,
    height: int,
    width: int,
):
    """One frame, fully on device.  Returns (state', T_cw, stats[9]):
    stats = [n_tracked, n_matches, ransac_inliers, kf_dist, kf_rot,
    rmse, inserted_kf, n_kfs, proj_overflow]."""
    frame, new_grid = frame_mod._make_frame_impl(
        img, depth, state.grid_thresholds, cfg, height, width)

    if cfg.use_gicp:
        # ADAPTIVE_RICP: GICP escalation under lax.cond, still one program
        from aslam_tpu.models.odometry import ricp_fused

        odo = ricp_fused(state.last_frame, frame, key, cfg)
    else:
        odo = rba_step(state.last_frame, frame, key, cfg)
    frame = frame_mod.with_pose(frame, odo.T_cw2)
    assoc = carry_associations(state.last_assoc, odo.match_idx, odo.inliers)
    # odometry/map fusion gate (mirrors tracking.track_step): the stiff
    # motion prior only anchors the local-map pose solve when odometry
    # itself was healthy — a failed RANSAC must not pin the frame to a
    # bad/stale pose that map evidence could otherwise correct.
    odo_ok = odo.n_inliers >= cfg.ransac.min_inliers
    w_prior = jnp.where(odo_ok, cfg.tracking.pose_prior_weight, 0.0)
    lm_res = track_local_map(state.m, frame, assoc, cfg,
                             prior_weight=w_prior)
    frame = frame_mod.with_pose(frame, lm_res.T_cw)
    assoc = lm_res.assoc
    m = state.m._replace(
        lm_visible=state.m.lm_visible
        + lm_res.visible_mask.astype(jnp.int32),
        lm_found=state.m.lm_found + lm_res.found_mask.astype(jnp.int32),
    )

    dt, dr = pose_distance(state.last_kf_T, frame.T_cw)
    # capacity = any free slot (culling frees rows for reuse)
    need_kf = (
        ((dt > cfg.tracking.kf_min_trans) | (dr > cfg.tracking.kf_min_rot))
        & ~jnp.all(m.kf_valid)
    )

    def insert(args):
        m, assoc = args
        slot = jnp.argmin(m.kf_valid).astype(jnp.int32)  # first free row
        kf_id = state.kf_counter
        m = ms.insert_keyframe(m, frame, assoc, slot, kf_id)
        m, assoc, n_created = ms.create_landmarks(
            m, frame, assoc, slot, kf_id,
            max_new=cfg.tracking.max_vo_points,
            th_depth=float(cfg.camera.th_depth),
        )
        return m, assoc, state.n_kfs + 1, state.next_lm + n_created, \
            state.kf_counter + 1, frame.T_cw

    def skip(args):
        m, assoc = args
        return m, assoc, state.n_kfs, state.next_lm, state.kf_counter, \
            state.last_kf_T

    m, assoc, n_kfs, next_lm, kf_counter, last_kf_T = jax.lax.cond(
        need_kf, insert, skip, (m, assoc))

    new_state = SlamState(
        m=m, last_frame=frame, last_assoc=assoc, last_kf_T=last_kf_T,
        grid_thresholds=new_grid, n_kfs=n_kfs, next_lm=next_lm,
        kf_counter=kf_counter,
    )
    stats = jnp.stack([
        lm_res.n_tracked.astype(jnp.float32),
        odo.n_matches.astype(jnp.float32),
        odo.n_inliers.astype(jnp.float32),
        dt, dr, odo.rmse,
        need_kf.astype(jnp.float32),
        n_kfs.astype(jnp.float32),
        lm_res.n_overflow.astype(jnp.float32),
    ])
    return new_state, frame.T_cw, stats


@functools.partial(jax.jit, static_argnames=("cfg", "height", "width"))
def slam_scan(
    state: SlamState,
    key: jnp.ndarray,
    imgs: jnp.ndarray,    # [T,H,W]
    depths: jnp.ndarray,  # [T,H,W]
    cfg: SystemConfig,
    height: int,
    width: int,
):
    """Chained multi-frame SLAM: `lax.scan` of `slam_step` over a frame
    chunk — ONE device program per chunk instead of one per frame.

    The PRNG key is carried through the scan with the same
    `split(key) -> (key, sub)` recurrence the streaming wrapper uses, so a
    chunked run matches the frame-by-frame path given the same starting
    key (test-enforced; agreement is exact up to cross-program
    floating-point reassociation — see test_batch_vo for the mechanism).  Dispatch latency, not device compute,
    bounds the streaming rate (docs/PERF.md), so chunking amortizes it
    chunk-length-fold for recorded-sequence / serving workloads.

    Returns (state', key', T_cw [T,4,4], stats [T,8]).
    """

    def step(carry, xs):
        st, k = carry
        img, depth = xs
        k, sub = jax.random.split(k)
        st, T, stats = slam_step(st, img, depth, sub, cfg, height, width)
        return (st, k), (T, stats)

    (state, key), (Ts, stats) = jax.lax.scan(
        step, (state, key), (imgs, depths))
    return state, key, Ts, stats


class DeviceSlam:
    """Host wrapper: streams frames into `slam_step`, accumulates poses on
    device, and runs the mapping refinements ("LocalMapping thread") at a
    low cadence keyed off the keyframe counter."""

    def __init__(self, cfg: SystemConfig, seed: int = 0, sync_every: int = 8):
        self.cfg = cfg
        self.key = jax.random.PRNGKey(seed)
        self.sync_every = sync_every
        self.state: SlamState | None = None
        self.pose_buf: list = []
        self.stats_buf: list = []
        self.timestamps: list[float] = []
        self.n_processed = 0
        self.last_mapped_id = 0      # kf_id high-water mark through mapping
        from aslam_tpu.models.localmapping import LocalMapping

        self.local_mapping = LocalMapping(cfg)

    def process(self, img: np.ndarray, depth: np.ndarray, t: float = 0.0):
        if self.state is None:
            self.state = init_slam(self.cfg, img, depth)
            self.pose_buf.append(self.state.last_frame.T_cw)
            self.timestamps.append(t)
            self.n_processed += 1
            return
        self.key, sub = jax.random.split(self.key)
        h, w = img.shape
        self.state, T, stats = slam_step(
            self.state, jnp.asarray(img), jnp.asarray(depth), sub,
            self.cfg, h, w)
        self.pose_buf.append(T)
        self.stats_buf.append(stats)
        self.timestamps.append(t)
        self.n_processed += 1
        if self.n_processed % self.sync_every == 0:
            self._background_mapping()

    def process_chunk(self, imgs: np.ndarray, depths: np.ndarray,
                      ts=None):
        """Feed a chunk of frames through `slam_scan` (one dispatch).
        Bit-identical to calling `process` per frame, minus the
        per-frame mapping-cadence checks (mapping runs once per chunk)."""
        n = len(imgs)
        if ts is None:
            ts = [0.0] * n
        start = 0
        if self.state is None:
            self.process(np.asarray(imgs[0]), np.asarray(depths[0]), ts[0])
            start = 1
        if start >= n:
            return
        h, w = np.asarray(imgs[0]).shape
        self.state, self.key, Ts, stats = slam_scan(
            self.state, self.key, jnp.asarray(imgs[start:]),
            jnp.asarray(depths[start:]), self.cfg, h, w)
        self.pose_buf.extend(Ts[i] for i in range(n - start))
        self.stats_buf.extend(stats[i] for i in range(n - start))
        self.timestamps.extend(ts[start:])
        before = self.n_processed
        self.n_processed += n - start
        # same cadence as streaming: map when a sync boundary was crossed
        # (at chunk end rather than mid-chunk)
        if self.n_processed // self.sync_every != before // self.sync_every:
            self._background_mapping()

    def _background_mapping(self):
        """The 'LocalMapping thread': refine newly inserted keyframes.
        One small d2h read of the id/validity rows per sync (slots are
        reused after culling, so new KFs are found by kf_id)."""
        kf_id = np.asarray(self.state.m.kf_id)
        kf_valid = np.asarray(self.state.m.kf_valid)
        n_live = int(kf_valid.sum())
        fresh = np.nonzero(kf_valid & (kf_id > self.last_mapped_id))[0]
        for slot in fresh[np.argsort(kf_id[fresh])]:
            m = self.local_mapping.process_keyframe(
                self.state.m, int(slot), int(kf_id[slot]), n_live)
            self.state = self.state._replace(m=m)
            self.last_mapped_id = max(self.last_mapped_id, int(kf_id[slot]))

    @property
    def kfs_mapped(self) -> int:
        return self.last_mapped_id + 1

    def finish(self):
        """Flush mapping and pull the trajectory (one batched read)."""
        self._background_mapping()
        traj = np.asarray(jnp.stack(self.pose_buf))
        stats = (np.stack([np.asarray(s) for s in self.stats_buf])
                 if self.stats_buf else np.zeros((0, 9)))
        return traj, stats
