"""SLAM system facade: tracking + local mapping (+ loop closing).

Replaces the reference driver wiring (main.cpp:25-143): constructs the
subsystems, feeds frames, exports trajectories.  Where the reference spawns
pthreads (main.cpp:79-85), the TPU engine interleaves jitted stages on the
host thread — JAX's async dispatch overlaps device work with host
orchestration, and every map update is a pure function, so the 19 mutexes
of the reference have no equivalent here.
"""

from __future__ import annotations

import numpy as np

from aslam_tpu.config import SystemConfig
from aslam_tpu.models.localmapping import LocalMapping
from aslam_tpu.models.tracking import Tracking
from aslam_tpu.utils import trajectory


class SlamSystem:
    def __init__(self, cfg: SystemConfig | None = None, seed: int = 0):
        self.cfg = cfg or SystemConfig()
        self.tracking = Tracking(self.cfg, seed=seed)
        self.local_mapping = LocalMapping(self.cfg)
        self.loop_closing = None
        if self.cfg.use_loop_closing:
            from aslam_tpu.models.loopclosing import LoopClosing

            self.loop_closing = LoopClosing(self.cfg)
            self.tracking.relocalizer = self.loop_closing

    def process(self, img: np.ndarray, depth: np.ndarray, t: float = 0.0):
        if self.tracking.state == "NEW_SEQUENCE":
            return self._anchor_new_sequence(img, depth, t)
        T, info = self.tracking.track(img, depth, t)
        if info.get("new_kf"):
            slot = self.tracking.new_kf_slots[-1]
            kf_id = self.tracking.kf_counter - 1
            self.tracking.map = self.local_mapping.process_keyframe(
                self.tracking.map, slot, kf_id, self.tracking.n_kfs
            )
            if self.loop_closing is not None:
                self.tracking.map = self.loop_closing.process_keyframe(
                    self.tracking.map, slot, kf_id
                )
        return T, info

    def new_sequence(self) -> None:
        """Start a new input sequence into the SAME map (multi-sequence
        mapping, BASELINE config 5).  Tracking state resets; the first
        frame of the new sequence is anchored by relocalization against
        the existing map (if loop closing / vocabulary is available),
        otherwise it continues from the last pose."""
        t = self.tracking
        t.last_frame = None
        t.last_assoc = None
        t.state = "NEW_SEQUENCE"

    def _anchor_new_sequence(self, img, depth, t_stamp):
        import jax.numpy as jnp

        from aslam_tpu.models import frame as frame_mod

        tr = self.tracking
        frame, tr.adaptive = frame_mod.make_frame(
            np.asarray(img, np.float32), np.asarray(depth, np.float32),
            self.cfg, tr.adaptive)
        T0 = None
        if self.loop_closing is not None:
            T0 = self.loop_closing.relocalize(tr.map, frame)
        if T0 is None:
            T0 = tr.last_kf_T if tr.last_kf_T is not None else np.eye(4)
        frame = frame_mod.with_pose(frame, jnp.asarray(T0))
        # bootstrap landmark bindings from the existing map so tracking
        # has a covisibility seed (no prior associations exist yet)
        from aslam_tpu.models.tracking import bootstrap_track

        T_b, assoc, n_b = bootstrap_track(tr.map, frame, self.cfg)
        if int(n_b) >= 10:
            frame = frame_mod.with_pose(frame, T_b)
        tr.last_frame = frame
        tr.last_assoc = assoc
        tr.state = "OK"
        tr.poses.append(np.asarray(frame.T_cw))
        tr.timestamps.append(t_stamp)
        tr.stats.append({"new_sequence": True})
        return np.asarray(frame.T_cw), {"new_sequence": True,
                                        "relocalized": T0 is not None}

    # -- exports (main.cpp:124-126) -----------------------------------
    def save_trajectory(self, path: str) -> None:
        trajectory.save_tum_trajectory(
            path, np.asarray(self.tracking.timestamps),
            np.stack(self.tracking.poses),
        )

    def save_keyframe_trajectory(self, path: str) -> None:
        m = self.tracking.map
        valid = np.asarray(m.kf_valid)
        poses = np.asarray(m.kf_T_cw)[valid]
        ids = np.asarray(m.kf_id)[valid]
        order = np.argsort(ids)
        trajectory.save_tum_trajectory(
            path, ids[order].astype(np.float64), poses[order]
        )

    def save_observation_histogram(self, path: str) -> None:
        """Histogram of per-landmark observation counts
        (SaveObservationHistogram, tracking.cpp:609-631 writes
        Histogram.csv)."""
        from aslam_tpu.models import mapstate as ms

        obs = np.asarray(ms.observation_counts(self.tracking.map))
        valid = np.asarray(self.tracking.map.lm_valid)
        counts = np.bincount(obs[valid], minlength=1)
        with open(path, "w") as f:
            f.write("n_observations,n_landmarks\n")
            for n, c in enumerate(counts):
                f.write(f"{n},{int(c)}\n")

    @property
    def map(self):
        return self.tracking.map
