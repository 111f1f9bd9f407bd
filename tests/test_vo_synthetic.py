"""End-to-end frame-to-frame odometry on a synthetic scene (config-1 slice).

The reference validated this stage by running on TUM fr1 and eyeballing ATE
plots; here the synthetic generator gives exact ground truth so the whole
extract -> match -> RANSAC -> motion-BA path is checked quantitatively.
"""

import numpy as np

from aslam_tpu.config import small_config
from aslam_tpu.models.vo import VisualOdometry
from aslam_tpu.utils import synthetic, trajectory, se3


def test_vo_tracks_synthetic_sequence():
    imgs, depths, poses_gt, _ = synthetic.make_sequence(
        n_frames=6, n_points=500, seed=3
    )
    vo = VisualOdometry(small_config())
    for i in range(len(imgs)):
        vo.process(imgs[i], depths[i], t=i * 0.03)

    assert len(vo.poses) == 6
    # enough matches/inliers on every tracked frame
    for s in vo.stats:
        assert s["n_matches"] >= 30, s
        assert s["n_inliers"] >= 20, s

    centers_est = np.stack([np.asarray(se3.T_inv(T))[:3, 3] for T in vo.poses])
    centers_gt = np.stack([np.asarray(se3.T_inv(T))[:3, 3] for T in poses_gt])
    ate = trajectory.ate_rmse(centers_est, centers_gt)
    # frame steps are ~2 cm; demand sub-centimeter ATE over the clip
    assert ate < 0.01, f"ATE {ate:.4f} m too high"

    # rotation error of the final pose
    R_err = np.asarray(vo.poses[-1])[:3, :3] @ poses_gt[-1][:3, :3].T
    ang = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    assert ang < 1.0, f"final rotation error {ang:.2f} deg"


def test_vo_with_icl_camera_preset():
    """ICL-NUIM preset has negative fy (flipped y axis) — the whole
    pipeline must be sign-safe."""
    from aslam_tpu.config import ICL_NUIM, small_config
    import dataclasses

    cam = dataclasses.replace(ICL_NUIM, width=320, height=240,
                              cx=160.0, cy=120.0, fx=240.0, fy=-240.0)
    cfg = small_config().replace(camera=cam)
    imgs, depths, poses_gt, _ = synthetic.make_sequence(
        n_frames=4, n_points=400, cam=cam, seed=13)
    vo = VisualOdometry(cfg)
    for i in range(4):
        T = vo.process(imgs[i], depths[i], t=i * 0.03)
    assert np.isfinite(T).all()
    for s in vo.stats:
        assert s["n_matches"] > 20, s
