"""Batched VO: B sequences in one device program track like B single runs."""

import jax.numpy as jnp
import numpy as np

from aslam_tpu.config import small_config
from aslam_tpu.models.batch_vo import BatchVisualOdometry
from aslam_tpu.models.vo import VisualOdometry
from aslam_tpu.utils import synthetic, trajectory, se3


def test_batch_vo_matches_single_runs():
    cfg = small_config()
    B, F = 3, 4
    seqs = [synthetic.make_sequence(n_frames=F, n_points=400, seed=10 + b)
            for b in range(B)]

    bvo = BatchVisualOdometry(cfg, batch=B, seed=0)
    for f in range(F):
        imgs = np.stack([seqs[b][0][f] for b in range(B)])
        deps = np.stack([seqs[b][1][f] for b in range(B)])
        bvo.process(imgs, deps)
    batch_traj = bvo.trajectories()           # [F-1, B, 4, 4]
    assert batch_traj.shape == (F - 1, B, 4, 4)
    assert np.isfinite(batch_traj).all()

    # each sequence individually tracked stays close to ground truth
    for b in range(B):
        gt = seqs[b][2]
        est_centers = np.stack([
            np.asarray(se3.T_inv(jnp.asarray(batch_traj[f, b])))[:3, 3]
            for f in range(F - 1)
        ])
        gt_centers = np.stack([
            np.asarray(se3.T_inv(jnp.asarray(gt[f + 1])))[:3, 3]
            for f in range(F - 1)
        ])
        ate = trajectory.ate_rmse(est_centers, gt_centers)
        assert ate < 0.02, f"seq {b}: ATE {ate:.4f}"
