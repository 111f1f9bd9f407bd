"""Batched visual odometry: B independent sequences per device program.

The sequence axis is the SLAM analog of batch data parallelism
(SURVEY.md §2.3: "sequence shards for multi-sequence maps").  For offline
processing — map building from recording fleets, dataset sweeps,
evaluation farms — a single chip tracks B sequences simultaneously by
vmapping the frame pipeline: one extraction + matching + RANSAC + BA
program over [B, H, W] image stacks, multiplying per-chip throughput
without touching the latency path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aslam_tpu.config import SystemConfig
from aslam_tpu.models import frame as frame_mod
from aslam_tpu.models.extractor import init_adaptive_state
from aslam_tpu.models.odometry import rba_step


@functools.partial(jax.jit, static_argnames=("cfg", "height", "width"))
def batch_frame(imgs, depths, grids, cfg: SystemConfig, height, width):
    """[B,H,W] x2 -> batched FrameData (vmapped extraction)."""
    return jax.vmap(
        lambda i, d, g: frame_mod._make_frame_impl(i, d, g, cfg, height, width)
    )(imgs, depths, grids)


@functools.partial(jax.jit, static_argnames=("cfg",))
def batch_rba(frames_prev, frames_cur, keys, cfg: SystemConfig):
    """Vmapped frame-to-frame odometry over the sequence batch."""
    return jax.vmap(lambda a, b, k: rba_step(a, b, k, cfg))(
        frames_prev, frames_cur, keys
    )


class BatchVisualOdometry:
    """Track B sequences in lockstep; poses accumulate on device."""

    def __init__(self, cfg: SystemConfig, batch: int, seed: int = 0):
        self.cfg = cfg
        self.batch = batch
        g = init_adaptive_state(cfg.extractor).grid_thresholds
        self.grids = jnp.tile(g[None], (batch, 1, 1))
        self.key = jax.random.PRNGKey(seed)
        self.prev = None
        self.pose_buf: list = []

    def process(self, imgs: np.ndarray, depths: np.ndarray):
        """imgs/depths: [B,H,W] (uint8/uint16/float ok)."""
        h, w = imgs.shape[1:]
        frames, self.grids = batch_frame(
            jnp.asarray(imgs), jnp.asarray(depths), self.grids,
            self.cfg, h, w)
        if self.prev is None:
            eye = jnp.tile(jnp.eye(4)[None], (self.batch, 1, 1))
            frames = frames._replace(T_cw=eye)
        else:
            self.key, sub = jax.random.split(self.key)
            keys = jax.random.split(sub, self.batch)
            res = batch_rba(self.prev, frames, keys, self.cfg)
            frames = frames._replace(T_cw=res.T_cw2)
            self.pose_buf.append(res.T_cw2)
        self.prev = frames
        return frames.T_cw

    def trajectories(self) -> np.ndarray:
        """[F-1, B, 4, 4] pose chain (one batched readback)."""
        return np.stack(jax.device_get(self.pose_buf))
