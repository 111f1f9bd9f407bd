"""Device-mesh construction for distributed BA.

Axes:
  'dp' — data parallelism over BA edges (residual blocks): each device
         accumulates normal-equation contributions for its edge shard,
         reduced with psum.  This replaces the reference's OpenMP loops
         over residuals (SURVEY.md §2.3 item 2) at chip scale.
  'lm' — model parallelism over landmarks: the block-diagonal landmark
         system and the Schur cross terms are reduce-scattered so each
         device eliminates its own landmark shard.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def factor_devices(n: int) -> tuple[int, int]:
    """Split n devices into (dp, lm) as close to square as possible."""
    best = (n, 1)
    for dp in range(1, n + 1):
        if n % dp == 0:
            lm = n // dp
            if abs(dp - lm) <= abs(best[0] - best[1]):
                best = (dp, lm)
    return best


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              lm: int | None = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if dp is None or lm is None:
        dp, lm = factor_devices(n)
    assert dp * lm == n, f"mesh {dp}x{lm} != {n} devices"
    arr = np.asarray(devices[:n]).reshape(dp, lm)
    return Mesh(arr, axis_names=("dp", "lm"))
