"""aslam_tpu — TPU-native RGB-D SLAM engine (JAX/XLA/Pallas/pjit).

A from-scratch, TPU-first re-design of the adaptive RGB-D localization &
mapping reference system (ORB-SLAM2-derived C++ pipeline, see /root/reference
and SURVEY.md).  Instead of a pointer graph of mutex-guarded objects, the
world state is a pytree of fixed-capacity arrays; instead of sequential
per-keypoint loops, every hot op is a batched XLA/Pallas computation; instead
of pthreads, pipeline concurrency is asynchronous device dispatch; instead of
OpenMP, parallelism is vmap/grid; multi-chip scaling is `jax.sharding.Mesh` +
`shard_map` with psum/all_gather collectives.

Layer map (mirrors SURVEY.md §1, re-architected):

    models/   pipeline state machines: Frame, MapState, Tracking, LocalMapping,
              LoopClosing, System        (replaces System/ Core/ LoopClosing/)
    ops/      batched compute kernels: pyramid, FAST, ORB, Hamming matching,
              RANSAC, ICP/GICP, bundle adjustment, BoW, pose graph
              (replaces Features/ Odometry/ + OpenCV/PCL/g2o/DBoW3)
    parallel/ mesh construction + sharded BA (new capability; reference is
              single-process)
    utils/    SE(3), camera models, datasets, trajectory IO, evaluation
              (replaces Utils/)
    native/   C++ runtime components (dataset prefetch/decode) with ctypes
              bindings (replaces the C++ driver-side IO)
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry code multiplies pose matrices with world coordinates that can
# reach hundreds of meters; TPU's default matmul precision computes f32
# matmuls through bf16 passes (~2^-8 relative), which injects meter-scale
# pose error at map scale (observed: global BA divergence on a 500 m
# corridor).  Force full f32 for f32 matmuls engine-wide; performance-
# critical low-precision paths (MXU Hamming matching) feed explicit bf16
# inputs and are unaffected.
_jax.config.update("jax_default_matmul_precision", "float32")

from aslam_tpu.config import (  # noqa: F401
    CameraModel,
    ExtractorConfig,
    MatcherConfig,
    RansacConfig,
    BAConfig,
    TrackingConfig,
    MapConfig,
    SystemConfig,
    TUM_FR1,
    TUM_FR2,
    TUM_FR3,
    ICL_NUIM,
)
