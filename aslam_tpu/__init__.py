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

# Persistent XLA compilation cache.  Through the axon TPU relay a single
# compile of the fused per-frame SLAM program costs 55-130 s wall (the
# compile happens server-side, per process); with the cache, every
# process after the first loads the serialized executable in <0.1 s.
# This is what makes fresh-subprocess benching (bench.py) and repeated
# rehearsal runs tractable.  Opt out with ASLAM_NO_COMPILE_CACHE=1;
# override the location with ASLAM_COMPILE_CACHE_DIR.
import os as _os

if (not _os.environ.get("ASLAM_NO_COMPILE_CACHE")
        and not _os.environ.get("JAX_COMPILATION_CACHE_DIR")):
    # JAX_COMPILATION_CACHE_DIR (e.g. the test harness's /tmp cache)
    # takes precedence; this is the engine-level default.
    _cache_dir = _os.environ.get("ASLAM_COMPILE_CACHE_DIR")
    if not _cache_dir:
        # default: sibling of the package for a source checkout; for a
        # site-packages install (parent possibly read-only or shared,
        # advisor r4) fall back to a per-user cache dir
        _repo_dir = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)), _os.pardir)
        if _os.access(_repo_dir, _os.W_OK):
            _cache_dir = _os.path.join(_repo_dir, ".jax_cache")
        else:
            import tempfile as _tempfile

            _cache_dir = _os.path.join(
                _os.environ.get("XDG_CACHE_HOME")
                or _os.path.join(_os.path.expanduser("~"), ".cache"),
                "aslam_tpu", "jax_cache")
            try:
                _os.makedirs(_cache_dir, exist_ok=True)
            except OSError:
                _cache_dir = _os.path.join(
                    _tempfile.gettempdir(), "aslam_tpu_jax_cache")
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

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
