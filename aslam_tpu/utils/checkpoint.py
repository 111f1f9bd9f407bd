"""Map checkpoint / resume.

The reference has **no** persistence at all (SURVEY.md §5: map not
serializable, only end-of-run trajectory exports).  Long multi-sequence
runs (BASELINE config 5) need resume, so MapState — being a flat pytree of
arrays — serializes losslessly to one compressed npz plus a small JSON
sidecar of host counters.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from aslam_tpu.models.mapstate import MapState

_META_SUFFIX = ".meta.json"


def save_map(path: str, m: MapState, counters: dict | None = None) -> None:
    arrays = {f: np.asarray(getattr(m, f)) for f in m._fields}
    np.savez_compressed(path, **arrays)
    with open(path + _META_SUFFIX, "w") as f:
        json.dump(counters or {}, f)


def load_map(path: str) -> tuple[MapState, dict]:
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    m = MapState(**{f: jnp.asarray(data[f]) for f in MapState._fields})
    meta_path = path.removesuffix(".npz") + ".npz" + _META_SUFFIX
    counters = {}
    for candidate in (path + _META_SUFFIX, meta_path,
                      path.removesuffix(".npz") + _META_SUFFIX):
        if os.path.exists(candidate):
            with open(candidate) as f:
                counters = json.load(f)
            break
    return m, counters


def save_system(path_prefix: str, slam) -> None:
    """Persist a SlamSystem's map + tracking counters."""
    t = slam.tracking
    save_map(path_prefix, t.map, {
        "n_kfs": t.n_kfs,
        "next_lm": t.next_lm,
        "kf_counter": t.kf_counter,
        "state": t.state,
    })


def load_system(path_prefix: str, slam) -> None:
    m, counters = load_map(path_prefix)
    t = slam.tracking
    t.map = m
    t.n_kfs = counters.get("n_kfs", 0)
    t.next_lm = counters.get("next_lm", 0)
    t.kf_counter = counters.get("kf_counter", 0)
    state = counters.get("state", "NO_IMAGES")
    if state == "OK":
        # per-frame state (last frame/associations) is not persisted; the
        # next frame re-anchors against the restored map exactly like a
        # new sequence (relocalization + bootstrap_track)
        state = "NEW_SEQUENCE"
        if t.last_kf_T is None:
            import numpy as _np

            kf_valid = _np.asarray(m.kf_valid)
            if kf_valid.any():
                ids = _np.asarray(m.kf_id)
                last = _np.nonzero(kf_valid)[0][
                    _np.argmax(ids[kf_valid])
                ]
                t.last_kf_T = _np.asarray(m.kf_T_cw)[last]
    t.state = state
