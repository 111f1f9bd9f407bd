"""Train the shipped BoW vocabulary artifact on a DIVERSE synthetic corpus.

The reference loads a pretrained ~100 MB DBoW3 vocabulary trained offline
on generic imagery (main.cpp:67 — the artifact is absent from its repo).
Our equivalent: hierarchical binary k-medians over ORB descriptors from
many DIFFERENT hard-synthetic scenes (distinct texture/poster/panel seeds,
loop + sweep trajectories), so the tree learns the descriptor distribution
of the front-end rather than one room's appearance.  Training seeds are
disjoint from the evaluation seeds used by vocab_study/accuracy_compare
(0..9) to keep the recall numbers honest generalization measurements.

Usage:
  JAX_PLATFORMS=cpu python scripts/train_vocab.py \
      [--branching 10 --depth 4 --scenes 6 --frames 30 --cap 200000]

Writes aslam_tpu/assets/vocab_{B}_{D}.npz (a few hundred KB at 10^4 words)
— loaded by default by LoopClosing (config.loop.use_pretrained_vocab).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from aslam_tpu.config import TUM_FR1, SystemConfig  # noqa: E402
from aslam_tpu.models import frame as frame_mod  # noqa: E402
from aslam_tpu.models.extractor import init_adaptive_state  # noqa: E402
from aslam_tpu.ops import bow  # noqa: E402
from aslam_tpu.utils import synthetic_hard as sh  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--branching", type=int, default=10)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--scenes", type=int, default=6)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--cap", type=int, default=200_000)
    ap.add_argument("--seed0", type=int, default=100,
                    help="first scene seed (eval seeds 0..9 stay disjoint)")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    cfg = SystemConfig(camera=TUM_FR1)
    pool = []
    t0 = time.time()
    for s in range(args.scenes):
        kind = "loop" if s % 2 == 0 else "sweep"
        seed = args.seed0 + s
        imgs, depths, _ = sh.make_hard_sequence(
            cfg.camera, kind=kind, n_frames=args.frames, seed=seed)
        st = init_adaptive_state(cfg.extractor)
        for i in range(args.frames):
            f, st = frame_mod.make_frame(
                jnp.asarray(imgs[i]), jnp.asarray(depths[i]), cfg, st)
            pool.append(np.asarray(f.feat.desc)[np.asarray(f.feat.valid)])
        print(f"scene {s} ({kind}, seed {seed}): "
              f"{sum(len(p) for p in pool)} descriptors so far "
              f"[{time.time() - t0:.0f}s]", flush=True)

    descs = np.concatenate(pool)
    rng = np.random.default_rng(0)
    if len(descs) > args.cap:
        descs = descs[rng.choice(len(descs), args.cap, replace=False)]
    print(f"training {args.branching}^{args.depth} vocabulary on "
          f"{len(descs)} descriptors...", flush=True)
    t0 = time.time()
    vocab = bow.train_vocabulary(
        descs, branching=args.branching, depth=args.depth)
    print(f"trained in {time.time() - t0:.0f}s", flush=True)

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "aslam_tpu", "assets",
        f"vocab_{args.branching}_{args.depth}.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    bow.save_vocabulary(out, vocab)
    print(f"wrote {out} ({os.path.getsize(out) / 1024:.0f} KB)")


if __name__ == "__main__":
    main()
