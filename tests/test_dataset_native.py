"""Dataset loading: TUM association parsing, native PNG decode, prefetch."""

import os

import numpy as np
import pytest

from aslam_tpu.utils import dataset


def _have_pil():
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.fixture
def tum_dir(tmp_path, rng):
    """Synthesize a mini TUM sequence directory."""
    if not _have_pil():
        pytest.skip("PIL needed to write test PNGs")
    from PIL import Image

    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    lines = []
    for i in range(4):
        t = 1305031102.0 + 0.033 * i
        rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        depth = rng.integers(0, 20000, (48, 64), dtype=np.uint16)
        Image.fromarray(rgb).save(tmp_path / "rgb" / f"{t:.6f}.png")
        Image.fromarray(depth).save(tmp_path / "depth" / f"{t:.6f}.png")
        lines.append(f"{t:.6f} rgb/{t:.6f}.png {t:.6f} depth/{t:.6f}.png")
    (tmp_path / "associations.txt").write_text(
        "# comment line\n" + "\n".join(lines) + "\n"
    )
    return str(tmp_path)


def test_associations_parse(tum_dir):
    a = dataset.load_associations(tum_dir)
    assert len(a.rgb_paths) == 4
    assert a.timestamps[1] > a.timestamps[0]
    assert os.path.exists(a.rgb_paths[0])


def test_sequence_loads_frames(tum_dir):
    seq = dataset.TumSequence(tum_dir)
    assert len(seq) == 4
    t, img, depth = seq[0]
    assert img.shape == (48, 64) and img.dtype == np.float32
    assert 0 <= img.min() and img.max() <= 255
    assert depth.shape == (48, 64) and depth.dtype == np.float32
    assert depth.max() <= 20000 / 5000.0 + 1e-6
    seq.close()


def test_sequence_prefetch_matches_sync(tum_dir):
    seq_sync = dataset.TumSequence(tum_dir, lookahead=0)
    seq_pre = dataset.TumSequence(tum_dir, lookahead=3)
    for i in range(4):
        t1, i1, d1 = seq_sync[i]
        t2, i2, d2 = seq_pre[i]
        assert t1 == t2
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(d1, d2)
    seq_pre.close()


def test_native_loader_used_when_built(tum_dir):
    from aslam_tpu.native import loader

    if not loader.available():
        pytest.skip("native library not built")
    a = dataset.load_associations(tum_dir)
    out = loader.decode_png(a.depth_paths[0])
    assert out is not None and out.dtype == np.uint16


def test_associate_nearest():
    rgb = [(0.00, "r0"), (0.03, "r1"), (0.06, "r2")]
    depth = [(0.001, "d0"), (0.032, "d1"), (0.20, "d2")]
    out = dataset.associate(rgb, depth, max_dt=0.02)
    assert [(r, d) for _, r, d in out] == [("r0", "d0"), ("r1", "d1")]
