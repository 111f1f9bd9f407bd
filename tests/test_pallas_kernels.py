"""Pallas matcher kernels vs the XLA reference implementation
(interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
from jax import lax

from aslam_tpu.ops import hamming, pallas_kernels


def test_hamming_top2_matches_reference(rng):
    N, M = 200, 320
    a = rng.integers(0, 2**32, (N, 8), dtype=np.uint32)
    b = rng.integers(0, 2**32, (M, 8), dtype=np.uint32)
    va = rng.random(N) > 0.1
    vb = rng.random(M) > 0.1

    d1, i1, d2 = pallas_kernels.hamming_top2(
        jnp.asarray(a), jnp.asarray(va), jnp.asarray(b), jnp.asarray(vb),
        interpret=True,
    )

    ref = hamming.masked_distance_matrix(
        jnp.asarray(a), jnp.asarray(va), jnp.asarray(b), jnp.asarray(vb))
    neg, idx = lax.top_k(-ref, 2)
    rd1, ri1, rd2 = -neg[:, 0], idx[:, 0], -neg[:, 1]

    np.testing.assert_allclose(np.asarray(d1), np.asarray(rd1))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(rd2))
    # indices must agree wherever the row is valid and best is unique
    agree = (np.asarray(i1) == np.asarray(ri1)) | ~va
    # ties can pick different argmins; require distances equal there
    tied = np.asarray(ref)[np.arange(N), np.asarray(i1)] == np.asarray(rd1)
    assert (agree | tied).all()


def test_hamming_top2_all_invalid_targets(rng):
    a = rng.integers(0, 2**32, (64, 8), dtype=np.uint32)
    b = rng.integers(0, 2**32, (32, 8), dtype=np.uint32)
    d1, i1, d2 = pallas_kernels.hamming_top2(
        jnp.asarray(a), jnp.ones(64, bool), jnp.asarray(b),
        jnp.zeros(32, bool), interpret=True,
    )
    assert (np.asarray(d1) >= hamming.INVALID_DIST).all()
