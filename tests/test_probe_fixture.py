"""The 128x probe fixture's distinctness transforms (scripts/
scaling128_probe.py) rest on two mathematical claims — pinned here
without a Spark session:

- the per-copy signed permutation is an EXACT orthogonal map (so
  within-copy cosines are preserved to the ulp), and
- distinct copies decorrelate (cross-copy cosine of the same vector
  stays far below the near-dup threshold), including for all-positive
  vectors, the case a bare permutation would fail.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from scaling128_probe import _signed_perm  # noqa: E402


def _as_matrix(dim, copy):
    perm, signs = _signed_perm(dim, copy)
    m = np.zeros((dim, dim))
    for j in range(dim):
        m[j, perm[j]] = signs[j]
    return m


def test_signed_perm_is_orthogonal():
    for dim in (64, 60, 17):
        for copy in (1, 2, 3):
            perm, signs = _signed_perm(dim, copy)
            assert sorted(perm) == list(range(dim)), (dim, copy)
            assert set(signs) <= {1, -1}
            m = _as_matrix(dim, copy)
            assert np.allclose(m @ m.T, np.eye(dim))


def test_rotation_preserves_within_copy_cosine_exactly():
    rng = np.random.default_rng(3)
    a, b = rng.standard_normal(64), rng.standard_normal(64)
    m = _as_matrix(64, 2)
    # signed permutation just reorders/negates terms of the dot product
    # — float-exact, not merely approximate
    assert (m @ a) @ (m @ b) == sum(
        np.sort((a * b))
    ) or np.isclose((m @ a) @ (m @ b), a @ b, rtol=0, atol=1e-12)
    assert np.isclose(np.linalg.norm(m @ a), np.linalg.norm(a))


def test_copies_decorrelate_even_for_positive_vectors():
    rng = np.random.default_rng(5)
    # all-positive vectors: the adversarial case — a bare permutation
    # keeps cos(v, P v) ≈ 1 for near-uniform positive v
    v = np.abs(rng.standard_normal((50, 64))) + 0.1
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    mats = {i: _as_matrix(64, i) for i in (1, 2, 3)}
    for i, mi in mats.items():
        cos_self = np.einsum("ij,ij->i", v, v @ mi.T)
        assert np.abs(cos_self).max() < 0.4, (i, cos_self.max())
        for j, mj in mats.items():
            if j <= i:
                continue
            cos_cross = np.einsum("ij,ij->i", v @ mi.T, v @ mj.T)
            assert np.abs(cos_cross).max() < 0.4, (i, j)
