"""Unit tests for the upscale generator's per-replica text transform.

No Spark needed: the affine permutation family is pure arithmetic, and
its invariants are what keep synthetic decades honest — replicas must
be pairwise textually unrelated (distinct permutations), statistics-
preserving (bijections on a-z), and backward-compatible (pair (1, r)
is the historical rotation, so regenerated sf1 carries the same rows).
"""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "gen_sf1",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "gen_sf1.py",
    ),
)
_GEN = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_GEN)

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def test_affine_perms_distinct_bijections():
    perms = [_GEN._affine_perm(r) for r in range(312)]
    # pairwise distinct: no two replicas share a text transform
    assert len(set(perms)) == 312
    # each is a bijection on a-z: char statistics shape is preserved
    assert all(sorted(p) == list(_ALPHA) for p in perms)


def test_affine_perm_r_lt_26_is_historical_rotation():
    for r in range(26):
        assert _GEN._affine_perm(r) == _ALPHA[r:] + _ALPHA[:r]


def test_affine_perm_exhausted_raises():
    import pytest

    with pytest.raises(ValueError, match="312"):
        _GEN._affine_perm(312)
