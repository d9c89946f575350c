"""The scale-probe fixture synthesis must keep replicas decorrelated —
round 8 found the original rotation-only translate map had TRUE period
26 on letter-only tokens (the fixture vocabulary is pure letters), so
at 100× every replica r was byte-identical to r±26k and the probe
corpus silently became 4-way exact duplicates, inflating every pair
operator's 100× row (dedup_exact_substr_pairs reported 1.07M pairs
where ~28k were real).  These tests pin the affine-map fix so the
property can't regress.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from scale_probe import ALPHA, DIGITS, _replica_map  # noqa: E402


def test_replica_maps_distinct_on_letters_alone_to_130x():
    maps = [_replica_map(r) for r in range(130)]
    # full maps distinct AND the letter halves alone distinct — the
    # latter is the property the fixture's letter-only vocabulary
    # actually exercises
    assert len({m for m in maps}) == 130
    assert len({m[:26] for m in maps}) == 130


def test_replica_maps_are_bijections_with_identity_at_zero():
    for r in range(130):
        m = _replica_map(r)
        assert sorted(m[:26]) == sorted(ALPHA), r
        assert sorted(m[26:]) == sorted(DIGITS), r
    # replica 0 must pass the original data through unchanged (the
    # original fixture stays a subset of every synthetic scale-up)
    assert _replica_map(0) == ALPHA + DIGITS
