"""The headline bench's device-stall / cached-timing guard (VERDICT r4
next-round #7): ``bench.classify_walls`` must flag synthetic stalls and
near-zero cached walls, and must never flag ordinary jitter."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from bench import classify_walls


def test_flags_isolated_stall():
    """A 180 s wall against a ~1 s norm is the observed pathology."""
    stalled, cached = classify_walls([1.05, 1.10, 180.0])
    assert stalled == [2]
    assert cached == []


def test_flags_cached_zero_wall():
    """~0 walls mean the tunnel served host-side cached results — they
    must be flagged so they can never become the headline min."""
    stalled, cached = classify_walls([2e-5, 1.05, 1.10])
    assert cached == [0]
    assert 0 not in stalled


def test_clean_walls_not_flagged():
    stalled, cached = classify_walls([1.02, 1.10, 0.97])
    assert stalled == []
    assert cached == []


def test_subsecond_jitter_not_flagged():
    """5x relative spread below the absolute margin is jitter, not a
    stall (chunk walls of tiny configs can legitimately vary this much)."""
    stalled, cached = classify_walls([0.01, 0.012, 0.05])
    assert stalled == []


def test_multi_second_stall_flagged():
    stalled, cached = classify_walls([2.0, 2.2, 60.0, 2.1])
    assert stalled == [2]


def test_empty():
    assert classify_walls([]) == ([], [])
