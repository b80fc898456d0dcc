"""Unit coverage for bench.py's load-normalization core (round 16):
the instrument the round trend rides on must not regress silently.
Pure math — no Spark session."""

from __future__ import annotations

import pytest

from bench import load_normalize, robust_stat


def test_robust_stat_median_and_best_of():
    assert robust_stat([3.0, 1.0, 2.0]) == 2.0          # median at >=3
    assert robust_stat([5.0, 1.0, 2.0, 4.0, 3.0]) == 3.0
    assert robust_stat([2.0, 1.5]) == 1.5               # best-of at 2
    assert robust_stat([7.0]) == 7.0


def test_relative_norm_rescales_loaded_pass_toward_quietest():
    # pass 0 loaded 2x (cal 0.4 vs idle 0.2): its sample is halved;
    # pass 1 quiet: untouched. Median over corrected samples.
    samples = {"q": [2.0, 1.0, 1.0]}
    passes = {"q": [0, 1, 2]}
    cal = [0.4, 0.4, 0.2, 0.2]  # brackets: p0=0.4, p1=0.2, p2=0.2
    out = load_normalize(samples, passes, cal)
    assert out["q"] == 1.0      # corrected [1.0, 1.0, 1.0] -> 1.0


def test_relative_norm_cannot_correct_uniform_load():
    # loaded THROUGHOUT: min-of-own-run ref equals every bracket, so
    # the relative form returns raw — the r15 failure mode ...
    samples = {"q": [2.0, 2.0, 2.0]}
    passes = {"q": [0, 1, 2]}
    cal = [0.4, 0.4, 0.4, 0.4]
    assert load_normalize(samples, passes, cal)["q"] == 2.0
    # ... which the absolute form corrects against the pinned idle ref
    out = load_normalize(samples, passes, cal, ref=0.2)
    assert out["q"] == 1.0


def test_bracket_takes_min_of_adjacent_samples():
    # a load spike AT a bracket boundary must not penalize the quiet
    # pass next to it: each pass uses min(cal[p], cal[p+1])
    samples = {"q": [1.0]}
    passes = {"q": [0]}
    cal = [0.8, 0.2]            # spike before pass 0, quiet after
    assert load_normalize(samples, passes, cal)["q"] == 1.0


def test_last_pass_bracket_clamps_to_final_sample():
    samples = {"q": [1.0, 1.0]}
    passes = {"q": [0, 1]}
    cal = [0.2, 0.2, 0.4]       # only a trailing sample for pass 1
    out = load_normalize(samples, passes, cal, ref=0.2)
    # pass 1 bracket = min(cal[1], cal[2]) = 0.2 -> untouched
    assert out["q"] == 1.0


def test_absolute_norm_is_window_comparable():
    # two windows of the same true work, one quiet one 1.5x loaded,
    # must normalize to the same absolute total
    quiet = load_normalize({"q": [1.0]}, {"q": [0]}, [0.2, 0.2],
                           ref=0.2)
    loaded = load_normalize({"q": [1.5]}, {"q": [0]}, [0.3, 0.3],
                            ref=0.2)
    assert quiet["q"] == pytest.approx(loaded["q"])