"""The bench noise-defence sampling policy (VERDICT r4 item 1), pinned
without Spark: a co-tenant spike must not own the official median, a
genuinely slow query must not waste retries, and the retry budget must
bound worst-case sample count."""

from __future__ import annotations

import statistics

from bench import sample_with_retry, warm_until_stable


def _scripted(seq):
    it = iter(seq)
    return lambda: next(it)


def test_tight_samples_never_retry():
    runs, extra = sample_with_retry(_scripted([4.2, 4.4, 4.3]), 3, 4)
    assert runs == [4.2, 4.4, 4.3] and extra == 0


def test_single_spike_is_pushed_out_of_the_median():
    """The r4 failure mode verbatim: samples 4.76/25.01/11.57 put 11.57 in
    the official record while the quiet box measured 4.2 s. Two clean
    retries must restore a capacity-consistent median."""
    runs, extra = sample_with_retry(
        _scripted([4.76, 25.01, 11.57, 4.8, 4.8]), 3, 4
    )
    assert extra == 2
    med = statistics.median(runs)
    assert med == 4.8  # no longer contradicts min=4.76 by >1.5×
    assert med <= 1.5 * min(runs)


def test_slow_but_consistent_query_keeps_its_median():
    """Slowness alone is not noise: 3 consistent 30 s samples retry
    nothing and record 30 s."""
    runs, extra = sample_with_retry(_scripted([30.0, 31.0, 30.5]), 3, 4)
    assert extra == 0 and statistics.median(runs) == 30.5


def test_retry_budget_bounds_worst_case():
    """A box that stays loaded exhausts max_extra and stops — the artifact
    then shows median > 1.5×min WITH all samples, which is exactly the
    honest record (noise visible, not hidden)."""
    runs, extra = sample_with_retry(
        _scripted([4.0, 20.0, 20.0] + [20.0] * 4), 3, 4
    )
    assert extra == 4 and len(runs) == 7
    assert statistics.median(runs) > 1.5 * min(runs)  # honestly still noisy


def test_warmup_deepens_while_jit_still_improving():
    """The measured bloom_seen_path cold sequence: each pass improves >20%
    on the previous, so warming continues to the cap and the samples that
    follow start at steady state."""
    seq = [8.92, 5.52, 2.89, 2.39, 2.0]
    it = iter(seq)
    warms = warm_until_stable(lambda: next(it), max_warm=4)
    assert warms == [8.92, 5.52, 2.89, 2.39]  # capped at 4
    assert next(it) == 2.0  # first real sample is the warm one


def test_stable_query_stops_after_two_warmups():
    it = iter([4.2, 4.1, 4.0, 4.0])
    warms = warm_until_stable(lambda: next(it), max_warm=4)
    assert warms == [4.2, 4.1]  # 4.1 > 0.8*4.2 -> already stable


def test_warmup_stops_when_improvement_plateaus():
    it = iter([10.0, 6.0, 5.5, 5.4])
    warms = warm_until_stable(lambda: next(it), max_warm=6)
    assert warms == [10.0, 6.0, 5.5]  # 5.5 > 0.8*6.0 -> stop
