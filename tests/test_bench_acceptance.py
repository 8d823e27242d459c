"""Unit tests for bench.py's final-acceptance rule (no Spark needed).

The r10 round exposed a hole: an entry whose probe-accepted set
shrank to ONE sample was reported from that lone sample even when
five other samples agreed on a much faster time (substring_span_dedup
7.71 s reported vs five samples at 1.3-2.0 s).  `resolve_entry` now
tie-breaks suspect accepted sets toward the modal sample cluster and
flags genuinely ambiguous entries dirty.  These tests pin the rule,
including a replay of the two real r10 phantom regressions.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench import format_bench_line, modal_cluster, resolve_entry  # noqa: E402

# probe baseline/tolerance used by all synthetic rows below: a probe
# value of GOOD is accepted, BAD is rejected
PB = 0.015
TOL = 1.4
GOOD = 0.015
BAD = 0.5


def row(elapsed, ok=True):
    p = GOOD if ok else BAD
    return (elapsed, p, p)


class TestModalCluster:
    def test_single_cluster(self):
        assert modal_cluster([1.0, 1.1, 1.2]) == [1.0, 1.1, 1.2]

    def test_outlier_excluded(self):
        assert modal_cluster([1.0, 1.1, 7.7]) == [1.0, 1.1]

    def test_largest_wins(self):
        assert modal_cluster([1.0, 7.0, 7.1, 7.2]) == [7.0, 7.1, 7.2]

    def test_tie_goes_to_faster(self):
        assert modal_cluster([1.0, 1.1, 7.0, 7.1]) == [1.0, 1.1]

    def test_singleton(self):
        assert modal_cluster([3.0]) == [3.0]


class TestResolveEntry:
    def test_clean_entry_unchanged(self):
        rows = [row(1.0), row(1.1), row(1.2)]
        value, n, status = resolve_entry(rows, PB, TOL)
        assert status == "ok"
        assert n == 3
        assert value == 1.1

    def test_lone_accepted_outlier_loses_to_modal_cluster(self):
        # the r10 hole: one slow probe-accepted sample vs a cluster of
        # fast probe-rejected ones -> the cluster must win
        rows = [row(1.3, ok=False), row(1.9, ok=False), row(2.0, ok=False),
                row(7.7, ok=True), row(1.5, ok=False)]
        value, n, status = resolve_entry(rows, PB, TOL)
        assert status == "modal"
        assert n == 1
        assert value < 2.1

    def test_zero_accepted_with_agreeing_cluster_is_modal(self):
        rows = [row(1.0, ok=False), row(1.1, ok=False), row(9.0, ok=False)]
        value, n, status = resolve_entry(rows, PB, TOL)
        assert status == "modal"
        assert n == 0
        assert value == 1.05

    def test_zero_accepted_no_cluster_is_dirty(self):
        # wild disagreement, nothing accepted: fall back to the
        # all-sample median and SAY so
        rows = [row(1.0, ok=False), row(4.0, ok=False), row(20.0, ok=False)]
        value, n, status = resolve_entry(rows, PB, TOL)
        assert status == "dirty"
        assert value == 4.0

    def test_accepted_median_over_all_median_triggers_tiebreak(self):
        # two accepted samples, both slow; four rejected fast samples
        # agree -> accepted median is >1.5x all-median, modal wins
        rows = [row(1.0, ok=False), row(1.05, ok=False), row(1.1, ok=False),
                row(1.15, ok=False), row(6.0, ok=True), row(6.2, ok=True)]
        value, n, status = resolve_entry(rows, PB, TOL)
        assert status == "modal"
        assert value < 1.2

    def test_single_sample_run_keeps_old_behavior(self):
        # runs=1 debugging mode: one accepted sample is reported as-is
        value, n, status = resolve_entry([row(2.0)], PB, TOL)
        assert status == "ok"
        assert value == 2.0

    def test_invariant_no_silent_value_above_1_5x_all_median(self):
        # sweep a handful of adversarial shapes; any reported value
        # >1.5x the all-sample median must carry the dirty flag
        import statistics

        shapes = [
            [row(1.0), row(10.0), row(10.0, ok=False)],
            [row(0.1, ok=False), row(5.0), row(5.1)],
            [row(1.0, ok=False), row(2.0, ok=False), row(30.0)],
            [row(3.0), row(3.1), row(3.2), row(0.1, ok=False)],
        ]
        for rows in shapes:
            value, _n, status = resolve_entry(rows, PB, TOL)
            med_all = statistics.median([e for e, _a, _b in rows])
            if value > 1.5 * med_all:
                assert status == "dirty", (rows, value, med_all)


class TestR10Replay:
    """Replay the r10 audit trail: the two entries the r10 verdict
    identified as single-accepted-sample artifacts must resolve near
    their sample-cluster consensus (or be flagged).

    The rows are a frozen fixture reconstructed from the r10 verdict's
    audit-trail quotes (the live BENCH_DETAIL.json is overwritten by
    every bench run, so it cannot anchor a regression test):
    substring_span_dedup reported 7.71 s from ONE probe-accepted
    sample while five rejected samples sat at 1.31-2.00 s;
    ldbc_ic1_transitive_name reported 2.28 s from one accepted sample
    while four rejected samples agreed at 0.13-0.15 s.
    """

    # probe values: GOOD passes probe_best * tol, BAD fails it
    R10 = {
        "probe_best_sec": PB,
        "probe_tolerance": TOL,
        "samples": {
            "substring_span_dedup": [
                (1.31, BAD, BAD),
                (1.50, BAD, BAD),
                (1.63, BAD, BAD),
                (1.76, BAD, BAD),
                (2.00, BAD, BAD),
                (7.71, GOOD, GOOD),
            ],
            "ldbc_ic1_transitive_name": [
                (0.13, BAD, BAD),
                (0.13, BAD, BAD),
                (0.14, BAD, BAD),
                (0.15, BAD, BAD),
                (2.28, GOOD, GOOD),
            ],
        },
    }

    def test_substring_span_dedup(self):
        d = self.R10
        rows = d["samples"]["substring_span_dedup"]
        value, _n, status = resolve_entry(
            rows, d["probe_best_sec"], d["probe_tolerance"]
        )
        assert status == "modal" and value < 2.5, (value, status)

    def test_ldbc_ic1(self):
        d = self.R10
        rows = d["samples"]["ldbc_ic1_transitive_name"]
        value, _n, status = resolve_entry(
            rows, d["probe_best_sec"], d["probe_tolerance"]
        )
        assert status == "modal" and value < 0.5, (value, status)


class TestFormatBenchLine:
    """The printed JSON line must keep every query itemized: the r11
    final runs showed a 23-entry `retried` diagnostic pushing the line
    over the 1900-char driver limit and folding 4 query keys into a
    `_fast4` aggregate.  Diagnostics shed first; queries fold last."""

    QUERIES = {f"entry_{i:02d}_some_operator_name": 0.5 + i * 0.1
               for i in range(50)}

    def _parse(self, line):
        import json

        assert len(line) <= 1900, len(line)
        return json.loads(line)

    def test_all_queries_itemized_with_heavy_retried_map(self):
        retried = {k: v + 1.0
                   for k in list(self.QUERIES)[:25]
                   for v in [self.QUERIES[k]]}
        line = format_bench_line(
            53.66, self.QUERIES, retried, [], 0.1, 4.19, 9.9
        )
        d = self._parse(line)
        assert set(d["queries"]) == set(self.QUERIES)
        assert not any(k.startswith("_fast") for k in d["queries"])
        # the shed retried map degrades to its count, not silence
        assert d["retried"] == 25

    def test_small_run_keeps_full_retried_detail(self):
        qs = dict(list(self.QUERIES.items())[:5])
        retried = {next(iter(qs)): 2.0}
        d = self._parse(format_bench_line(3.0, qs, retried, [], 0.1, 1, 1))
        assert isinstance(d["retried"], dict)
        assert set(d["queries"]) == set(qs)

    def test_pathological_width_still_fits_by_folding(self):
        qs = {f"q_{'x' * 60}_{i}": float(i) for i in range(60)}
        d = self._parse(format_bench_line(9.0, qs, {}, [], 0.1, 1, 1))
        assert any(k.startswith("_fast") for k in d["queries"])
        # folded total preserved: sum of survivors + aggregate ~= sum(all)
        assert abs(sum(d["queries"].values()) - sum(qs.values())) < 1.0
