#!/usr/bin/env python3
"""Tests for the check_bench_budget floor-raise guard (stdlib unittest).

Run: python3 tools/test_check_bench_budget.py
"""
import json
import os
import sys
import tempfile
import unittest

sys.path.insert(0, os.path.dirname(__file__))
import check_bench_budget as cbb  # noqa: E402


def write(path, text):
    with open(path, "w") as f:
        f.write(text)
    return path


class RaiseGuardTest(unittest.TestCase):
    def setUp(self):
        self.tmp = tempfile.mkdtemp()
        self.budget = os.path.join(self.tmp, "bench_budget.tsv")
        self._old_budget = cbb.BUDGET
        cbb.BUDGET = self.budget
        write(self.budget, "q_fast\t1.000\nq_slow\t4.000\n")

    def tearDown(self):
        cbb.BUDGET = self._old_budget

    def bench(self, queries):
        line = json.dumps({"metric": "bench", "value": sum(queries.values()),
                           "unit": "sec", "queries": queries,
                           "sf": "/root/testdata/sf0.1"})
        return write(os.path.join(self.tmp, "bench.json"), line + "\n")

    def update(self, queries, reverify_text=None):
        argv = ["prog", self.bench(queries), "--update"]
        if reverify_text is not None:
            argv += ["--reverify",
                     write(os.path.join(self.tmp, "reverify.txt"),
                           reverify_text)]
        return cbb.main(argv)

    def read_budget(self):
        return {n: float(t) for n, t in
                (l.split("\t") for l in open(self.budget))}

    def test_update_refuses_partial_capture_dropping_floors(self):
        # q_slow absent from the capture: its committed floor must not
        # be silently erased
        with self.assertRaises(SystemExit):
            self.update({"q_fast": 1.1})
        self.assertEqual(self.read_budget()["q_slow"], 4.0)

    def test_reverify_flag_without_value_refuses(self):
        argv = ["prog", self.bench({"q_fast": 1.0, "q_slow": 4.0}),
                "--update", "--reverify"]
        with self.assertRaises(SystemExit):
            cbb.main(argv)

    def test_bench_path_named_like_flag_does_not_misparse(self):
        # a capture file literally named '--reverify' must not be taken
        # as the flag itself (flags are searched past the bench path)
        path = self.bench({"q_fast": 1.0, "q_slow": 4.0})
        flagname = os.path.join(self.tmp, "--reverify")
        os.rename(path, flagname)
        rc = cbb.main(["prog", flagname, "--update"])
        self.assertEqual(rc, 0)

    def test_update_within_cap_allowed(self):
        rc = self.update({"q_fast": 1.2, "q_slow": 4.1})
        self.assertEqual(rc, 0)
        self.assertEqual(self.read_budget()["q_fast"], 1.2)

    def test_update_refuses_unjustified_raise(self):
        with self.assertRaises(SystemExit):
            self.update({"q_fast": 2.0, "q_slow": 4.0})
        # budget file untouched on refusal
        self.assertEqual(self.read_budget()["q_fast"], 1.0)

    def test_update_allows_raise_with_reverify_line(self):
        rc = self.update({"q_fast": 2.0, "q_slow": 4.0},
                         reverify_text="# adjudication\n"
                                       "q_fast  1.9  1.0  1.95 / 2.0  "
                                       "plan changed intentionally\n")
        self.assertEqual(rc, 0)
        self.assertEqual(self.read_budget()["q_fast"], 2.0)

    def test_reverify_must_name_the_raised_query(self):
        with self.assertRaises(SystemExit):
            self.update({"q_fast": 2.0, "q_slow": 4.0},
                        reverify_text="q_slow 4.0 4.0 4.0 at floor\n")

    def test_new_query_needs_no_justification(self):
        rc = self.update({"q_fast": 1.0, "q_slow": 4.0, "q_new": 9.9})
        self.assertEqual(rc, 0)
        self.assertEqual(self.read_budget()["q_new"], 9.9)

    def test_lowering_always_allowed(self):
        rc = self.update({"q_fast": 0.1, "q_slow": 0.1})
        self.assertEqual(rc, 0)

    def test_comment_lines_do_not_adjudicate(self):
        with self.assertRaises(SystemExit):
            self.update({"q_fast": 2.0, "q_slow": 4.0},
                        reverify_text="# q_fast mentioned in a comment\n")


class SentinelTest(unittest.TestCase):
    """--sentinel normalizes both gates by the host factor measured off
    a fixed calibration row."""

    def setUp(self):
        self.tmp = tempfile.mkdtemp()
        self.budget = os.path.join(self.tmp, "bench_budget.tsv")
        self._old_budget = cbb.BUDGET
        cbb.BUDGET = self.budget
        write(self.budget, "q_sent\t1.000\nq_x\t2.000\n")

    def tearDown(self):
        cbb.BUDGET = self._old_budget

    def bench(self, queries):
        line = json.dumps({"metric": "bench", "value": sum(queries.values()),
                           "unit": "sec", "queries": queries,
                           "sf": "/root/testdata/sf0.1"})
        return write(os.path.join(self.tmp, "bench.json"), line + "\n")

    def check(self, queries, *extra):
        return cbb.main(["prog", self.bench(queries),
                         "--sentinel", "q_sent", *extra])

    def test_slow_host_band_absorbed(self):
        # whole capture 1.4x slow (q_x at 2.8 > 1.5x floor raw... no:
        # 2.8 < 3.0 raw — use 3.2 > 3.0 raw but 3.2/1.4 = 2.29 < 3.0)
        rc = self.check({"q_sent": 1.4, "q_x": 3.2})
        self.assertEqual(rc, 0)

    def test_raw_mode_still_flags(self):
        rc = cbb.main(["prog", self.bench({"q_sent": 1.4, "q_x": 3.2})])
        self.assertEqual(rc, 1)

    def test_real_regression_not_absorbed(self):
        # host factor 1.4, but q_x regressed 3x: 6.0/1.4 = 4.3 > 3.0
        rc = self.check({"q_sent": 1.4, "q_x": 6.0})
        self.assertEqual(rc, 1)

    def test_fast_host_does_not_tighten(self):
        # host 2x fast; q_x within raw budget must still pass (h
        # clamps at 1, never below)
        rc = self.check({"q_sent": 0.5, "q_x": 2.9})
        self.assertEqual(rc, 0)

    def test_host_factor_capped(self):
        # a 4x sentinel excursion is not a credible host band: h clamps
        # at 2, so a query needing 3x absorption still fails
        rc = self.check({"q_sent": 4.0, "q_x": 8.9})
        self.assertEqual(rc, 1)

    def test_missing_sentinel_refuses(self):
        with self.assertRaises(SystemExit):
            self.check({"q_x": 2.0})

    def test_update_raise_guard_normalized(self):
        # 1.4x host band: q_x at 2.72 raw (> 1.3x floor) but 1.94
        # normalized (< 1.3x floor) — recordable without adjudication
        rc = cbb.main(["prog", self.bench({"q_sent": 1.4, "q_x": 2.72}),
                       "--update", "--sentinel", "q_sent"])
        self.assertEqual(rc, 0)

    def test_update_raise_guard_still_arms_past_band(self):
        with self.assertRaises(SystemExit):
            cbb.main(["prog", self.bench({"q_sent": 1.4, "q_x": 6.0}),
                      "--update", "--sentinel", "q_sent"])

    def test_default_sentinel_name(self):
        # bare --sentinel resolves to the default calibration row
        write(self.budget, "q_topk_orders\t1.000\nq_x\t2.000\n")
        rc = cbb.main(["prog",
                       self.bench({"q_topk_orders": 1.4, "q_x": 3.2}),
                       "--sentinel"])
        self.assertEqual(rc, 0)


if __name__ == "__main__":
    unittest.main()
