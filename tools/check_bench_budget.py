#!/usr/bin/env python3
"""Per-query bench budget gate.

The aggregate bench bar (total within 2x of the recorded baseline) can
hide per-row drift as the query surface grows; this tool holds every
query to 1.5x its recorded time instead.

Usage:
  # check a bench capture (a file holding the Bench stdout JSON lines):
  python3 tools/check_bench_budget.py /tmp/bench.json
  # re-record the budget after an intentional plan/surface change:
  python3 tools/check_bench_budget.py /tmp/bench.json --update

Exit 1 on any regression (check mode) so it can gate a round script.
The budget lives at src/main/resources/bench_budget.tsv; Bench itself
also reads it and reports "regressions" in its summary line.
"""
import json
import os
import sys

THRESHOLD = 1.5
BUDGET = os.path.join(os.path.dirname(__file__), "..",
                      "src", "main", "resources", "bench_budget.tsv")


def load_queries(path):
    for line in open(path):
        line = line.strip()
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue  # brace-prefixed log noise (stack traces, log4j)
        if "queries" in obj:
            return obj["queries"], obj.get("sf", "")
    raise SystemExit(f"no bench JSON line with 'queries' in {path}")


def main(argv):
    bench, update = argv[1], "--update" in argv[2:]
    queries, sf = load_queries(bench)
    # Bench records -1 for a query whose materialization threw; that is
    # a hard failure in either mode, never a time to compare or record.
    crashed = sorted(n for n, t in queries.items() if t < 0)
    if update:
        if crashed:
            raise SystemExit("refusing to record budgets: failed queries "
                             + ", ".join(crashed))
        if not sf.endswith("sf0.1"):
            raise SystemExit(f"refusing to record budgets from sf={sf!r}: "
                             "budgets are defined at sf0.1")
        with open(BUDGET, "w") as f:
            for name in sorted(queries):
                f.write(f"{name}\t{queries[name]:.3f}\n")
        print(f"recorded {len(queries)} budgets to {BUDGET}")
        return 0
    budget = {}
    for line in open(BUDGET):
        name, t = line.strip().split("\t")
        budget[name] = float(t)
    failures = [f"{n}: FAILED during bench" for n in crashed]
    if sf.endswith("sf0.1"):
        for name in sorted(set(queries) | set(budget)):
            if name in crashed:
                continue
            if name not in budget:
                failures.append(f"{name}: NEW query, no recorded budget")
            elif name not in queries:
                failures.append(f"{name}: in budget but not benched")
            elif queries[name] > THRESHOLD * budget[name]:
                failures.append(f"{name}: {queries[name]:.2f}s > "
                                f"{THRESHOLD}x budget {budget[name]:.2f}s")
    else:
        print(f"sf={sf!r} is not the recorded budget scale (sf0.1); "
              "checking only for failed queries")
    for f in failures:
        print(f"FAIL {f}")
    print(f"{len(queries) - len(failures)}/{len(queries)} queries within "
          f"{THRESHOLD}x budget")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
