#!/usr/bin/env python3
"""Per-query bench budget gate.

The aggregate bench bar (total within 2x of the recorded baseline) can
hide per-row drift as the query surface grows; this tool holds every
query to 1.5x its recorded time instead.

Usage:
  # check a bench capture (a file holding the Bench stdout JSON lines):
  python3 tools/check_bench_budget.py /tmp/bench.json
  # re-record the budget after an intentional plan/surface change:
  python3 tools/check_bench_budget.py /tmp/bench.json --update \
      [--reverify reports/bench_reverify_rN.txt]

Exit 1 on any regression (check mode) so it can gate a round script.
The budget lives at src/main/resources/bench_budget.tsv; Bench itself
also reads it and reports "regressions" in its summary line.

Floor-raise guard (round-12 verdict item): --update REFUSES to raise
any query's floor more than RAISE_CAP (1.3x) over its committed
predecessor unless an isolated-reverify line for that query exists in
the report passed via --reverify. A wholesale "refresh the floors"
move can otherwise absorb a real regression — the guard forces every
big raise to carry its own fresh-JVM adjudication evidence. New
queries (no predecessor) are exempt; lowering a floor always allowed.

Sentinel normalization (round-14 verdict item): the floors are wall
times from the host/day they were recorded, and the gate was chronically
fighting 1.3-1.4x host bands — each appeasing floor raise permanently
loosened it. `--sentinel [name]` (default q_topk_orders, a fixed
plan-stable row) measures the HOST, not the code: the capture's
sentinel time over its committed floor gives the host factor h,
clamped to [1, 2] (a fast host must not tighten the gate; a >2x
sentinel excursion is itself suspicious and is NOT absorbed). Every
per-query comparison — the 1.5x check and the 1.3x raise-guard — then
works on capture/h. Policy: with the flag on, a raw-floor raise should
be rare — justified only when a query's NORMALIZED time still exceeds
the cap with fresh isolated evidence, not because the host had a bad
evening.
"""
import json
import os
import sys

THRESHOLD = 1.5
RAISE_CAP = 1.3
DEFAULT_SENTINEL = "q_topk_orders"
HOST_FACTOR_CAP = 2.0
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


def load_budget(path):
    budget = {}
    if os.path.exists(path):
        for line in open(path):
            name, t = line.strip().split("\t")
            budget[name] = float(t)
    return budget


def reverified_queries(path):
    """Query names adjudicated in a bench_reverify report: non-comment
    lines lead with the query name (see reports/bench_reverify_r12.txt).
    """
    names = set()
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        names.add(line.split()[0])
    return names


def host_factor(queries, budget, sentinel):
    """Capture-time / committed-floor ratio of the sentinel row,
    clamped to [1, HOST_FACTOR_CAP]."""
    if sentinel not in queries:
        raise SystemExit(f"sentinel {sentinel!r} not in the capture")
    if sentinel not in budget:
        raise SystemExit(f"sentinel {sentinel!r} has no committed floor")
    if queries[sentinel] < 0:
        raise SystemExit(f"sentinel {sentinel!r} FAILED in the capture")
    h = queries[sentinel] / budget[sentinel]
    return max(1.0, min(h, HOST_FACTOR_CAP))


def main(argv):
    bench, update = argv[1], "--update" in argv[2:]
    reverify = None
    if "--reverify" in argv[2:]:
        # search flags only past the bench path (a capture literally
        # named '--reverify' must not misparse), and require a value
        i = argv.index("--reverify", 2)
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            raise SystemExit("--reverify requires a report path argument")
        reverify = argv[i + 1]
    sentinel = None
    if "--sentinel" in argv[2:]:
        i = argv.index("--sentinel", 2)
        sentinel = (argv[i + 1]
                    if i + 1 < len(argv) and not argv[i + 1].startswith("--")
                    else DEFAULT_SENTINEL)
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
        old = load_budget(BUDGET)
        adjudicated = reverified_queries(reverify) if reverify else set()
        h = host_factor(queries, old, sentinel) if sentinel else 1.0
        if sentinel:
            print(f"sentinel {sentinel}: host factor {h:.3f}")
        unjustified = []
        for name in sorted(queries):
            if name in old and queries[name] / h > RAISE_CAP * old[name] \
                    and name not in adjudicated:
                unjustified.append(
                    f"{name}: {queries[name]:.2f}s"
                    + (f" (/{h:.2f} host = {queries[name] / h:.2f}s)"
                       if sentinel else "")
                    + f" > {RAISE_CAP}x committed "
                    f"floor {old[name]:.2f}s with no isolated-reverify line"
                    + (f" in {reverify}" if reverify else
                       " (--reverify not given)"))
        if unjustified:
            for u in unjustified:
                print(f"REFUSED {u}")
            raise SystemExit(
                f"refusing to raise {len(unjustified)} floor(s) past "
                f"{RAISE_CAP}x without adjudication evidence — re-time each "
                "isolated (fresh JVM) into the round's bench_reverify "
                "report and pass it via --reverify")
        # a partial capture must not silently ERASE committed floors
        # (check mode flags 'in budget but not benched'; update mode
        # must refuse the same hole, or the raise guard loses its
        # committed predecessor next round)
        dropped = sorted(set(old) - set(queries))
        if dropped:
            for name in dropped:
                print(f"REFUSED {name}: committed floor {old[name]:.2f}s "
                      "absent from the capture — partial captures cannot "
                      "erase floors")
            raise SystemExit(
                f"refusing to drop {len(dropped)} committed floor(s) not "
                "present in the capture; bench the full surface (or remove "
                "the retired query from the budget by hand, stating why)")
        with open(BUDGET, "w") as f:
            for name in sorted(queries):
                f.write(f"{name}\t{queries[name]:.3f}\n")
        print(f"recorded {len(queries)} budgets to {BUDGET}")
        return 0
    budget = load_budget(BUDGET)
    failures = [f"{n}: FAILED during bench" for n in crashed]
    if sf.endswith("sf0.1"):
        h = host_factor(queries, budget, sentinel) if sentinel else 1.0
        if sentinel:
            print(f"sentinel {sentinel}: host factor {h:.3f}")
        for name in sorted(set(queries) | set(budget)):
            if name in crashed:
                continue
            if name not in budget:
                failures.append(f"{name}: NEW query, no recorded budget")
            elif name not in queries:
                failures.append(f"{name}: in budget but not benched")
            elif queries[name] / h > THRESHOLD * budget[name]:
                failures.append(
                    f"{name}: {queries[name]:.2f}s"
                    + (f" (/{h:.2f} host = {queries[name] / h:.2f}s)"
                       if sentinel else "")
                    + f" > {THRESHOLD}x budget {budget[name]:.2f}s")
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
