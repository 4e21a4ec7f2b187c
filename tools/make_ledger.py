#!/usr/bin/env python3
"""Rebuild BASELINE_PERQUERY.json from N standalone BENCH_FULL.json runs.

Usage: make_ledger.py [--reset=q1,q2] <bench_full_1.json> [...]

Takes the per-query MEDIAN across the given runs (median of 3 is the
protocol — robust to one contended sample without needing more packs),
writes the ledger consumed by tools/perquery_check.py and graft.Bench's
per-query budget check, and prints a diff summary against the previous
ledger so a regeneration is reviewable: queries added, removed, and
those whose median moved by more than 25% (the box-noise band).

Ledger-bounce guard: a regen can re-center a noisy query's median at
the bottom of its own band (tfidf_topk 0.612→0.432 in one regen), after
which a healthy reading on the other side of the band warns at >1.5x
with no code change. For any query whose historical median exceeds the
fresh one by more than the 25% band, the ledger records a
"budget_base" entry = the historical max; budget consumers
(perquery_check.py, graft.Bench) anchor that query's budget on
max(median, budget_base). When a query's plan DELIBERATELY got faster,
pass --reset=<name,...> so its budget re-bases on the new median and a
regression back to the old cost still warns.

Failed queries (negative seconds in a run) disqualify that run — a
ledger must only ever be cut from green trees.
"""
import json
import re
import statistics
import sys

LEDGER = "BASELINE_PERQUERY.json"


def load(path):
    line = open(path).read().strip().splitlines()[-1]
    rec = json.loads(re.sub(r"^\[info\] ", "", line))
    if rec.get("failed"):
        sys.exit(f"make_ledger: {path} has failed queries {rec['failed']} — "
                 "ledgers are cut from green trees only")
    return rec


def main():
    reset = set()
    paths = []
    for a in sys.argv[1:]:
        if a.startswith("--reset="):
            reset.update(x for x in a.split("=", 1)[1].split(",") if x)
        else:
            paths.append(a)
    runs = [load(p) for p in paths]
    if len(runs) < 2:
        sys.exit("make_ledger: need at least 2 bench runs (protocol: 3)")
    keysets = [set(r["queries"]) for r in runs]
    if any(ks != keysets[0] for ks in keysets):
        sys.exit("make_ledger: runs disagree on the query set — "
                 "all runs must come from the same tree")
    queries = {name: round(statistics.median(
                   abs(r["queries"][name]) for r in runs), 3)
               for name in sorted(keysets[0])}
    totals = sorted(round(r["value"], 1) for r in runs)
    try:
        old_doc = json.load(open(LEDGER))
        old = old_doc["queries"]
        old_base = old_doc.get("budget_base", {})
    except (FileNotFoundError, KeyError):
        old_doc, old, old_base = {}, {}, {}
    added = sorted(set(queries) - set(old))
    removed = sorted(set(old) - set(queries))
    moved = sorted((name, old[name], queries[name])
                   for name in set(queries) & set(old)
                   if old[name] > 0 and
                   not 0.75 <= queries[name] / old[name] <= 1.25
                   and max(queries[name], old[name]) > 0.25)
    # bounce guard: anchor the budget on the historical max median when
    # it exceeds the fresh one by more than the noise band, unless the
    # regen was invoked with --reset=<name> (deliberate plan change).
    # Anchor aging (ADVICE r15): an anchor that survives regen after
    # regen means the query KEEPS reading below its historical max —
    # either a legitimate un-reset speedup (the budget is then anchored
    # on a cost the query will never pay again, and a regression back to
    # it passes silently at 1.5x of the stale max) or genuine band
    # bouncing. Track each anchor's age in regens and flag old (>= 3
    # regens) or far-out (> 2x the fresh median) anchors loudly so the
    # carry is an explicit --reset decision, never a silent perpetual one.
    old_age = old_doc.get("budget_base_age", {})
    budget_base, base_age, stale_anchors = {}, {}, []
    for name, med in queries.items():
        if name in reset:
            continue
        hist = max(old.get(name, 0.0), old_base.get(name, 0.0))
        if hist > med * 1.25 and hist > 0.25:
            budget_base[name] = round(hist, 3)
            base_age[name] = (old_age.get(name, 0) + 1
                              if name in old_base else 1)
            if base_age[name] >= 3 or hist > med * 2:
                stale_anchors.append((name, hist, med, base_age[name]))
    ledger = {
        "note": ("Per-query baseline ledger: median of %d standalone "
                 "full-pack Bench runs at sf0.1 (totals %s). Consumed by "
                 "tools/perquery_check.py (>1.5x + 0.25 s floor) on every "
                 "gates.sh bench reading and by graft.Bench's per-query "
                 "budget warning (max(0.25 s, 1.5x ledger)). Regenerate "
                 "with tools/make_ledger.sh whenever the pack or a plan "
                 "deliberately changes; gates.sh fails if the registered "
                 "query set drifts from this file's key set."
                 % (len(runs), " / ".join(f"{t:.1f}" for t in totals))),
        "queries": queries,
        "budget_base": dict(sorted(budget_base.items())),
        "budget_base_age": dict(sorted(base_age.items())),
        "samples": len(runs),
        "total_median": round(statistics.median(r["value"] for r in runs), 1),
    }
    with open(LEDGER, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"ledger: {len(queries)} queries from {len(runs)} runs, "
          f"total_median {ledger['total_median']} s (totals: "
          + ", ".join(f"{t:.1f}" for t in totals) + ")")
    if added:
        print(f"ledger: +{len(added)} added: {', '.join(added)}")
    if removed:
        print(f"ledger: -{len(removed)} removed: {', '.join(removed)}")
    for name, o, n in moved:
        print(f"ledger: moved {name}: {o:.3f} -> {n:.3f} s ({n / o:.2f}x)")
    if budget_base:
        print(f"ledger: {len(budget_base)} budget_base anchors (historical "
              "max held for budget purposes; --reset=<name> after a "
              "deliberate speedup): "
              + ", ".join(f"{k}={v:.3f}" for k, v in
                          sorted(budget_base.items())))
    for name, hist, med, age in stale_anchors:
        print(f"ledger: STALE ANCHOR {name}: budget_base {hist:.3f} vs "
              f"fresh median {med:.3f} ({hist / med:.2f}x), carried "
              f"{age} regen(s) — decide: --reset={name} if the speedup "
              "was deliberate, else investigate the band")
    if reset - set(queries):
        print("ledger: WARNING --reset names not in this pack: "
              + ", ".join(sorted(reset - set(queries))))
    if not (added or removed or moved):
        print("ledger: no query added/removed/moved beyond the 25% band")


if __name__ == "__main__":
    main()
