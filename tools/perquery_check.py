#!/usr/bin/env python3
"""Per-query regression report against the committed baseline ledger.

Usage: perquery_check.py [--strict-keys] <BENCH_FULL.json> [BASELINE_PERQUERY.json]

Compares a bench run's per-query seconds against the ledger (median of 3
standalone full-pack runs on a known-green tree) and names every query
above THRESH x its ledger entry — so a real per-query regression is
named by the gate instead of excavated from a +N s total by hand.
Box-noise discipline: only queries above an absolute floor are flagged
(a 0.05->0.12 s swing is scheduler noise, not a plan change), and the
exit code is 0 — the TOTAL ceiling in gates.sh stays the gate; this
report exists to attribute a breach, not to add a second one.

The ONE exception is --strict-keys (gates.sh passes it): when the bench
run's query set differs from the ledger's key set, exit 4. A pack
change with a forgotten ledger regen would otherwise silently un-guard
the new queries — the PLANS.md-staleness treatment, applied to the
ledger. Fix by running tools/make_ledger.sh and committing the result.
Without --strict-keys, new queries are listed informationally.

--fail-on-flags (round 18, ADVICE r17): exit 5 when any query exceeds
its inflation-scaled budget. gates.sh passes it on the RETRY reading
only — the retry ceiling carries a documented 1.1x hot-box allowance,
and without this check a genuine ~10% single-query regression could
ride that allowance. Because budgets are scaled by the run's own
uniform inflation, a pure external burst still passes (zero flags)
while a real per-query regression fails mechanically.
"""
import json
import re
import sys

THRESH = 1.5       # x ledger median
ABS_FLOOR = 0.25   # seconds — below this, ratios are noise


def load(path):
    line = open(path).read().strip().splitlines()[-1]
    return json.loads(re.sub(r"^\[info\] ", "", line))


def main():
    args = [a for a in sys.argv[1:]
            if a not in ("--strict-keys", "--fail-on-flags")]
    strict = "--strict-keys" in sys.argv[1:]
    fail_on_flags = "--fail-on-flags" in sys.argv[1:]
    if not args:
        sys.exit("usage: perquery_check.py [--strict-keys] <BENCH_FULL.json>"
                 " [BASELINE_PERQUERY.json]")
    bench = load(args[0])
    ledger_path = args[1] if len(args) > 1 else "BASELINE_PERQUERY.json"
    try:
        doc = json.loads(open(ledger_path).read())
    except FileNotFoundError:
        if strict:
            # a missing ledger is the most extreme form of the drift
            # --strict-keys exists to catch: every query un-guarded
            print(f"perquery: STALE LEDGER — no ledger at {ledger_path}; "
                  "run tools/make_ledger.sh and commit the result")
            sys.exit(4)
        print(f"perquery: no ledger at {ledger_path} — skipping")
        return
    ledger = doc["queries"]
    # budget_base: for entries whose regen moved with no deliberate plan
    # change (make_ledger.py's bounce guard), the budget anchors on the
    # historical max median instead of a bottom-of-band regen sample —
    # otherwise a healthy reading on the other side of the noise band
    # warns with no code change (the tfidf_topk 0.432→0.839 false alarm).
    bbase = doc.get("budget_base", {})
    qs = {k: abs(v) for k, v in bench["queries"].items()}
    # ledger_ratio scaling (round 16): official/in-gate runs land
    # 1.05-1.25x over the quiet standalone ledger, and THRESH is
    # calibrated standalone — so scale each budget by this run's own
    # measured inflation (run total over ledger total_median, floored
    # at 1 so a cold run never shrinks budgets). A flag then means
    # "above budget after accounting for this run's inflation", not
    # "the box was hot". Only meaningful when the run covers the full
    # pack; a subset run's total is not a ratio of anything, so it
    # keeps inflation = 1.
    total_median = doc.get("total_median")
    inflation = 1.0
    if total_median and set(ledger) <= set(qs):
        inflation = max(1.0, sum(qs.values()) / float(total_median))
    flagged, new = [], []
    for name, sec in sorted(qs.items(), key=lambda kv: -kv[1]):
        base = ledger.get(name)
        if base is None:
            new.append(name)
        elif (sec > ABS_FLOOR and
              sec > inflation * THRESH * max(base, bbase.get(name, 0))):
            flagged.append((name, base, sec))
    if flagged:
        print(f"perquery: {len(flagged)} queries above {THRESH}x ledger "
              f"(budgets scaled by run inflation {inflation:.3f}):")
        for name, base, sec in flagged:
            print(f"  REGRESSED {name:32s} {base:.3f} -> {sec:.3f} s "
                  f"({sec / base:.2f}x)")
    else:
        print(f"perquery: no query above {THRESH}x its ledger entry "
              f"({len(qs)} checked, run inflation {inflation:.3f})")
    if new:
        print(f"perquery: {len(new)} queries not in ledger (new since "
              f"baseline): {', '.join(sorted(new))}")
    gone = sorted(set(ledger) - set(qs))
    if gone:
        print(f"perquery: {len(gone)} ledger entries with no bench reading "
              f"(removed or renamed): {', '.join(gone)}")
    if strict and (new or gone):
        print("perquery: STALE LEDGER — the registered query set differs "
              "from the ledger's key set; run tools/make_ledger.sh and "
              "commit BASELINE_PERQUERY.json")
        sys.exit(4)
    if fail_on_flags and flagged:
        print("perquery: FAIL — flags above inflation-scaled budgets on a "
              "deciding reading (a uniform burst would have scaled away; "
              "this is per-query)")
        sys.exit(5)


if __name__ == "__main__":
    main()
