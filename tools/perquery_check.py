#!/usr/bin/env python3
"""Per-query regression report against the committed baseline ledger.

Usage: perquery_check.py <BENCH_FULL.json> [BASELINE_PERQUERY.json]

Compares a bench run's per-query seconds against the ledger (median of 3
standalone full-pack runs on a known-green tree) and names every query
above THRESH x its ledger entry — so a real per-query regression is
named by the gate instead of excavated from a +N s total by hand.
Box-noise discipline: only queries above an absolute floor are flagged
(a 0.05->0.12 s swing is scheduler noise, not a plan change), and the
exit code is always 0 — the TOTAL ceiling in gates.sh stays the gate;
this report exists to attribute a breach, not to add a second one.
New queries (absent from the ledger) are listed informationally.
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
    bench = load(sys.argv[1])
    ledger_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE_PERQUERY.json"
    try:
        ledger = json.loads(open(ledger_path).read())["queries"]
    except FileNotFoundError:
        print(f"perquery: no ledger at {ledger_path} — skipping")
        return
    qs = {k: abs(v) for k, v in bench["queries"].items()}
    flagged, new = [], []
    for name, sec in sorted(qs.items(), key=lambda kv: -kv[1]):
        base = ledger.get(name)
        if base is None:
            new.append(name)
        elif sec > ABS_FLOOR and sec > THRESH * base:
            flagged.append((name, base, sec))
    if flagged:
        print(f"perquery: {len(flagged)} queries above {THRESH}x ledger:")
        for name, base, sec in flagged:
            print(f"  REGRESSED {name:32s} {base:.3f} -> {sec:.3f} s "
                  f"({sec / base:.2f}x)")
    else:
        print(f"perquery: no query above {THRESH}x its ledger entry "
              f"({len(qs)} checked)")
    if new:
        print(f"perquery: {len(new)} queries not in ledger (new since "
              f"baseline): {', '.join(sorted(new))}")


if __name__ == "__main__":
    main()
