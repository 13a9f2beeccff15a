#!/usr/bin/env python3
"""Compare two Bench JSON artifacts (BENCH_LAST.json / BENCH_r{N}.json).

Usage: python3 dev/bench_diff.py OLD.json NEW.json [--median]

Per-query deltas sorted by regression size, plus common-set totals.
Queries present in only one file are listed as surface changes — totals
are compared over the COMMON query set only, because comparing totals
across different query counts is the round-over-round mistake this tool
exists to prevent. --median uses the noise-tolerant per-query medians
(3-pass Bench); default is the steady-state min.
"""
import json
import sys

try:  # die quietly under `| head`
    from signal import SIG_DFL, SIGPIPE, signal
    signal(SIGPIPE, SIG_DFL)
except ImportError:  # non-POSIX
    pass


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        sys.exit(__doc__)
    use_median = "--median" in sys.argv
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
    key = ("queries_median"
           if use_median and "queries_median" in old and "queries_median" in new
           else "queries")
    qo, qn = old[key], new[key]
    common = sorted(set(qo) & set(qn))
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))

    rows = []
    for q in common:
        a, b = qo.get(q), qn.get(q)
        if a is None or b is None:  # failed in one run — not comparable
            continue
        rows.append((q, a, b, b - a, (b / a - 1) * 100 if a else 0.0))
    rows.sort(key=lambda r: -r[3])

    print(f"metric={key}  common={len(common)}  "
          f"added={len(added)}  removed={len(removed)}")
    print(f"{'query':28s} {'old':>8s} {'new':>8s} {'delta':>8s} {'pct':>8s}")
    for q, a, b, d, p in rows:
        flag = "  <<" if abs(d) > 0.5 and abs(p) > 25 else ""
        print(f"{q:28s} {a:8.2f} {b:8.2f} {d:+8.2f} {p:+7.1f}%{flag}")
    to = sum(r[1] for r in rows)
    tn = sum(r[2] for r in rows)
    print(f"\ncommon-set total: {to:.1f} -> {tn:.1f} s  ({(tn / to - 1) * 100:+.1f}%)")
    if added:
        print("added:  ", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))


if __name__ == "__main__":
    main()
