"""Compare two bench detail JSONs (per-query min-of-N maps).

Usage: python scripts/bench_compare.py OLD.json NEW.json [top_n]

Prints headline sums, the top movers by absolute delta, and the median
per-query ratio (the cross-epoch noise indicator from the r13
adjudication: uniform ratio shifts are CPU-delivery epochs, scattered
per-query spikes are steal bursts, a single stable mover is a plan
change).
"""

from __future__ import annotations

import json
import statistics
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    q = d.get("queries", d)
    return {k: float(v) for k, v in q.items() if isinstance(v, (int, float))}


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__.strip().splitlines()[2])
        sys.exit(2)
    old = load(sys.argv[1])
    new = load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    common = sorted(set(old) & set(new))
    print(f"old sum {sum(old.values()):.1f}s ({len(old)}q)   "
          f"new sum {sum(new.values()):.1f}s ({len(new)}q)   "
          f"common {len(common)}")
    ratios = [new[k] / old[k] for k in common if old[k] > 0]
    if not ratios:
        print("no common queries with old > 0 — nothing to compare "
              "(is one file a gate-fields-only stdout capture?)")
        return
    print(f"median per-query ratio new/old: {statistics.median(ratios):.3f}")
    movers = sorted(common, key=lambda k: -(abs(new[k] - old[k])))
    print(f"{'query':8s} {'old':>8s} {'new':>8s} {'delta':>8s} {'ratio':>6s}")
    for k in movers[:top_n]:
        r = new[k] / old[k] if old[k] > 0 else float("inf")
        print(f"{k:8s} {old[k]:8.3f} {new[k]:8.3f} {new[k]-old[k]:+8.3f} {r:6.2f}")


if __name__ == "__main__":
    main()
