#!/usr/bin/env python3
"""Compare two bench artifacts (bench_full.json / BENCH_r{N}.json lines).

Prints per-artifact totals, the SHARED-query subtotal (the only
round-over-round number that is comparable when the query set grew), the
disjoint query sets with their mass, and the largest per-query deltas —
so every percentage a close narrative claims is reproducible from the
two committed artifacts (VERDICT-r15 item 4: the r15 README cited a
denominator no committed artifact contained).

Usage: scripts/compare_close.py OLD.json NEW.json [topN]
"""
import json
import sys


def load(path):
    with open(path) as f:
        art = json.loads(f.read().strip())
    if "queries" in art:
        return art
    # driver-captured BENCH_r{N}.json wraps (or truncates) the bench
    # line: accept {parsed: {...}} when the full line survived, refuse
    # loudly otherwise instead of a KeyError downstream
    parsed = art.get("parsed")
    if isinstance(parsed, dict) and "queries" in parsed:
        return parsed
    sys.exit(f"{path}: no per-query map in this artifact (driver-side "
             "truncation?) — compare the matching full artifact instead, "
             "e.g. `git show <sha>:bench_full.json > /tmp/a.json`")


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    sa = sum(qa[q] for q in shared)
    sb = sum(qb[q] for q in shared)
    for tag, path, art in (("A", sys.argv[1], a), ("B", sys.argv[2], b)):
        print(f"{tag}: {path}  total={art['value']:.1f}s  "
              f"n={len(art['queries'])}  "
              f"start_loadavg={art.get('start_loadavg')}  "
              f"load_gate={art.get('load_gate')}")
    if sa > 0:
        print(f"shared-{len(shared)} subtotal: A={sa:.1f}s  B={sb:.1f}s  "
              f"delta={sb - sa:+.1f}s ({(sb / sa - 1) * 100:+.1f}%)")
    else:
        print(f"shared-{len(shared)} subtotal: A={sa:.1f}s  B={sb:.1f}s "
              "(no shared mass — artifacts are not comparable round-over-round)")
    if only_a:
        print(f"only in A ({len(only_a)}, {sum(qa[q] for q in only_a):.1f}s): "
              + ", ".join(only_a))
    if only_b:
        print(f"only in B ({len(only_b)}, {sum(qb[q] for q in only_b):.1f}s): "
              + ", ".join(only_b))
    deltas = sorted(((qb[q] - qa[q], q) for q in shared),
                    key=lambda x: -abs(x[0]))
    print(f"top {top} per-query deltas (B - A):")
    for d, q in deltas[:top]:
        print(f"  {q:34s} {qa[q]:7.2f} -> {qb[q]:7.2f}  {d:+6.2f}s")


if __name__ == "__main__":
    main()
