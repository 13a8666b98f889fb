#!/usr/bin/env python3
"""Diff two plan-fingerprint snapshots written by graft.PlanDigest.

Usage: python3 tools/plan_diff.py <old_plans.json> <new_plans.json>

Prints added/removed keys and, for keys present in both, a per-key
operator-tree diff (the canonical shape strings are compared whole and
also broken into node labels so the changed operator is visible at a
glance). Exit code 1 when anything differs — usable as a round-close
gate alongside tools/bench_diff.py. Developer tooling only (python is
a driver-side dep, not a library dep).
"""
import json, re, sys


def nodes(shape):
    return re.findall(r"[A-Za-z0-9_.$]+#\d+(?::[A-Za-z]+)?", shape)


def main(old_path, new_path):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    changed = False
    for k in sorted(set(old) - set(new)):
        print(f"REMOVED {k}")
        changed = True
    for k in sorted(set(new) - set(old)):
        print(f"ADDED   {k}")
        changed = True
    for k in sorted(set(old) & set(new)):
        if old[k] == new[k]:
            continue
        changed = True
        from collections import Counter
        o, n = Counter(nodes(old[k])), Counter(nodes(new[k]))
        gone = sorted((o - n).elements())
        came = sorted((n - o).elements())
        print(f"CHANGED {k}")
        if gone:
            print(f"  - nodes gone: {', '.join(gone[:8])}")
        if came:
            print(f"  - nodes new:  {', '.join(came[:8])}")
        if not gone and not came:
            print("  - same node multiset, tree structure moved")
    if not changed:
        print(f"identical: {len(new)} keys")
    return 1 if changed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
