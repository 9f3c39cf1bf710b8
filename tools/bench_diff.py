"""Bench regression harness: diff two BENCH.json artifacts.

Wall-clock is host-confounded (the mid-r04 VM migration proved cross-
round walls can shift 2x with zero plan movement), so the PRIMARY
regression signal is per-query shuffle bytes — byte-stable across hosts
for an unchanged plan. Wall ratios are still reported, but normalized by
the run-pair's MEDIAN ratio (the host factor) before flagging.

Usage:
    python tools/bench_diff.py BASE.json NEW.json [--shuffle-tol 0.05]
        [--wall-tol 1.5]
    python tools/bench_diff.py --git HEAD~1 [NEW.json]   # base from git

Exit code 1 iff any shuffle regression exceeds the tolerance — so a
commit hook or the round close-out can gate on it.

Note: the DRIVER's per-round BENCH_r{N}.json artifacts wrap a truncated
stdout tail (parsed: null) and are not diffable — diff the repo's own
committed BENCH.json across revisions (--git) instead.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def load_git(rev: str, path: str = "BENCH.json") -> dict:
    out = subprocess.run(
        ["git", "show", f"{rev}:{path}"], capture_output=True, text=True
    )
    if out.returncode != 0:
        sys.exit(f"git show {rev}:{path} failed: {out.stderr.strip()}")
    return json.loads(out.stdout)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("base", nargs="?", default=None)
    ap.add_argument("new", nargs="?", default="BENCH.json")
    ap.add_argument("--git", default=None, metavar="REV",
                    help="read the base BENCH.json from a git revision")
    ap.add_argument("--shuffle-tol", type=float, default=0.05,
                    help="flag shuffle-byte growth beyond this fraction")
    ap.add_argument("--wall-tol", type=float, default=1.5,
                    help="flag host-normalized wall ratios beyond this")
    args = ap.parse_args()
    if args.git:
        base = load_git(args.git)
    elif args.base:
        base = load(args.base)
    else:
        sys.exit("need a base: positional path or --git REV")
    new = load(args.new)

    bq, nq = base.get("queries", {}), new.get("queries", {})
    bs, ns = base.get("shuffle_bytes", {}), new.get("shuffle_bytes", {})
    if not bq or not nq:
        sys.exit(
            "one side has no 'queries' map — driver BENCH_r{N}.json "
            "artifacts are truncated wrappers; diff committed BENCH.json "
            "revisions instead (--git REV)"
        )
    added = sorted(set(nq) - set(bq))
    removed = sorted(set(bq) - set(nq))
    common = sorted(set(bq) & set(nq))

    # host factor: median wall ratio over unchanged-shuffle queries if
    # possible (their plans provably did not move), else over all common
    stable = [
        q for q in common
        if q in bs and q in ns
        and bs[q].get("write_bytes") is not None
        and bs[q]["write_bytes"] == ns[q].get("write_bytes")
    ]
    pool = stable if len(stable) >= 5 else common
    ratios = [nq[q] / bq[q] for q in pool if bq[q] > 0]
    host = statistics.median(ratios) if ratios else 1.0

    shuffle_flags, wall_flags = [], []
    for q in common:
        b_w = bs.get(q, {}).get("write_bytes")
        n_w = ns.get(q, {}).get("write_bytes")
        if (b_w is not None and n_w is not None
                and n_w > max(b_w * (1 + args.shuffle_tol), b_w + 1024)):
            # the absolute 1 KiB floor keeps zero/near-zero-shuffle
            # queries flaggable without tripping on metric jitter
            shuffle_flags.append((q, b_w, n_w, n_w / b_w if b_w else float("inf")))
        if bq[q] > 0:
            norm = nq[q] / bq[q] / host
            if norm > args.wall_tol:
                wall_flags.append((q, bq[q], nq[q], norm))

    print(f"base: {len(bq)} queries  new: {len(nq)} queries  "
          f"sf {base.get('sf')} -> {new.get('sf')}")
    print(f"host factor (median wall ratio over "
          f"{len(pool)} {'shuffle-stable' if pool is stable else 'common'} "
          f"queries): {host:.3f}")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    n_stable = len(stable)
    print(f"shuffle byte-stable: {n_stable}/{len(common)} common queries")
    if shuffle_flags:
        print(f"\nSHUFFLE REGRESSIONS (> {args.shuffle_tol:.0%} growth):")
        for q, b, n, r in sorted(shuffle_flags, key=lambda x: -x[3]):
            print(f"  {q}: {b:,} -> {n:,} bytes ({r:.2f}x)")
    if wall_flags:
        print(f"\nwall outliers (host-normalized > {args.wall_tol}x; "
              f"advisory — walls are noisy):")
        for q, b, n, r in sorted(wall_flags, key=lambda x: -x[3]):
            print(f"  {q}: {b:.2f}s -> {n:.2f}s ({r:.2f}x normalized)")
    if not shuffle_flags and not wall_flags:
        print("\nno regressions: every common query within tolerance")
    return 1 if shuffle_flags else 0


if __name__ == "__main__":
    sys.exit(main())
