"""Mechanical per-round bench regression diff (VERDICT r5 ask #6;
CPU-primary classification per VERDICT r9 ask #3).

Compares two BENCH_DETAIL json files (per-key headline timings, e2e rows,
scale-probe ratios) and prints every key whose time moved more than the
threshold (default ±20%), plus new/removed keys — so a regression is a
one-command read instead of a by-eye scan of two 70-key dicts.

The PRIMARY regression signal is the per-block contention fingerprint
(VERDICT r9 ask #3): wall time at sub-minute scale is proven
environment-noisy (docs/BENCH_NOTES.md round-8/9 forensics), so each
block's move is CLASSIFIED by what moved with it —

  wall moved, jvm_cpu flat      -> environment (scheduling/steal), ignore
  jvm_cpu moved, counters flat  -> compute regression on identical work:
                                   INVESTIGATE (plan change, new overhead)
  jvm_cpu moved, counters moved -> the workload itself changed (new keys,
                                   different volumes) — compare intent

Usage:
    python scripts/bench_compare.py OLD.json NEW.json [--threshold 0.2]

Exit code is 0 either way (the diff is evidence, not a gate — local
timings at ~0.2 s per key jitter past any hard threshold).
"""

from __future__ import annotations

import argparse
import json


def diff_maps(old: dict, new: dict, threshold: float) -> list[str]:
    lines: list[str] = []
    for key in sorted(set(old) | set(new)):
        if key not in old:
            lines.append(f"  + {key}: {new[key]:.3f}s (new)")
        elif key not in new:
            lines.append(f"  - {key}: {old[key]:.3f}s (removed)")
        else:
            a, b = old[key], new[key]
            if a <= 0:
                # a 0.000-rounded baseline can't be ratioed; still report
                # the transition instead of hiding a possible regression
                if b > 0:
                    lines.append(
                        f"  ! {key}: {a:.3f}s -> {b:.3f}s "
                        "(baseline rounded to 0, no ratio)"
                    )
                continue
            delta = (b - a) / a
            if abs(delta) > threshold:
                arrow = "SLOWER" if delta > 0 else "faster"
                lines.append(
                    f"  {'!' if delta > 0 else ' '} {key}: "
                    f"{a:.3f}s -> {b:.3f}s ({delta:+.0%} {arrow})"
                )
    return lines


def _counters_flat(old: dict, new: dict, threshold: float) -> bool:
    """True when the measured WORKLOAD is the same: identical headline
    key set (a round that registers new operators changes every block's
    CPU legitimately) and every shared scale-probe counter (pair/
    candidate counts — the bit-deterministic volume signal) moved less
    than the threshold. Counters present on only one side count as a
    move."""
    if set(old.get("queries", {}) or {}) != set(new.get("queries", {}) or {}):
        return False
    osp = old.get("scale_probe", {}) or {}
    nsp = new.get("scale_probe", {}) or {}
    if set(osp.get("keys", {}) or {}) != set(nsp.get("keys", {}) or {}):
        return False  # the probe block's own workload changed
    oc = osp.get("pairs", {}) or {}
    nc = nsp.get("pairs", {}) or {}
    if set(oc) != set(nc):
        return False
    for k in oc:
        a, b = oc[k], nc[k]
        if a == 0:
            if b != 0:
                return False
        elif abs(b - a) / a > threshold:
            return False
    return True


def diff_contention(old: dict, new: dict, threshold: float) -> list[str]:
    """Per-block (wall, jvm_cpu) diff with the r9-ask classification: the
    CPU delta is the primary signal, the wall delta is the noisy one."""
    lines: list[str] = []
    ob, nb = old.get("contention", {}) or {}, new.get("contention", {}) or {}
    flat = _counters_flat(old, new, threshold)
    for block in sorted(set(ob) | set(nb)):
        o, n = ob.get(block), nb.get(block)
        if o is None or n is None:
            lines.append(f"  ? {block}: present in one file only")
            continue
        ow, nw = o.get("wall_s"), n.get("wall_s")
        oc, nc = o.get("jvm_cpu_s"), n.get("jvm_cpu_s")
        if not ow or nw is None or oc is None or nc is None:
            lines.append(f"  ? {block}: fingerprint incomplete")
            continue
        dw = (nw - ow) / ow
        # a 0.0-rounded CPU baseline can't be ratioed — treat any nonzero
        # new reading as a move rather than silently classifying 'flat'
        # exactly when the regression is largest
        dc = (nc - oc) / oc if oc else (float("inf") if nc else 0.0)
        wall_moved, cpu_moved = abs(dw) > threshold, abs(dc) > threshold
        if cpu_moved and flat:
            verdict = "CPU moved on flat counters -> INVESTIGATE compute"
        elif cpu_moved:
            verdict = "cpu+counters moved -> workload changed"
        elif wall_moved:
            verdict = "wall-only move, cpu flat -> environment"
        else:
            verdict = "flat"
        lines.append(
            f"  {'!' if cpu_moved and flat else ' '} {block}: "
            f"wall {ow:.1f}s -> {nw:.1f}s ({dw:+.0%}), "
            f"jvm_cpu {oc:.1f}s -> {nc:.1f}s ({dc:+.0%})  [{verdict}]"
        )
        steal = max(o.get("steal_pct", 0.0), n.get("steal_pct", 0.0))
        if steal > 1.0:
            lines.append(
                f"      (steal up to {steal:.1f}% during this block — "
                "treat both readings as contaminated)"
            )
    return lines


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.2)
    args = ap.parse_args()
    old = json.load(open(args.old))
    new = json.load(open(args.new))

    print(
        f"suite wall: {old.get('value')}s -> {new.get('value')}s "
        f"({len(old.get('queries', {}))} -> {len(new.get('queries', {}))} keys)"
    )
    # PRIMARY signal first: per-block CPU classification (wall is noisy)
    print("contention blocks (jvm_cpu primary, wall advisory):")
    print("\n".join(diff_contention(old, new, args.threshold)))
    for section, title in (
        ("queries", "headline keys"),
        ("e2e", "replication e2e"),
    ):
        lines = diff_maps(
            old.get(section, {}), new.get(section, {}), args.threshold
        )
        print(f"{title}: {len(lines)} moved >{args.threshold:.0%}")
        print("\n".join(lines))
    # scale-probe ratios compare directly (already normalized)
    old_r = {
        k: v.get("ratio")
        for k, v in old.get("scale_probe", {}).get("keys", {}).items()
    }
    new_r = {
        k: v.get("ratio")
        for k, v in new.get("scale_probe", {}).get("keys", {}).items()
    }
    print("scale-probe 10x ratios (old -> new):")
    for k in sorted(set(old_r) | set(new_r)):
        print(f"   {k}: {old_r.get(k)} -> {new_r.get(k)}")


if __name__ == "__main__":
    main()
