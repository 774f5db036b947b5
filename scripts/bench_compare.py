"""Mechanical per-round bench regression diff (VERDICT r5 ask #6).

Compares two BENCH_DETAIL json files (per-key headline timings, e2e rows,
scale-probe ratios) and prints every key whose time moved more than the
threshold (default ±20%), plus new/removed keys — so a regression is a
one-command read instead of a by-eye scan of two 70-key dicts.

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
