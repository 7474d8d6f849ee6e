#!/usr/bin/env python3
"""Per-query bench regression gate.

Usage:
  python3 tools/bench_diff.py OLD.json NEW.json [--threshold 1.5]

Each input is a Bench per-query snapshot (BENCH_SELF_r{N}.json /
BENCH_RESULT.json): {"queries": {name: {"run1","run2","rel2"}, ...},
"calib_unit": probe_sec, ...}. Comparison uses `rel2` — warm time in
probe-relative units (run2 / calib_unit), so a uniformly slower box
does not read as a regression (the probe slows down with it). Lanes
slower than `threshold`× the old rel2 are listed as regressions, with
an absolute-floor guard (old rel2 >= 0.1 probe units ≈ 75 ms) so
sub-noise lanes can't trip the gate; new/removed lanes are reported
informationally. Exit code 1 iff regressions exist — usable in CI.

The class of drift this catches is exactly the emb_hamming_ann lesson
(SURVEY §5): a composed-expression rewrite that re-evaluates per pair
instead of per row is invisible to the suite total at small SF but is
a 20× per-lane rel2 jump.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    # tolerate the driver's wrapped form {"parsed": {...}}
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        print(__doc__)
        sys.exit(2)
    threshold = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a
                              else sys.argv[sys.argv.index(a) + 1])
    old, new = load(args[0]), load(args[1])
    oq, nq = old.get("queries", {}), new.get("queries", {})
    if not oq or not nq:
        print("missing per-query map in one input; nothing to compare")
        sys.exit(2)

    floor = 0.1  # probe-relative units; below this, timing is noise
    # Median-normalize: the calibration probe tracks CPU speed but not
    # the scheduling/JIT fixed costs small lanes are made of, so a box
    # speed-state change shifts the whole rel2 distribution together
    # (a suite-wide 1.12x drift was measured between two same-commit
    # runs). A regression is a lane moving `threshold`x beyond that
    # shared drift.
    pairs = {}
    for name in set(oq) & set(nq):
        o, n = oq[name].get("rel2"), nq[name].get("rel2")
        if o is not None and n is not None and o >= floor:
            pairs[name] = (o, n)
    ratios = sorted(n / o for o, n in pairs.values())
    med = ratios[len(ratios) // 2] if ratios else 1.0
    regressions, improvements = [], []
    for name in sorted(pairs):
        o, n = pairs[name]
        ratio = n / o / med
        if ratio >= threshold:
            regressions.append((name, o, n, ratio))
        elif ratio <= 1 / threshold:
            improvements.append((name, o, n, ratio))

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    print(f"compared {len(pairs)} common lanes "
          f"(old calib_unit {old.get('calib_unit')}s, "
          f"new {new.get('calib_unit')}s, suite median drift {med:.2f}x, "
          f"threshold {threshold}x beyond it)")
    if added:
        print(f"new lanes ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"REMOVED lanes ({len(removed)}): {', '.join(removed)}")
    for name, o, n, r in sorted(improvements, key=lambda x: x[3]):
        print(f"improved  {name:32s} {o:8.3f} -> {n:8.3f} ({r:.2f}x)")
    if regressions:
        print(f"\n{len(regressions)} REGRESSIONS (>= {threshold}x beyond "
              "the suite median drift, warm probe-relative):")
        for name, o, n, r in sorted(regressions, key=lambda x: -x[3]):
            print(f"REGRESSED {name:32s} {o:8.3f} -> {n:8.3f} ({r:.2f}x)")
        sys.exit(1)
    print("\nno regressions")


if __name__ == "__main__":
    main()
