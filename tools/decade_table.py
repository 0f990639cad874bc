#!/usr/bin/env python3
"""Compose two graft.Bench artifacts (e.g. sf1 vs sf10) into the
per-query decade-ratio table the round protocol asks for ("the gr2
treatment"): per-query medians from both runs, the ratio, and a
linearity verdict given the nominal data scale factor between them.

Usage:
    python3 tools/decade_table.py SMALL.json BIG.json [nominal_scale]

nominal_scale defaults to 10 (a decade). Verdict bands:
    <= 0.3 * scale   strongly sublinear (fixed cost amortizing)
    <= 1.0 * scale   at-or-below linear
    >  1.0 * scale   SUPERLINEAR - needs a phase note per protocol

Exit code 1 if either artifact has failed queries or is not
adjudicable, so automation can't cite a polluted table.
Stdlib only; no Spark, no pandas.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    small, big = load(sys.argv[1]), load(sys.argv[2])
    scale = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    bad = False
    for name, art in (("small", small), ("big", big)):
        if art.get("failed") not in ([], None):
            print(f"POLLUTED: {name} artifact has failed={art['failed']}")
            bad = True
        if art.get("adjudicable") is False:
            print(f"POLLUTED: {name} artifact is not adjudicable "
                  f"(variance_trimmed={art.get('variance_trimmed', art.get('variance'))})")
            bad = True
    common = [q for q in small["queries"] if q in big["queries"]
              and small["queries"][q] > 0 and big["queries"][q] > 0]
    if not common:
        print("no common queries between the two artifacts")
        sys.exit(1)
    print(f"| query | {sys.argv[1]} s | {sys.argv[2]} s | ratio | verdict ({scale:g}x data) |")
    print("|---|---|---|---|---|")
    rows = sorted(common, key=lambda q: big["queries"][q] / small["queries"][q],
                  reverse=True)
    for q in rows:
        a, b = small["queries"][q], big["queries"][q]
        r = b / a
        verdict = ("strongly sublinear" if r <= 0.3 * scale
                   else "at-or-below linear" if r <= 1.0 * scale
                   else "SUPERLINEAR - phase note required")
        print(f"| {q} | {a:.3f} | {b:.3f} | {r:.2f}x | {verdict} |")
    ratios = sorted(big["queries"][q] / small["queries"][q] for q in common)
    n = len(ratios)
    med = ratios[n // 2] if n % 2 else (ratios[n // 2 - 1] + ratios[n // 2]) / 2
    print(f"\nmedian ratio {med:.2f}x over {n} queries; "
          f"canaries {small.get('canary_sec', -1)} / {big.get('canary_sec', -1)}; "
          f"variance_trimmed {small.get('variance_trimmed', small.get('variance'))} / "
          f"{big.get('variance_trimmed', big.get('variance'))}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
