"""Merge .coverage_al/*.json hit files and print a per-file coverage report.

Exit code 1 when total coverage falls below --fail-under (default 0 = report
only). Companion to tools/al_coverage.py; see that module's docstring.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from al_coverage import OUT_DIR, PKG_ROOT, executable_lines


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fail-under", type=float, default=0.0)
    ap.add_argument("--dir", default=str(OUT_DIR))
    ap.add_argument(
        "--min-file-lines", type=int, default=1,
        help="skip files with fewer executable lines than this",
    )
    args = ap.parse_args()

    cov_dir = Path(args.dir)
    files = sorted(cov_dir.glob("cov-*.json"))
    if not files:
        print(f"no coverage files in {cov_dir} (run with AL_COVERAGE=1)")
        return 1

    hits: dict[str, set[int]] = {}
    for f in files:
        for fn, lines in json.loads(f.read_text()).items():
            hits.setdefault(fn, set()).update(lines)

    # Denominator: every python file in the package, hit or not
    all_py = sorted(Path(PKG_ROOT).rglob("*.py"))
    rows = []
    tot_exec = tot_hit = 0
    for path in all_py:
        ex = executable_lines(path)
        if len(ex) < args.min_file_lines:
            continue
        hit = hits.get(str(path), set()) & ex
        tot_exec += len(ex)
        tot_hit += len(hit)
        rows.append((str(path.relative_to(Path(PKG_ROOT).parent)), len(hit), len(ex)))

    rows.sort(key=lambda r: r[1] / max(r[2], 1))
    width = max(len(r[0]) for r in rows)
    for name, hit, ex in rows:
        pct = 100.0 * hit / max(ex, 1)
        print(f"{name:<{width}}  {hit:>5}/{ex:<5}  {pct:6.1f}%")
    total_pct = 100.0 * tot_hit / max(tot_exec, 1)
    print("-" * (width + 22))
    print(f"{'TOTAL':<{width}}  {tot_hit:>5}/{tot_exec:<5}  {total_pct:6.1f}%")

    if args.fail_under and total_pct < args.fail_under:
        print(f"FAIL: coverage {total_pct:.1f}% < required {args.fail_under:.1f}%")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
