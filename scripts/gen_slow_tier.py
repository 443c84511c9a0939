#!/usr/bin/env python
"""Regenerate tests/slow_tests.txt from a pytest --durations=0 output.

Usage:
    MDLS_RUN_SLOW=1 python -m pytest tests/ -q --durations=0 > /tmp/dur.out
    python scripts/gen_slow_tier.py /tmp/dur.out [threshold_sec]

Policy (mirrors the committed manifest's header): a test goes to the
slow tier when its CALL time is >= threshold (default 2.0 s), except
that every test file keeps at least its fastest test in the default
tier (family coverage), and the driver-contract tests
(tests/test_entry.py) are never marked.
"""

from __future__ import annotations

import collections
import os
import re
import sys

HEADER = """\
# Slow-tier test node IDs: call time >= {thresh}s in the committed
# full-suite durations run. tests/conftest.py SKIPS these unless
# MDLS_RUN_SLOW=1; every test file keeps at least its fastest test in
# the default tier, so each operator/query family stays covered. The
# certifying full run (COVERAGE.md) is
#   MDLS_RUN_SLOW=1 python -m pytest tests/ -q
# Regenerate after adding slow tests: full run with --durations=0,
# then scripts/gen_slow_tier.py <durations-output>.
"""


def main() -> None:
    src = sys.argv[1]
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    calls: dict[str, float] = {}
    for line in open(src):
        m = re.match(r"([0-9.]+)s call\s+(\S+)", line)
        if m:
            calls[m.group(2)] = float(m.group(1))
    if not calls:
        raise SystemExit(f"no call durations found in {src}")
    byfile = collections.defaultdict(list)
    for t, d in calls.items():
        byfile[t.split("::")[0]].append((d, t))
    slow: set[str] = set()
    for lst in byfile.values():
        lst.sort()
        marked = [t for d, t in lst if d >= thresh]
        if len(marked) == len(lst) and lst:
            marked = [t for t in marked if t != lst[0][1]]
        slow.update(marked)
    slow = {t for t in slow if not t.startswith("tests/test_entry.py")}
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "slow_tests.txt")
    with open(out, "w") as fh:
        fh.write(HEADER.format(thresh=thresh))
        for t in sorted(slow):
            fh.write(t + "\n")
    kept = sum(d for t, d in calls.items() if t not in slow)
    print(f"{len(slow)} of {len(calls)} tests marked slow -> {out}")
    print(f"fast-tier call time: {kept / 60:.1f} min")


if __name__ == "__main__":
    main()
