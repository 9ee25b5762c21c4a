#!/usr/bin/env python
"""Registry-wide census-window plan guard (VERDICT r6 item 4).

Builds every registered query at sf0.001 and asserts — via
``plans.window_guard.unpartitioned_window_violations`` — that no
partition-less Window runs over an unbounded (raw, SF-growing) frame.
Run per round alongside check_oracle; the fast mechanics tests live in
``tests/test_window_guard.py``.

Usage: python scripts/window_guard.py [sf_dir] [query ...]
Exit 1 if any violation is found.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_playground_spark import queries as Q
from pyspark_playground_spark.plans.window_guard import (
    unpartitioned_window_violations,
)
from pyspark_playground_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    spark = get_spark(app_name="window-guard")
    t0 = time.time()
    bad = 0
    n = 0
    for name, fn in Q.QUERIES.items():
        if only and name not in only:
            continue
        n += 1
        df = fn(spark, sf_dir)
        for v in unpartitioned_window_violations(df):
            bad += 1
            print(f"VIOLATION {name}: {v}")
    print(
        f"{n - bad if bad == 0 else n}/{n} queries checked, "
        f"{bad} violations [{time.time() - t0:.1f}s]"
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
