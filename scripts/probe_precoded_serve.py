#!/usr/bin/env python
"""Two-decade serve-latency probe for the PERSISTED-CODES IVF×PQ path
(VERDICT r9 item 3): `ivf_pq_precoded_search_embeddings` at 1x/10x/100x,
side by side with probe 94's frozen-search numbers.

Probe 94 identified the per-call corpus PQ-encode as the only linear
serve-time term of `ivf_pq_frozen_search_embeddings` and named the
production fix: persist the codes, encode once. This probe measures
that fix. The warm-up call (untimed) trains + memoizes the model AND
writes the cell-partitioned codes parquet; the timed runs then measure
the pure persisted-codes serve — scan ~5 ints/vector, broadcast probe
join, broadcast ADC LUT, bounded top-k.

Reuses probe_heavies_100x's replica synthesizer (shifted vec_ids into
/tmp; testdata untouched).

Usage: python scripts/probe_precoded_serve.py [factors...] (default 1 10 100)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_heavies_100x import synthesize  # noqa: E402

from pyspark_playground_spark import queries as Q  # noqa: E402
from pyspark_playground_spark.session import get_spark  # noqa: E402


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark()
    fn = Q.QUERIES["ivf_pq_precoded_search_embeddings"]
    for factor in factors:
        sf_dir = synthesize(spark, factor)
        in_rows = Q.load(spark, sf_dir, "embeddings").count()
        # warm-up: trains the model (memo) and writes the codes parquet
        out_rows = fn(spark, sf_dir).count()
        walls = []
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).count()
            walls.append(time.time() - t0)
        walls.sort()
        wall = walls[len(walls) // 2]
        print(json.dumps({
            "probe": "ivf_pq_precoded_search_embeddings",
            "factor": factor, "input_rows": in_rows,
            "output_rows": out_rows, "sec": round(wall, 2),
            "rows_per_sec": round(in_rows / wall),
        }), flush=True)


if __name__ == "__main__":
    main()
