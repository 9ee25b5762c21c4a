#!/usr/bin/env python
"""Process-parallel test-suite runner (pytest-xdist shape, zero installs).

The suite's wall time is ~3000 small Spark actions x 0.2-0.5 s fixed job
overhead in ONE process (see SCALE.md "test-suite wall time vs box
noise") — the structural fix is process parallelism, which this script
provides without any package: test MODULES are split round-robin by
on-disk size (a decent duration proxy) across N pytest processes, each
with its own session-scoped SparkSession (own tmpfs warehouse, own UI
port — nothing shared, so no Derby locks and no port fights).

Usage: python scripts/run_suite_sharded.py [n_shards]   (default 4)

Exit code is non-zero if any shard fails; per-shard tails are printed so
a red shard's failure is visible without hunting through log files.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    # default 5 shards: re-measured on the 32-CPU test host after the
    # r11 suite growth (572 tests) — identical code, idle box:
    #   4 shards x 4 cores: 519.8 s      5 shards x 4 cores: 473.1 s
    #   4 shards x 8 cores: 641.3 s      7 shards (r10):   587 vs 551 s
    # The suite is bounded by per-action fixed latency inside each Spark
    # driver, not CPU: MORE CORES per session are strictly worse (tiny
    # partitions, more task-scheduling overhead per action), and the
    # shard-count curve is U-shaped — 5 JVMs x 4 cores is the current
    # minimum; 7 overshoots into JVM-contention territory. Re-measure
    # when the module mix shifts; pass an explicit count to override.
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    files = glob.glob(os.path.join(REPO, "tests", "test_*.py"))

    # duration-based balance: file size is a poor proxy for wall time
    # (streaming awaitTermination tests are small files with long waits).
    # scripts/suite_durations.json maps module basename -> measured
    # seconds (regenerate with SPARK_GRAFT_SUITE_TIMING=1, which adds
    # --durations=0 and rewrites the table from the logs); unmeasured
    # modules fall back to a size-derived estimate.
    dur_path = os.path.join(REPO, "scripts", "suite_durations.json")
    durations: dict[str, float] = {}
    if os.path.exists(dur_path):
        import json

        with open(dur_path) as fh:
            durations = json.load(fh)

    def weight(path: str) -> float:
        base = os.path.basename(path)
        if base in durations:
            return durations[base]
        # ~1s of suite wall per 700 bytes was the observed size fit
        return os.path.getsize(path) / 700.0

    files.sort(key=lambda p: -weight(p))
    shards: list[list[str]] = [[] for _ in range(n)]
    loads = [0.0] * n
    for f in files:  # greedy longest-processing-time assignment
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += weight(f)

    timing = os.environ.get("SPARK_GRAFT_SUITE_TIMING") == "1"
    t0 = time.time()
    procs = []
    for i, shard in enumerate(shards):
        if not shard:
            continue
        log = f"/tmp/pytest_shard_{i}.log"
        env = dict(os.environ)
        # 4 local cores per shard: n=4 shards x 4 cores fills a 16-32 CPU
        # box without oversubscribing any single Spark session
        env.setdefault("SPARK_GRAFT_TEST_CORES", "4")
        args = [sys.executable, "-m", "pytest", "-q", *shard]
        if timing:
            args.append("--durations=0")
        procs.append(
            (
                i,
                log,
                subprocess.Popen(
                    args,
                    cwd=REPO,
                    stdout=open(log, "w"),
                    stderr=subprocess.STDOUT,
                    env=env,
                ),
            )
        )
    rc = 0
    for i, log, p in procs:
        code = p.wait()
        tail = ""
        try:
            with open(log) as fh:
                tail = fh.readlines()[-1].strip()
        except (OSError, IndexError):  # missing OR empty log (killed shard)
            pass
        print(f"shard {i}: exit {code} — {tail}")
        if code != 0:
            rc = 1
            with open(log) as fh:
                print("".join(fh.readlines()[-40:]))
    print(f"total wall: {time.time() - t0:.1f}s across {len(procs)} shards")
    if timing and rc == 0:
        # rebuild the per-module duration table from --durations lines
        # ("0.52s call     tests/test_x.py::test_y"); setup/teardown
        # phases are charged to their module too
        import json
        import re

        per_mod: dict[str, float] = {}
        pat = re.compile(
            r"^\s*(\d+\.\d+)s\s+\w+\s+tests/(test_\w+\.py)::"
        )
        for i, log, _ in procs:
            with open(log) as fh:
                for line in fh:
                    mm = pat.match(line)
                    if mm:
                        per_mod[mm.group(2)] = per_mod.get(
                            mm.group(2), 0.0
                        ) + float(mm.group(1))
        if per_mod:
            with open(dur_path, "w") as fh:
                json.dump(
                    {k: round(v, 1) for k in sorted(per_mod)
                     for v in [per_mod[k]]},
                    fh,
                    indent=1,
                )
            print(f"wrote {dur_path} ({len(per_mod)} modules)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
