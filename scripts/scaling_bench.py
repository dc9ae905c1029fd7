#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N executors).

No real cluster exists in the sandbox, so per driver instruction the same
job runs at two parallelism levels — ``local[8]`` and ``local[32]`` — on
the SAME cached input corpus, and we report docs/sec at both plus

    efficiency = (docs_per_sec@32) / (4 * docs_per_sec@8)

Each measurement is a fresh subprocess running ``bench.py`` with
``BENCH_SKIP_QUERIES=1`` so only the extraction stage is timed. Results are
appended to BENCH.md and printed as JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cores: int, target_docs: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_TARGET_DOCS=str(target_docs),
        BENCH_SKIP_QUERIES="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    target = int(os.environ.get("BENCH_TARGET_DOCS", "200000"))
    lo_cores = int(os.environ.get("SCALING_LO", "8"))
    hi_cores = int(os.environ.get("SCALING_HI", "32"))

    # warm the corpus cache (generation excluded from both measurements)
    run_bench(hi_cores, target, sf_dir)

    lo = run_bench(lo_cores, target, sf_dir)
    hi = run_bench(hi_cores, target, sf_dir)
    ratio = hi_cores / lo_cores
    eff = hi["docs_per_sec"] / (ratio * lo["docs_per_sec"])
    result = {
        "sf": lo["sf"],
        "n_docs": lo["n_docs"],
        f"docs_per_sec_local{lo_cores}": lo["docs_per_sec"],
        f"docs_per_sec_local{hi_cores}": hi["docs_per_sec"],
        "cores_ratio": ratio,
        "scaling_efficiency": round(eff, 3),
        "pass_north_rule": eff >= 0.8,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
