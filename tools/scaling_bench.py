"""Two-cluster-size scaling evidence (north rule: >=0.8 efficiency N -> 4N).

No real cluster exists in the sandbox, so per the task instruction the same
job runs at two parallelism levels in separate JVMs — local[8] (N) and
local[32] (4N) — over the identical input, and we report throughput at both
plus scaling efficiency = (T_4N / T_N) / 4 measured on throughput.

Usage: python tools/scaling_bench.py [seed_n] [--queries]
Writes JSON to stdout; BENCH/BASELINE.md records the results.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from auto_archiver_spark.session import get_spark
from auto_archiver_spark.plans.tableio import TableIO, WaveCheckpoint
from auto_archiver_spark.plans.wave import CrawlConfig, run_crawl
from auto_archiver_spark.sources.fixture import frontier_seed_df, host_policy_df

cores = {cores}
spark = get_spark(app="aas-scaling-%d" % cores, cores=cores)
spark.sparkContext.setLogLevel("ERROR")
root = tempfile.mkdtemp(prefix="aas_scale_")
io, cp = TableIO(root), WaveCheckpoint(root)
seed = frontier_seed_df(spark, {seed_n}).localCheckpoint()
host = host_policy_df(spark)
# warmup: JVM/codegen/Arrow paths
run_crawl(spark, TableIO(tempfile.mkdtemp()), WaveCheckpoint(tempfile.mkdtemp()),
          frontier_seed_df(spark, 200), host,
          CrawlConfig(wave_seconds=3600.0, fetch_partitions=cores, max_waves=1))
t0 = time.monotonic()
stats = run_crawl(spark, io, cp, seed, host,
                  CrawlConfig(wave_seconds=3600.0, fetch_partitions=cores, max_waves=4))
wall = time.monotonic() - t0
archived = sum(s.archived_ok for s in stats)
print("RESULT " + json.dumps({{"cores": cores, "wall_sec": round(wall, 3),
      "archived": archived, "urls_per_sec": round(archived / wall, 2)}}))
shutil.rmtree(root, ignore_errors=True)
spark.stop()
"""


def run_at(cores: int, seed_n: int) -> dict:
    code = CHILD.format(repo=REPO, cores=cores, seed_n=seed_n)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO, timeout=3600
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child(local[{cores}]) failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}")


def main():
    seed_n = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    lo, hi = 8, 32
    r_lo = run_at(lo, seed_n)
    r_hi = run_at(hi, seed_n)
    eff = (r_hi["urls_per_sec"] / r_lo["urls_per_sec"]) / (hi / lo)
    print(
        json.dumps(
            {
                "seed_n": seed_n,
                f"local[{lo}]": r_lo,
                f"local[{hi}]": r_hi,
                "scaling_efficiency": round(eff, 3),
                "target": 0.8,
                "pass": eff >= 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
