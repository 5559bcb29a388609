"""Extra measurement harness for optimization work (bench.py is frozen).

Times individual declared queries with the same methodology as bench.py
(warm call + best-of-3 timed .collect()), optionally via the noop sink
(guide §1.4) to time computation without driver-side result transfer.

Usage:
  python bench_extra.py [--noop] entry [entry ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from bugzilla_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    noop = "--noop" in args
    entries = [a for a in args if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", app_name="bench_extra")
    queries = entry_mod.queries()

    def run_once(name: str) -> None:
        df = queries[name](spark, sf_dir)
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()

    out: dict[str, float] = {}
    for name in entries:
        spark.sparkContext.setJobDescription(f"bench_extra: {name} (warm)")
        run_once(name)
        trials = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"bench_extra: {name} #{i}")
            t0 = time.monotonic()
            run_once(name)
            trials.append(round(time.monotonic() - t0, 3))
        out[name] = min(trials)
        print(f"{name}: {min(trials):.3f}s  (trials={trials})", file=sys.stderr)
    print(json.dumps({"queries": out, "sf_dir": sf_dir, "noop": noop}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
