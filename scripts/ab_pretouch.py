"""A/B: JVM heap pre-fault (-Xms=driver mem + AlwaysPreTouch) vs default
lazy heap growth, on the bench's IVF workload (train/add/search).

Motivation (guide §5 + PERF.md r9): this host backs fresh anonymous pages
at ~0.1-0.35 GB/s (measured first-touch probes, r14). A lazily-grown JVM
heap pays that cost *inside* timed queries; pre-touching at JVM start moves
it to startup, which no query times. In the fast host state the flag is
free (pretouch of an 8 GB heap at normal fault speed is <2s, parallelized
across GC worker threads).

One arm per process (JVM flags are process-wide), alternated A/B/A/B by
the caller:

    for i in 1 2; do
        python scripts/ab_pretouch.py off
        python scripts/ab_pretouch.py on
    done

Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cuda_acceleratedvectordatabaseengine_spark.session import get_spark


def main() -> None:
    arm = sys.argv[1] if len(sys.argv) > 1 else "off"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    extra = {}
    if arm == "on":
        extra["spark.driver.extraJavaOptions"] = (
            f"-Xms{mem} -XX:+AlwaysPreTouch"
        )
    t0 = time.perf_counter()
    spark = get_spark(app_name=f"ab-pretouch-{arm}", extra_conf=extra)
    spark.range(1000).selectExpr("sum(id)").collect()
    startup = time.perf_counter() - t0

    import bench

    fields = bench.ivf_workload(spark, sf_dir)
    out = {
        "arm": arm,
        "startup_sec": round(startup, 2),
        "train_time": fields["train_time"],
        "add_time": fields["add_time"],
        "search_cold_time": fields["search_cold_time"],
        "search_time": fields["search_time"],
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
