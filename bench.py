"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes end-to-end via the noop sink (full plan runs, nothing
is collected to the driver), which is what a cluster job would do.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from redshift_to_pendo_api_data_pipeline_spark.session import get_spark, sf_dir


def main() -> None:
    data_dir = sf_dir()
    m = re.search(r"sf([\d.]+)", data_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    timings: dict[str, float] = {}

    # one warm-up pass on the flagship to absorb JVM/codegen warmup
    entrymod.queries()["volume_count"](spark, data_dir).collect()

    t_total0 = time.perf_counter()
    for name, fn in qs.items():
        t0 = time.perf_counter()
        df = fn(spark, data_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
    total = round(time.perf_counter() - t_total0, 4)

    print(json.dumps({
        "metric": "total_query_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
