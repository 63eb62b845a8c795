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


def _extract_throughput(spark, data_dir: str) -> dict:
    """BASELINE parity metric: the reference taps ~12k records/s through a
    single cursor (331,207 rows / 27.54 s, BASELINE.md). Here: the full
    sync shape — scan, incremental filter, broadcast semi-join, remap,
    reshape, RECORD-envelope JSON serialization — executed end-to-end, rows
    per wall-second."""
    from pyspark.sql import functions as F
    from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, data_dir, "events")
    allow = ev.select("user_id").where(F.col("user_id") % 3 == 0).distinct() \
        .select(F.col("user_id").alias("id"))
    shaped = (
        ev.join(F.broadcast(allow), ev.user_id == F.col("id"), "left_semi")
        .select(
            F.col("event_id").alias("eventId"),
            F.col("user_id").alias("visitorId"),
            F.col("event_type").alias("eventType"),
            F.col("value"),
            F.col("ts"),
        )
    )
    payload = shaped.select(F.to_json(F.struct(*shaped.columns)).alias("p"))
    n = shaped.count()
    t0 = time.perf_counter()
    payload.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    return {"records": n, "seconds": round(dt, 4),
            "records_per_sec": round(n / dt, 1)}


def _sink_throughput(spark, data_dir: str) -> dict:
    """BASELINE parity metric: the reference posts ~2,500 records/s per
    async connection (README.md:5). Here: the real partition writer
    (batching, token bucket, retries) against a loopback HTTP server."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from pyspark.sql import functions as F
    from redshift_to_pendo_api_data_pipeline_spark.sink.http_sink import SinkConfig, sink_dataframe
    from redshift_to_pendo_api_data_pipeline_spark.sources.tables import load_table

    class API(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["content-length"]))
            n = body.count(b'"id"')
            out = json.dumps({"total": n, "updated": n, "failed": 0}).encode()
            self.send_response(200)
            self.send_header("content-length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), API)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        ev = load_table(spark, data_dir, "events").select(
            F.col("event_id").alias("id"),
            F.col("user_id").alias("visitorId"),
            F.col("event_type").alias("eventType"),
            F.col("value"),
        )
        n = ev.count()
        cfg = SinkConfig(
            base_url=f"http://127.0.0.1:{srv.server_port}",
            stream_name="visitors",
        )
        t0 = time.perf_counter()
        total = sink_dataframe(ev, cfg).agg({"total": "sum"}).first()[0]
        dt = time.perf_counter() - t0
        assert total == n, (total, n)
        return {"records": n, "seconds": round(dt, 4),
                "records_per_sec": round(n / dt, 1)}
    finally:
        srv.shutdown()


def _probe_df(spark, data_dir: str):
    """The pinned calibration probe's plan (see _calibration — DO NOT
    EDIT the shape): one lineitem scan (2 pruned columns), one group
    key, integer sum."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{data_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("l_quantity") * 100).cast("long")).alias("qty_fp"),
    )


def _inloop_median(samples: list) -> float:
    """Median of the in-loop probe samples, discarding the first: it
    fires at loop start where residual warm-up / Python-worker fork
    churn can still be draining (ADVICE r10 #5)."""
    tail = sorted(samples[1:]) if len(samples) > 1 else sorted(samples)
    return round(tail[len(tail) // 2], 4)


def _calibration(spark, data_dir: str) -> dict:
    """Fixed host-speed probe (round 7, r6 verdict #5): per-query medians
    drift up to ~40% between machine sessions (documented in README 3b),
    which twice made round-over-round deltas unreadable. This pinned
    scan+agg — DO NOT EDIT; its stability across rounds is its entire
    value — runs median-of-5 after warm-up and lands in BENCH_full.json
    as `calibration`, so a cross-round comparison can normalize:
    query_r7 / query_r6 is only signal beyond (cal_r7 / cal_r6).
    Shape: one lineitem scan (2 pruned columns), one group key, integer
    sum — pure scan+shuffle+agg, no Python, no joins, no staging."""
    probe = _probe_df(spark, data_dir)
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        probe.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return {
        "probe": "lineitem_scan_groupby_sum_fixed_v1",
        "median_of_5_sec": round(samples[2], 4),
        "min_sec": round(samples[0], 4),
        "max_sec": round(samples[-1], 4),
    }


def main() -> None:
    data_dir = sf_dir()
    m = re.search(r"sf([\d.]+)", data_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    timings: dict[str, float] = {}

    # warm-up: absorb one-time per-PROCESS costs — Janino codegen for each
    # generated class family, Python-worker forks (each fork imports
    # numpy/pandas/pyarrow), broadcast/shuffle machinery spin-up — so the
    # timed loop below measures steady-state operator cost. On a
    # long-lived cluster those costs are paid once per executor lifetime
    # and amortize to zero against 100 TB of data; at bench SF they would
    # otherwise dominate (profiled: first execution of a query shape costs
    # 2-5x its steady state, entirely in codegen/fork, not data work).
    # The warm-up runs every query once at the SMALLEST sf (sf0.001 —
    # negligible data) so each query's exact generated-class set is hot;
    # the timed loop then runs the real SF. Warm-up wall time is NOT
    # counted; all per-query data work at the bench SF is.
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s):
        return s

    spark.range(1000, numPartitions=64).select(F.sum(_warm("id"))).collect()
    warm_dir = os.path.join(os.path.dirname(data_dir.rstrip("/")), "sf0.001")
    for name, fn in qs.items():
        try:
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # a query that only works at the bench SF warms in-loop

    # Contention gate (r8, r7 verdict #3): the r7 closeout artifact
    # shipped from a ~1.5x contended host and every per-query median in
    # it was garbage. The pinned probe runs BEFORE the timed loop; when
    # its median exceeds the bound, the artifact is stamped
    # `contended: true` with the measured inflation factor (vs the
    # pinned idle reference 0.1034s), and under
    # SPARK_GRAFT_BENCH_STRICT=1 the run REFUSES to write anything at
    # all — no future round ships silently-inflated medians.
    # r7 idle-host committed reference, measured with EXACTLY the same
    # plan AND action as every probe in this file: _probe_df's scan+agg
    # written through the noop sink (_calibration has used the noop
    # write since its introduction in r7 — git ac47cd7 — so the pinned
    # value, the pre/post boundary probes, and the in-loop probes all
    # time one identical job; no cross-action bias)
    PINNED_IDLE_PROBE_SEC = 0.1034
    CONTENTION_BOUND_SEC = 0.13      # r7 verdict #3 suggested bound
    pre_cal = _calibration(spark, data_dir)
    contended = pre_cal["median_of_5_sec"] > CONTENTION_BOUND_SEC
    inflation = round(pre_cal["median_of_5_sec"] / PINNED_IDLE_PROBE_SEC, 3)
    if contended:
        sys.stderr.write(
            f"bench: HOST CONTENDED — probe {pre_cal['median_of_5_sec']}s"
            f" > bound {CONTENTION_BOUND_SEC}s"
            f" ({inflation}x the pinned idle reference); medians below"
            " are inflated by roughly that factor\n"
        )
        if os.environ.get("SPARK_GRAFT_BENCH_STRICT") == "1":
            sys.stderr.write(
                "bench: SPARK_GRAFT_BENCH_STRICT=1 — refusing to write"
                " a contaminated closeout artifact; re-run on an idle"
                " host\n"
            )
            sys.exit(3)

    # Each query is timed as the MEDIAN of three consecutive end-to-end
    # runs (r4 methodology; r1-r2 used one-shot timings, r3 min-of-2 —
    # cross-round totals are comparable only within one methodology): a
    # single 32-thread JVM hands random queries a GC pause or page-cache
    # miss, and one-shot timings scatter 3-5x run to run. The median is
    # robust to one outlier in either direction where min-of-2 was
    # optimistic; the per-query SPREAD (max - min of the three) is
    # reported alongside so round-over-round deltas smaller than a
    # query's own spread are visibly noise. Every run is the full plan
    # end-to-end (scan -> noop sink), never a cache read: the work
    # measured is identical each time. BOTH totals are reported: `value`
    # is the steady-state (median-of-3) total, and wall_clock_once_sec
    # is the sum of each query's FIRST timed run — the honest
    # single-pass figure.
    #
    # Staged pipelines (MinHash/SimHash signatures, ANN candidate sets,
    # IVF index) run the loop with reuse ON against a run-unique root:
    # their FIRST timed run pays the cold stage (so wall_clock_once_sec
    # includes it), the second probes the staged artifact, and min-of-2
    # lands on the probe cost — the stage-once/probe-many steady state
    # these operators are designed around. The cold-vs-probe split is
    # additionally measured explicitly below (the `staged` key), so the
    # staging write cost is REPORTED, not hidden in the headline total.
    import inspect
    import shutil

    # Staged queries (stage-once/probe-many pipelines) pay their cold
    # stage in ONE separately-timed pre-run; the 3 timed samples are
    # then all probe-cost, so median AND spread describe the steady
    # state (r8 verdict #6: bucketed_neardup_recall's 8.25 s spread on
    # a 4.86 s median was its O(N^2) ground-truth staging landing in
    # timed sample #1). The cold run still counts toward
    # wall_clock_once_sec — the honest single-pass figure keeps paying
    # staging — and the explicit cold/probe split below reports it
    # per-query.
    staged_names = {
        n for n, fn in qs.items() if "_stage_dir" in inspect.getsource(fn)
    }
    loop_stage_root = f"/tmp/spark_graft_stage_bench_loop_{os.getpid()}"
    os.environ["SPARK_GRAFT_STAGE_ROOT"] = loop_stage_root
    os.environ["SPARK_GRAFT_STAGE_REUSE"] = "1"
    first_runs: dict[str, float] = {}
    spreads: dict[str, float] = {}
    # In-loop host probes (r10, r9 verdict #2): the driver-run artifact
    # came in ~12% hotter than the local run with BOTH runs' pre/post
    # probes idle-green — contention (and Python-worker churn: the
    # driver tail showed pyspark daemon BrokenPipeError reforks) built
    # up DURING the ~5-minute loop where the boundary probes can't see
    # it. Every 25 queries the loop times one pinned JVM probe (scan+agg,
    # no Python — tracks CPU/page-cache pressure) and one Python-edge
    # probe (trivial pandas_udf sum — additionally tracks Arrow
    # round-trip + worker fork health). `value_normalized_sec` divides
    # the headline total by the in-loop JVM inflation so driver-vs-local
    # artifacts reconcile on one number.
    probe_df = _probe_df(spark, data_dir)
    py_probe_df = spark.range(200_000, numPartitions=32).select(
        F.sum(_warm("id"))
    )
    inloop_jvm: list[float] = []
    inloop_py: list[float] = []
    for qi, (name, fn) in enumerate(qs.items()):
        if qi % 25 == 0:
            t0 = time.perf_counter()
            probe_df.write.format("noop").mode("overwrite").save()
            inloop_jvm.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            py_probe_df.write.format("noop").mode("overwrite").save()
            inloop_py.append(time.perf_counter() - t0)
        samples = []
        n_runs = 4 if name in staged_names else 3
        for i in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, data_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        first_runs[name] = samples[0]
        samples = samples[1:] if name in staged_names else samples
        timings[name] = round(sorted(samples)[1], 4)  # median of 3
        spreads[name] = round(max(samples) - min(samples), 4)
    total = round(sum(timings.values()), 4)
    wall_once = round(sum(first_runs.values()), 4)
    os.environ.pop("SPARK_GRAFT_STAGE_ROOT", None)
    os.environ.pop("SPARK_GRAFT_STAGE_REUSE", None)
    shutil.rmtree(loop_stage_root, ignore_errors=True)

    # Staged-family decomposition, measured explicitly against a fresh
    # COLD run-unique staging root: pass 1 with reuse ON pays the staging
    # writes (cold = stage+probe), pass 2 finds the artifacts present and
    # is pure probe cost.
    cold_root = f"/tmp/spark_graft_stage_bench_{os.getpid()}"
    os.environ["SPARK_GRAFT_STAGE_ROOT"] = cold_root
    os.environ["SPARK_GRAFT_STAGE_REUSE"] = "1"
    staged_cold: dict[str, float] = {}
    staged_probe: dict[str, float] = {}
    try:
        for n in staged_names:
            t0 = time.perf_counter()
            qs[n](spark, data_dir).write.format("noop").mode("overwrite").save()
            staged_cold[n] = round(time.perf_counter() - t0, 4)
            t0 = time.perf_counter()
            qs[n](spark, data_dir).write.format("noop").mode("overwrite").save()
            staged_probe[n] = round(time.perf_counter() - t0, 4)
    finally:
        os.environ.pop("SPARK_GRAFT_STAGE_ROOT", None)
        os.environ.pop("SPARK_GRAFT_STAGE_REUSE", None)
        shutil.rmtree(cold_root, ignore_errors=True)

    # best-of-2 for the same reason as the query loop: a GC pause in the
    # single shared JVM otherwise lands on one measurement unpredictably
    throughput = {
        "extract": max(
            (_extract_throughput(spark, data_dir) for _ in range(2)),
            key=lambda r: r["records_per_sec"],
        ),
        "sink_http": max(
            (_sink_throughput(spark, data_dir) for _ in range(2)),
            key=lambda r: r["records_per_sec"],
        ),
    }

    calibration = _calibration(spark, data_dir)

    full = {
        "metric": "total_query_runtime",
        # host-speed normalizer: pinned scan+agg probe, stable across
        # rounds by contract — divide per-query deltas by the
        # calibration ratio before reading them as regressions
        "calibration": calibration,
        # pre-loop probe + contention verdict (r8): when `contended`
        # is true every median in this artifact is inflated ~by
        # `contention_inflation` and must not be read as a regression
        "calibration_preloop": pre_cal,
        "contended": contended,
        "contention_inflation": inflation,
        # in-loop probes (r10): host state DURING the timed loop —
        # the pre/post boundary probes missed mid-loop contention twice
        "calibration_inloop": {
            "n_probes": len(inloop_jvm),
            "jvm_median_sec": _inloop_median(inloop_jvm),
            "jvm_max_sec": round(max(inloop_jvm), 4),
            "py_median_sec": _inloop_median(inloop_py),
            "py_max_sec": round(max(inloop_py), 4),
        },
        # headline total divided by in-loop JVM inflation vs the pinned
        # idle reference — same plan, same noop-write action on both
        # sides (see PINNED_IDLE_PROBE_SEC) — the number to compare
        # across harnesses/hosts; the FIRST in-loop sample is discarded
        # (it fires at loop start where residual warm-up/fork churn can
        # still be draining, and 13 samples median as well as 14)
        "value_normalized_sec": round(
            total
            * PINNED_IDLE_PROBE_SEC
            / max(_inloop_median(inloop_jvm), 1e-9),
            2,
        ),
        # steady-state: sum of per-query median-of-3 after warm-up,
        # over ALL registry queries
        "value": total,
        "unit": "sec",
        "queries": timings,
        # per-query max-min over the three timed runs: a round-over-round
        # delta smaller than the query's own spread is noise, not a
        # regression (README 3b: cross-session host drift is +-40%)
        "query_spread": spreads,
        "per_query_stat": "median_of_3",
        "sf": sf,
        # honest single-pass figure: sum of each query's FIRST timed run
        # (for staged queries that first run is the COLD one — it pays
        # the staging writes the probes reuse)
        "wall_clock_once_sec": wall_once,
        # wall_clock_once_sec minus the sum-of-medians, decomposed so
        # the two headline totals reconcile (r8 verdict #8: the ~100 s
        # gap is per-query first-run cost — cold staging writes plus
        # first-execution planning/codegen for plan shapes the warm-up
        # pass at sf0.001 did not fully cover — not hidden data work):
        "first_run_overhead": {
            "total_sec": round(wall_once - total, 2),
            "staged_cold_sec": round(
                sum(first_runs[n] - timings[n] for n in staged_names
                    if n in timings), 2),
            "unstaged_first_run_sec": round(
                sum(first_runs[n] - timings[n] for n in first_runs
                    if n not in staged_names), 2),
        },
        # stage-once/probe-many decomposition against a COLD run-unique
        # staging root: `cold` includes the staging writes (shared
        # artifacts are paid by the first query of a family), `probe`
        # reuses them — the production serving cost. Aggregate staging
        # cost = sum(cold) - sum(probe).
        "staged": {"cold": staged_cold, "probe": staged_probe},
        # BASELINE.md parity: reference ~12,000 extract rec/s (single
        # cursor) and ~2,500 sink rec/s (per async connection)
        "throughput": throughput,
    }
    # Full artifact (all 122 queries + spreads + staged split) goes to a
    # repo file; the driver's recorded stdout keeps only a ~2,000-char
    # tail, which truncated the full line every round (BENCH_r*
    # `parsed: null`). The printed line therefore carries the totals,
    # throughputs, and a STABLE headline-query subset — guaranteed to fit
    # the tail — and points at the full file.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_full.json")
    with open(full_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)

    headline = [
        "q1_pricing_summary", "q3_shipping_priority", "q9_product_profit",
        "q18_large_orders", "q21_sole_late_supplier",
        "sync_incremental_semijoin", "payload_reshape", "session_stats",
        "windowed_anomalies",
        "exact_dedup_docs", "minhash_neardup", "simhash_neardup",
        "word_jaccard_pairs", "incremental_neardup", "dedup_clusters",
        "cluster_split", "embedding_neardup", "embedding_neardup_bucketed",
        "bucketed_neardup_recall", "semantic_dedup",
        "embedding_topk", "embedding_ann_lsh", "embedding_ann_ivf",
        "embedding_ann_ivf_persisted", "embedding_ann_recall",
        "embedding_ann_pq", "embedding_ann_ivfpq",
        "bpe_merge_pairs", "bpe_token_counts", "tfidf_top_terms",
        "distinctive_terms", "text_analysis", "media_decode_stats",
        "quality_classifier_scores",
    ]
    line = dict(full)
    line["queries"] = {n: timings[n] for n in headline if n in timings}
    line["queries_total_count"] = len(timings)
    line["queries_shown"] = "headline_subset"
    line["full_artifact"] = "BENCH_full.json"
    del line["query_spread"]
    del line["staged"]
    out = json.dumps(line)
    # driver records only a ~2,000-char stdout tail: shed headline
    # entries (never crash) until the line is guaranteed to fit
    while len(out) >= 1900 and line["queries"]:
        line["queries"].popitem()
        line["queries_shown"] = "headline_subset_trimmed"
        out = json.dumps(line)
    print(out)


if __name__ == "__main__":
    main()
