"""HTTP sink: batching, rate limiting, retry/giveup, quarantine routing —
driven end-to-end against an in-process mock of the metadata API."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from redshift_to_pendo_api_data_pipeline_spark.sink.batching import (
    GiveUpError,
    TokenBucket,
    batch_records,
    retry_with_backoff,
)
from redshift_to_pendo_api_data_pipeline_spark.sink.http_sink import (
    SinkConfig,
    route_endpoint,
    sink_dataframe,
)


# ---------------------------------------------------------------- batching
def test_batch_record_cap():
    recs = [b"x" * 10] * 25
    batches = list(batch_records(recs, max_records=10, max_bytes=10**9))
    assert [len(b) for b in batches] == [10, 10, 5]


def test_batch_byte_cap():
    recs = [b"x" * 400] * 6
    batches = list(batch_records(recs, max_records=100, max_bytes=1000))
    assert [len(b) for b in batches] == [2, 2, 2]


def test_oversized_record_ships_alone():
    batches = list(batch_records([b"x" * 5000, b"y"], max_records=10, max_bytes=1000))
    assert [len(b) for b in batches] == [1, 1]


def test_token_bucket_paces():
    import time

    tb = TokenBucket(calls=5, period=0.5)  # 10/sec refill
    for _ in range(5):
        assert tb.acquire()
    t0 = time.monotonic()
    assert tb.acquire()  # must wait ~0.1s for a token
    assert time.monotonic() - t0 > 0.05


def test_retry_backoff_and_giveup():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("boom")
        return "ok"

    assert retry_with_backoff(flaky, max_tries=5, sleep=lambda s: None) == "ok"
    assert len(calls) == 3

    def fatal():
        raise GiveUpError("HTTP 400")

    with pytest.raises(GiveUpError):
        retry_with_backoff(fatal, max_tries=5, sleep=lambda s: None)

    def always():
        raise RuntimeError("down")

    with pytest.raises(RuntimeError):
        retry_with_backoff(always, max_tries=2, sleep=lambda s: None)


def test_endpoint_routing():
    assert route_endpoint("pendo_integration_account", "http://h") == \
        "http://h/api/v1/metadata/account/custom/value"
    assert route_endpoint("pendo_integration_visitor", "http://h") == \
        "http://h/api/v1/metadata/visitor/custom/value"


# ------------------------------------------------------------- mock server
class _MockAPI(BaseHTTPRequestHandler):
    """Accepts metadata batches; rejects records whose id is in
    fail_ids (per-record errors, like the real API's error.list);
    returns 500 for the first `flaky_500s` requests."""

    store: list[list[dict]] = []
    fail_ids: set = set()
    flaky_500s: int = 0
    lock = threading.Lock()

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers["content-length"]))
        if not self.path.startswith("/api/v1/metadata/"):
            self.send_response(404)
            self.end_headers()
            return
        with _MockAPI.lock:
            if _MockAPI.flaky_500s > 0:
                _MockAPI.flaky_500s -= 1
                self.send_response(500)
                self.end_headers()
                return
            recs = json.loads(body)
            _MockAPI.store.append(recs)
        errors = [{"id": r["id"]} for r in recs if r["id"] in _MockAPI.fail_ids]
        out = {
            "total": len(recs),
            "updated": len(recs) - len(errors),
            "failed": len(errors),
            "errors": errors,
        }
        data = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("content-type", "application/json")
        self.send_header("content-length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def mock_api():
    _MockAPI.store = []
    _MockAPI.fail_ids = set()
    _MockAPI.flaky_500s = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _MockAPI)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", _MockAPI
    srv.shutdown()


# ------------------------------------------------------------- end-to-end
def test_sink_end_to_end(spark, sf_dir, mock_api):
    base_url, api = mock_api
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").limit(40)
    shaped = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
    ).repartition(2)

    cfg = SinkConfig(base_url=base_url, stream_name="account_stream", max_records=10)
    results = sink_dataframe(shaped, cfg)
    agg = results.agg(
        F.sum("total").alias("total"),
        F.sum("updated").alias("updated"),
        F.sum("failed").alias("failed"),
    ).first()

    assert agg["total"] == 40 and agg["updated"] == 40 and agg["failed"] == 0
    sent_ids = {r["id"] for batch in api.store for r in batch}
    assert len(sent_ids) == 40
    assert all(len(b) <= 10 for b in api.store)


def test_sink_quarantine_and_retry_pass(spark, sf_dir, mock_api):
    """B7: per-record failures land in the quarantine set; a second pass
    re-posts exactly those records (finish_requests retry pass,
    __init__.py:217-259)."""
    base_url, api = mock_api
    api.fail_ids = {1, 5}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").limit(20)
    shaped = cust.select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name"))

    cfg = SinkConfig(base_url=base_url, stream_name="visitors", max_records=10)
    results = sink_dataframe(shaped, cfg).cache()
    quarantined = [
        json.loads(p)
        for row in results.select("failed_payloads").collect()
        for p in row["failed_payloads"]
    ]
    assert {q["id"] for q in quarantined} == {1, 5}

    # retry pass: server now healthy
    api.fail_ids = set()
    retry_df = spark.createDataFrame(quarantined)
    r2 = sink_dataframe(retry_df, cfg).agg(F.sum("failed").alias("f")).first()
    assert r2["f"] == 0
    results.unpersist()


def test_sink_retries_transient_500(spark, sf_dir, mock_api):
    base_url, api = mock_api
    api.flaky_500s = 2  # first two requests fail; backoff must absorb
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").limit(5)
    shaped = cust.select(F.col("c_custkey").alias("id")).coalesce(1)
    cfg = SinkConfig(base_url=base_url, stream_name="v", max_records=100)
    agg = sink_dataframe(shaped, cfg).agg(F.sum("updated").alias("u")).first()
    assert agg["u"] == 5


def test_sink_gives_up_on_4xx(spark, sf_dir, mock_api):
    base_url, api = mock_api
    cfg = SinkConfig(
        base_url=base_url + "/missing", stream_name="v", max_records=100
    )  # wrong path -> 404 -> GiveUpError, no retry storm
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").limit(3)
    shaped = cust.select(F.col("c_custkey").alias("id")).coalesce(1)
    with pytest.raises(Exception, match="HTTP 404"):
        sink_dataframe(shaped, cfg).count()


def test_rate_budget_split_across_executors():
    """rate_calls is the GLOBAL API budget; sink_dataframe splits it per
    executor via per_executor_config (a per-executor TokenBucket honoring
    the full budget would hit the API at N x the limit on an N-executor
    cluster)."""
    from redshift_to_pendo_api_data_pipeline_spark.sink.http_sink import (
        SinkConfig, per_executor_config,
    )

    cfg = SinkConfig(base_url="http://x", stream_name="visitors", rate_calls=1800)
    assert per_executor_config(cfg, 4).rate_calls == 450
    assert per_executor_config(cfg, 1).rate_calls == 1800
    assert per_executor_config(cfg, 10_000).rate_calls == 1  # never zero
    assert cfg.rate_calls == 1800  # caller's config untouched
    assert per_executor_config(cfg, 4).rate_period == cfg.rate_period


def test_executor_count_local_mode(spark):
    from redshift_to_pendo_api_data_pipeline_spark.sink.http_sink import _executor_count
    assert _executor_count(spark) == 1  # local: full budget stays
