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
    fail_codes: dict = {}        # id -> application error code
    flaky_500s: int = 0
    # (status, code, n): answer the first n requests with an HTTP
    # `status` whose body is a Pendo error.list carrying `code`
    error_list_replies: tuple = ()
    lock = threading.Lock()

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers["content-length"]))
        if not self.path.startswith("/api/v1/metadata/"):
            self.send_response(404)
            self.end_headers()
            return
        with _MockAPI.lock:
            if _MockAPI.error_list_replies:
                status, code, n = _MockAPI.error_list_replies
                if n > 0:
                    _MockAPI.error_list_replies = (status, code, n - 1)
                    data = json.dumps({
                        "type": "error.list",
                        "errors": [{"code": code, "message": "mock"}],
                    }).encode()
                    self.send_response(status)
                    self.send_header("content-type", "application/json")
                    self.send_header("content-length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                    return
            if _MockAPI.flaky_500s > 0:
                _MockAPI.flaky_500s -= 1
                self.send_response(500)
                self.end_headers()
                return
            recs = json.loads(body)
            _MockAPI.store.append(recs)
        errors = [
            {"id": r["id"], **(
                {"code": _MockAPI.fail_codes[r["id"]]}
                if r["id"] in _MockAPI.fail_codes else {}
            )}
            for r in recs if r["id"] in _MockAPI.fail_ids
        ]
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
    _MockAPI.fail_codes = {}
    _MockAPI.flaky_500s = 0
    _MockAPI.error_list_replies = ()
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


def test_quarantine_rows_carry_error_code_taxonomy(spark, sf_dir, mock_api):
    """B8 granular (r8, r7 verdict #9): per-record rejections carry
    the application error code AND its taxonomy class (the bucket the
    reference's exceptions.py:74-97 would have raised) on the
    quarantine row, aligned with failed_payloads."""
    base_url, api = mock_api
    api.fail_ids = {1, 5, 7}
    api.fail_codes = {
        1: "parameter_invalid",      # -> bad_request
        5: "unique_user_constraint", # -> multiple_matching_users
        # id 7 rejected WITHOUT a code -> "" / unexpected
    }
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").limit(20)
    shaped = cust.select(
        F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
    )
    cfg = SinkConfig(base_url=base_url, stream_name="visitors", max_records=10)
    rows = sink_dataframe(shaped, cfg).collect()
    got = {}
    for r in rows:
        for p, c, k in zip(
            r["failed_payloads"], r["failed_codes"], r["failed_classes"]
        ):
            got[json.loads(p)["id"]] = (c, k)
    assert got == {
        1: ("parameter_invalid", "bad_request"),
        5: ("unique_user_constraint", "multiple_matching_users"),
        7: ("", "unexpected"),
    }


def test_error_list_code_controls_retry_vs_giveup(spark, sf_dir, mock_api):
    """A whole-request error.list body drives the retry decision by
    CODE class, not bare status: rate_limit_exceeded on 429 retries
    through (reference RateLimitExceeded is transient), while
    parameter_invalid on 400 gives up naming the class."""
    base_url, api = mock_api
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").limit(3)
    shaped = cust.select(F.col("c_custkey").alias("id")).coalesce(1)
    cfg = SinkConfig(base_url=base_url, stream_name="v", max_records=100)

    api.error_list_replies = (429, "rate_limit_exceeded", 2)
    agg = sink_dataframe(shaped, cfg).agg(F.sum("updated").alias("u")).first()
    assert agg["u"] == 3    # two rate-limited replies absorbed by retry

    api.error_list_replies = (400, "parameter_invalid", 10**6)
    with pytest.raises(Exception, match="bad_request/parameter_invalid"):
        sink_dataframe(shaped, cfg).count()


def test_classify_error_mapping():
    from redshift_to_pendo_api_data_pipeline_spark.sink.http_sink import (
        classify_error,
    )

    # application codes (exceptions.py:74-97 parity)
    assert classify_error("unauthorized") == "authentication"
    assert classify_error("token_expired") == "token_not_found"
    assert classify_error("server_error") == "service_unavailable"
    assert classify_error("no_such_code") == "unexpected"
    # HTTP fallbacks (request.py:77-91 parity)
    assert classify_error(None, 404) == "resource_not_found"
    assert classify_error(None, 403) == "authentication"
    assert classify_error(None, 502) == "bad_gateway"
    assert classify_error(None, 418) == "http_4xx"
    assert classify_error(None, 599) == "http_5xx"
    assert classify_error(None, None) == "unexpected"


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
