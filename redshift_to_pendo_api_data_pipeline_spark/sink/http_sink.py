"""The HTTP partition writer: Spark-side replacement for target-pendo.

The reference consumes a Singer message stream on stdin and POSTs batches
to ``/api/v1/metadata/{kind}/{group}/value`` with asyncio concurrency
(target-pendo/src/__init__.py:301-368). Here the equivalent is a
``foreachPartition`` writer: Spark supplies the parallelism (one task per
partition, many executors), so the writer itself stays synchronous and
simple; per-partition connection reuse replaces the shared httpx pool.

Reliability semantics preserved (SURVEY.md §2.9):
- B6 retry: expo backoff, ≤5 tries, give up on 4xx;
- B7 per-record failure routing: the API reports per-record errors in the
  response body; failed records are routed to a quarantine location and
  re-posted by a later pass instead of failing the job
  (__init__.py:272-281,217-259);
- B8 status->error taxonomy (request.py:77-109);
- idempotency: Spark retries whole tasks, so the sink relies on the API's
  upsert-only idempotency (README.md:142) — a replayed batch converges.

Endpoint routing (B9): stream name containing "account" -> account kind,
else visitor (__init__.py:40-72, endpoints.py:7-36).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from collections.abc import Iterable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from redshift_to_pendo_api_data_pipeline_spark.sink.batching import (
    DEFAULT_MAX_BYTES,
    DEFAULT_MAX_RECORDS,
    GiveUpError,
    TokenBucket,
    batch_records,
    retry_with_backoff,
)


def route_endpoint(stream_name: str, base_url: str, group: str = "custom") -> str:
    """B9: infer entity kind from the stream name (endpoints.py:7-36)."""
    kind = "account" if "account" in stream_name.lower() else "visitor"
    return f"{base_url}/api/v1/metadata/{kind}/{group}/value"


# B8 (r8, granular): the reference keeps a full application-error-code
# taxonomy — target-pendo/src/exceptions.py:74-97 maps `error.list`
# codes to exception classes and request.py:77-109 raises them from the
# parsed body. The Spark sink carries the same taxonomy as a CLASS
# STRING on each quarantine row (exception classes don't survive an
# executor boundary; a labeled row does), so a user debugging a
# specific Pendo rejection sees the same bucket the reference would
# have raised.
ERROR_CODE_CLASSES: dict[str, str] = {
    "unauthorized": "authentication",
    "forbidden": "authentication",
    "bad_request": "bad_request",
    "action_forbidden": "bad_request",
    "missing_parameter": "bad_request",
    "parameter_invalid": "bad_request",
    "parameter_not_found": "bad_request",
    "client_error": "bad_request",
    "type_mismatch": "bad_request",
    "not_found": "resource_not_found",
    "admin_not_found": "resource_not_found",
    "not_restorable": "not_restorable",
    "rate_limit_exceeded": "rate_limit",
    "service_unavailable": "service_unavailable",
    "server_error": "service_unavailable",
    "conflict": "multiple_matching_users",
    "unique_user_constraint": "multiple_matching_users",
    "token_unauthorized": "token_unauthorized",
    "token_not_found": "token_not_found",
    "token_revoked": "token_not_found",
    "token_blocked": "token_not_found",
    "token_expired": "token_not_found",
}

# HTTP-status fallback when no application code is present
# (request.py:77-91's raise_errors_on_failure table)
_HTTP_STATUS_CLASSES: dict[int, str] = {
    401: "authentication",
    403: "authentication",
    404: "resource_not_found",
    500: "server_error",
    502: "bad_gateway",
    503: "service_unavailable",
}

# classes the reference retries (RateLimitExceeded/ServiceUnavailable/
# ServerError are transient; everything else is a caller bug or a
# permanent state)
RETRYABLE_ERROR_CLASSES = {
    "rate_limit", "service_unavailable", "server_error", "bad_gateway",
    "http_5xx",
}


def classify_error(code: str | None, http_status: int | None = None) -> str:
    """Application `error.list` code -> taxonomy class; HTTP status as
    the fallback; `unexpected` when the code is unknown (the reference's
    UnexpectedError arm, request.py:98-105)."""
    if code:
        return ERROR_CODE_CLASSES.get(code, "unexpected")
    if http_status is not None:
        if http_status in _HTTP_STATUS_CLASSES:
            return _HTTP_STATUS_CLASSES[http_status]
        if 400 <= http_status < 500:
            return "http_4xx"
        if 500 <= http_status < 600:
            return "http_5xx"
    return "unexpected"


@dataclass
class SinkConfig:
    base_url: str
    stream_name: str
    api_key: str = ""
    max_records: int = DEFAULT_MAX_RECORDS
    max_bytes: int = DEFAULT_MAX_BYTES
    # rate_calls/rate_period is the GLOBAL API budget (Pendo: 1800 calls
    # per 300 s, __init__.py:308-311). TokenBuckets are per executor
    # process, so sink_dataframe divides this budget by the live executor
    # count before shipping the config to tasks — N executors each get
    # rate_calls/N. Configs used directly in post_batch/write_partition
    # (single-process paths) spend the whole budget.
    rate_calls: int = 1800
    rate_period: float = 300.0
    max_tries: int = 5
    request_delay: float = 0.0      # B10, default 0 (__init__.py:106)
    timeout: float = 300.0          # request.py:13-20
    group: str = "custom"

    @property
    def endpoint(self) -> str:
        return route_endpoint(self.stream_name, self.base_url, self.group)


@dataclass
class BatchResult:
    """Per-batch outcome; aggregated like the reference's Counter merge
    (__init__.py:159,192-195)."""
    total: int = 0
    updated: int = 0
    failed: int = 0
    failed_payloads: list[bytes] = field(default_factory=list)
    # aligned with failed_payloads: the application error code (or "")
    # and its taxonomy class (ERROR_CODE_CLASSES / classify_error)
    failed_codes: list[str] = field(default_factory=list)
    failed_classes: list[str] = field(default_factory=list)


# One bucket per (calls, period) per executor process — all partition tasks
# running in that executor share it.
_BUCKETS: dict[tuple[int, float], TokenBucket] = {}


def _bucket(calls: int, period: float) -> TokenBucket:
    key = (calls, period)
    if key not in _BUCKETS:
        _BUCKETS[key] = TokenBucket(calls, period)
    return _BUCKETS[key]


def _executor_count(spark) -> int:
    """Live executor count (excluding the driver entry when executors
    exist). In local mode there is exactly one executor process, so the
    full rate budget applies. spark.executor.instances wins when set — a
    static pin is the reliable number under dynamic allocation."""
    pinned = spark.conf.get("spark.executor.instances", None)
    if pinned:
        return max(int(pinned), 1)
    status = spark.sparkContext._jsc.sc().getExecutorMemoryStatus()
    # local mode: one entry (the driver IS the executor); cluster: driver
    # + N executors
    return max(status.size() - 1, 1)


def per_executor_config(cfg: SinkConfig, n_exec: int) -> SinkConfig:
    """Split the global rate budget: each of n_exec executors gets
    rate_calls // n_exec (min 1). Every other field passes through; the
    caller's config is never mutated."""
    from dataclasses import replace

    return replace(cfg, rate_calls=max(1, cfg.rate_calls // max(n_exec, 1)))


def post_batch(cfg: SinkConfig, batch: list[bytes]) -> BatchResult:
    """POST one JSON-array batch; classify per-record failures from the
    response body (the API returns {total, updated, failed, errors:[{id}]}
    — __init__.py:272-281 routes errors back to records)."""
    body = b"[" + b",".join(batch) + b"]"
    req = urllib.request.Request(
        cfg.endpoint,
        data=body,
        headers={
            "content-type": "application/json",
            "x-pendo-integration-key": cfg.api_key,
        },
        method="POST",
    )

    def _do():
        import time as _t
        _bucket(cfg.rate_calls, cfg.rate_period).acquire()
        if cfg.request_delay:
            _t.sleep(cfg.request_delay)
        try:
            with urllib.request.urlopen(req, timeout=cfg.timeout) as resp:
                return json.loads(resp.read() or b"{}")
        except urllib.error.HTTPError as e:
            # B8 (granular, r8): an error body of type `error.list`
            # carries the application code the reference's
            # raise_application_errors_on_failure maps
            # (request.py:92-109). Codes in a retryable class keep
            # retrying with backoff; the rest give up with the class
            # named, not just the bare status.
            err_code = None
            try:
                body_ = json.loads(e.read() or b"{}")
                if body_.get("type") == "error.list" and body_.get("errors"):
                    d = body_["errors"][0]
                    # reference reads .type then .code
                    # (request.py:94-96); code wins when both present
                    err_code = d.get("code") or d.get("type")
            except (ValueError, AttributeError):
                pass
            klass = classify_error(err_code, e.code)
            if klass in RETRYABLE_ERROR_CLASSES:
                raise  # B6 path: backoff + retry
            raise GiveUpError(
                f"HTTP {e.code} [{klass}"
                + (f"/{err_code}" if err_code else "")
                + f"] at {cfg.endpoint}"
            ) from e

    payload = retry_with_backoff(_do, max_tries=cfg.max_tries)
    res = BatchResult(
        total=int(payload.get("total", len(batch))),
        updated=int(payload.get("updated", 0)),
        failed=int(payload.get("failed", 0)),
    )
    if res.failed:
        # J4: join error ids back to the records of this batch; carry
        # each error's application code + taxonomy class alongside so
        # the quarantine relation is debuggable per Pendo rejection
        errors_by_id = {
            e.get("id"): (e.get("code") or e.get("type") or "")
            for e in payload.get("errors", [])
        }
        for raw in batch:
            rec_id = json.loads(raw).get("id")
            if rec_id in errors_by_id:
                code = errors_by_id[rec_id]
                res.failed_payloads.append(raw)
                res.failed_codes.append(code)
                res.failed_classes.append(classify_error(code or None))
    return res


def write_partition(cfg: SinkConfig, payloads: Iterable[bytes]) -> Iterator[tuple]:
    """The foreachPartition body. Yields one row per batch:
    (total, updated, failed, failed_json_array, failed_codes,
    failed_classes) so failures land in a quarantine DataFrame —
    labeled with the application error code and its taxonomy class —
    instead of killing the job."""
    for batch in batch_records(payloads, cfg.max_records, cfg.max_bytes):
        r = post_batch(cfg, batch)
        yield (
            r.total,
            r.updated,
            r.failed,
            [p.decode() for p in r.failed_payloads],
            list(r.failed_codes),
            list(r.failed_classes),
        )


def sink_dataframe(df: DataFrame, cfg: SinkConfig) -> DataFrame:
    """Write a shaped DataFrame (any schema; serialized to one JSON doc per
    row here) to the HTTP endpoint. Returns the per-batch results as a
    DataFrame ``(total, updated, failed, failed_payloads)`` — the caller
    aggregates (A4) and persists the quarantine set (B7).

    Distribution: each partition runs an independent writer with its own
    HTTP connection; concurrency = numPartitions, the Spark-native
    replacement for asyncio.gather+Semaphore(10) (__init__.py:351-368).

    The global rate budget is split across executors here (the TokenBucket
    is per executor process — N executors each honoring the full 1800/300s
    would hit the API at N x the limit). The executor count is sampled at
    plan-build time; with dynamic allocation scaling OUT afterwards the
    aggregate can exceed the budget — pin spark.executor.instances (or
    spark.dynamicAllocation.maxExecutors) for a hard guarantee.
    """
    per_exec_cfg = per_executor_config(cfg, _executor_count(df.sparkSession))
    json_df = df.select(F.to_json(F.struct(*df.columns)).alias("payload"))

    def _run(it: Iterator) -> Iterator[tuple]:
        yield from write_partition(
            per_exec_cfg, (row["payload"].encode() for row in it)
        )

    return json_df.rdd.mapPartitions(_run).toDF(
        "total long, updated long, failed long,"
        " failed_payloads array<string>, failed_codes array<string>,"
        " failed_classes array<string>"
    )
