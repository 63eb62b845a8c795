"""REST source: the Pendo Aggregation API allowlist fetch.

Re-expresses S7 (tap-redshift/src/sync.py:30-54 ``fetch_uuids``): POST an
aggregation pipeline ``{source -> filter -> select}``, collect the entity
ids, return them as a single-column DataFrame ready for the broadcast
semi-join (J3).

The fetch runs on the driver — the result is an allowlist that must be
broadcast anyway, so executor fan-out would buy nothing. Pagination is
offset/limit over the aggregation pipeline (``skip``/``limit`` stages),
looping until a short page; the reference does a single unpaged POST
(sync.py:30-54), so ``page_size=None`` keeps exact parity. UUID
validation (P7) is applied Spark-side, mirroring the reference's
validators.uuid pass (sync.py:51-53).
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import DataFrame, SparkSession, functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.extract import uuid_valid_filter


def aggregation_request_body(
    kind: str, pkey: str, skip: int | None = None, limit: int | None = None
) -> dict:
    """The aggregation pipeline the reference builds (sync.py:38-47):
    source all entities of `kind`, keep 36-char ids, project the key.
    When paging, ``skip``/``limit`` stages are appended after the select
    so the offsets index the projected id stream."""
    pipeline: list[dict] = [
        {"source": {kind: None}},
        {"filter": f"len({pkey}) == 36"},
        {"select": {pkey: pkey}},
    ]
    if skip:
        pipeline.append({"skip": skip})
    if limit is not None:
        pipeline.append({"limit": limit})
    return {
        "response": {"mimeType": "application/json"},
        "request": {"pipeline": pipeline},
    }


def _post_aggregation(
    base_url: str, body: dict, api_key: str, timeout: float
) -> list[dict]:
    data = json.dumps(body).encode()
    req = urllib.request.Request(
        f"{base_url}/api/v1/aggregation",
        data=data,
        headers={
            "content-type": "application/json",
            "x-pendo-integration-key": api_key,
        },
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        payload = json.loads(resp.read() or b"{}")
    return payload.get("results", [])


def fetch_allowlist_ids(
    base_url: str,
    kind: str,
    pkey: str,
    api_key: str = "",
    timeout: float = 300.0,
    page_size: int | None = None,
    max_pages: int = 10_000,
) -> list[str]:
    """Driver-side fetch of the remote id list (S7).

    ``page_size=None`` issues the reference's single unpaged POST.
    Otherwise pages with skip/limit until a short (or empty) page;
    ``max_pages`` bounds a server that keeps echoing full pages."""
    if page_size is None:
        results = _post_aggregation(
            base_url, aggregation_request_body(kind, pkey), api_key, timeout
        )
        return [row[pkey] for row in results if pkey in row]

    ids: list[str] = []
    for page in range(max_pages):
        results = _post_aggregation(
            base_url,
            aggregation_request_body(
                kind, pkey, skip=page * page_size, limit=page_size
            ),
            api_key,
            timeout,
        )
        ids.extend(row[pkey] for row in results if pkey in row)
        if len(results) < page_size:
            break
    return ids


def allowlist_df(
    spark: SparkSession, ids: list[str], validate_uuid: bool = True
) -> DataFrame:
    """ids -> single-column DataFrame `id`, optionally UUID-validated
    (P7), ready for F.broadcast + left_semi."""
    df = spark.createDataFrame([(i,) for i in ids], "id string")
    if validate_uuid:
        df = df.filter(uuid_valid_filter(F.col("id")))
    return df
