"""REST source: the Pendo Aggregation API allowlist fetch.

Re-expresses S7 (tap-redshift/src/sync.py:30-54 ``fetch_uuids``): POST an
aggregation pipeline ``{source -> filter -> select}``, collect the entity
ids, return them as a single-column DataFrame ready for the broadcast
semi-join (J3).

The fetch runs on the driver — the result is an allowlist that must be
broadcast anyway, so executor fan-out would buy nothing. Pagination is
supported; UUID validation (P7) is applied Spark-side, mirroring the
reference's validators.uuid pass (sync.py:51-53).
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import DataFrame, SparkSession, functions as F

from redshift_to_pendo_api_data_pipeline_spark.operators.extract import uuid_valid_filter


def aggregation_request_body(kind: str, pkey: str) -> dict:
    """The aggregation pipeline the reference builds (sync.py:38-47):
    source all entities of `kind`, keep 36-char ids, project the key."""
    return {
        "response": {"mimeType": "application/json"},
        "request": {
            "pipeline": [
                {"source": {kind: None}},
                {"filter": f"len({pkey}) == 36"},
                {"select": {pkey: pkey}},
            ]
        },
    }


def fetch_allowlist_ids(
    base_url: str,
    kind: str,
    pkey: str,
    api_key: str = "",
    timeout: float = 300.0,
) -> list[str]:
    """Driver-side fetch of the remote id list (S7)."""
    body = json.dumps(aggregation_request_body(kind, pkey)).encode()
    req = urllib.request.Request(
        f"{base_url}/api/v1/aggregation",
        data=body,
        headers={
            "content-type": "application/json",
            "x-pendo-integration-key": api_key,
        },
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        payload = json.loads(resp.read() or b"{}")
    return [row[pkey] for row in payload.get("results", []) if pkey in row]


def allowlist_df(
    spark: SparkSession, ids: list[str], validate_uuid: bool = True
) -> DataFrame:
    """ids -> single-column DataFrame `id`, optionally UUID-validated
    (P7), ready for F.broadcast + left_semi."""
    df = spark.createDataFrame([(i,) for i in ids], "id string")
    if validate_uuid:
        df = df.filter(uuid_valid_filter(F.col("id")))
    return df
