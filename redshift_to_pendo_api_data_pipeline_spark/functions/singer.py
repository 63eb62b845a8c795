"""Singer message-stream interop: the wire format at the engine's edges.

Inside the engine the tap->target pipe does not exist (one DataFrame plan,
SURVEY.md §3.2); this module preserves the *wire* compatibility so a user
of the reference can keep their downstream Singer tooling:

- writer (S8, tap sync.py:57-72 + messages.py:35-173): serialize a synced
  DataFrame as ordered message lines — STATE, SCHEMA, ACTIVATE_VERSION,
  VOLUME, RECORD... — with RECORD envelopes built as one to_json column
  expression (no Python in the row path).
- reader (S9, target __init__.py:421-435): parse a message file, dispatch
  on type (P9), reconstruct a typed DataFrame from the RECORD payloads.
- validation (P10, target __init__.py:482-523): stream/version invariants
  and schema conformance; violations are split into a quarantine
  DataFrame rather than raising mid-stream.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"


# ----------------------------------------------------------------- writer

def _json_schema_for(dt: T.DataType, nullable: bool) -> dict:
    """StructType -> JSON-schema property (inverse of the tap's
    schema_for_column, tap-redshift/src/schema.py:38-83 — including the
    nullability-as-type-union convention)."""
    if isinstance(dt, T.BooleanType):
        js: dict = {"type": "boolean"}
    elif isinstance(dt, (T.ShortType, T.IntegerType, T.LongType)):
        bits = {T.ShortType: 16, T.IntegerType: 32, T.LongType: 64}[type(dt)]
        js = {
            "type": "integer",
            "minimum": -(2 ** (bits - 1)),
            "maximum": 2 ** (bits - 1) - 1,
        }
    elif isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        js = {"type": "number"}
    elif isinstance(dt, T.TimestampType):
        js = {"type": "string", "format": "date-time"}
    elif isinstance(dt, T.DateType):
        js = {"type": "string", "format": "date"}
    else:
        js = {"type": "string"}
    if nullable:
        js["type"] = ["null", js["type"]]
    return js


def schema_message(stream: str, schema: T.StructType, key_properties: list[str]) -> str:
    """SCHEMA line (messages.py:77-119)."""
    return json.dumps(
        {
            "type": "SCHEMA",
            "stream": stream,
            "schema": {
                "type": "object",
                "properties": {
                    f.name: _json_schema_for(f.dataType, f.nullable)
                    for f in schema.fields
                },
            },
            "key_properties": key_properties,
        }
    )


def state_message(state_dict: dict) -> str:
    """STATE line (messages.py:122-136)."""
    return json.dumps({"type": "STATE", "value": state_dict})


def activate_version_message(stream: str, version: int) -> str:
    """ACTIVATE_VERSION line (messages.py:152-173): 'drop rows not of this
    version' — overwrite-swap semantics."""
    return json.dumps({"type": "ACTIVATE_VERSION", "stream": stream, "version": version})


def volume_message(stream: str, count: int) -> str:
    """VOLUME line (pre-sync COUNT for batch planning)."""
    return json.dumps({"type": "VOLUME", "stream": stream, "volume": count})


def record_lines(df: DataFrame, stream: str, version: int) -> DataFrame:
    """Every row as one RECORD JSON line — a single to_json expression, so
    serialization stays in codegen (the reference does row_to_record in
    Python per row, messages.py:346-358). Timestamps are ISO-8601'd by the
    JSON writer; time_extracted is stamped once per batch."""
    return df.select(
        F.to_json(
            F.struct(
                F.lit("RECORD").alias("type"),
                F.lit(stream).alias("stream"),
                F.lit(version).alias("version"),
                F.struct(*[F.col(f"`{c}`") for c in df.columns]).alias("record"),
                F.date_format(F.current_timestamp(), ISO_FMT).alias("time_extracted"),
            )
        ).alias("line")
    )


def write_message_file(
    df: DataFrame,
    stream: str,
    version: int,
    key_properties: list[str],
    state_dict: dict,
    path: str,
) -> int:
    """Full ordered message stream for one table sync: STATE, SCHEMA,
    ACTIVATE_VERSION, VOLUME, RECORD..., STATE — the exact sequence the
    tap emits (messages.py:313-343). Control lines are driver-side
    strings; record lines stream from executors. Returns record count."""
    spark = df.sparkSession
    n = df.count()
    header = [
        state_message(state_dict),
        schema_message(stream, df.schema, key_properties),
        activate_version_message(stream, version),
        volume_message(stream, n),
    ]
    header_df = spark.createDataFrame(
        [(i, line) for i, line in enumerate(header)], "seq long, line string"
    )
    footer_df = spark.createDataFrame(
        [(2**62, state_message(state_dict))], "seq long, line string"
    )
    records = record_lines(df, stream, version).select(
        (F.lit(100) + F.monotonically_increasing_id()).alias("seq"), "line"
    )
    # a message FILE is an ordered stream (STATE, SCHEMA, ACTIVATE_VERSION,
    # VOLUME, RECORD..., STATE) — order is enforced with an explicit seq
    # key + single-partition sort, paid only at this interop edge; the
    # in-plan engine path has no such boundary (SURVEY.md §3.2)
    header_df.unionAll(records).unionAll(footer_df) \
        .repartition(1).sortWithinPartitions("seq").select("line") \
        .write.mode("overwrite").text(path)
    return n


# ----------------------------------------------------------------- reader

_ENVELOPE = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("stream", T.StringType()),
        T.StructField("version", T.LongType()),
        T.StructField("record", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("volume", T.LongType()),
        T.StructField("key_properties", T.ArrayType(T.StringType())),
    ]
)


def read_messages(spark: SparkSession, path: str) -> DataFrame:
    """S9: parse message lines into the envelope relation; nested payloads
    stay as JSON strings until a stream schema resolves them."""
    raw = spark.read.text(path)
    opts = {"primitivesAsString": "false"}
    return raw.select(
        F.from_json(
            F.col("value").alias("line"),
            _ENVELOPE,
            opts,
        ).alias("m")
    ).select("m.*")


def dispatch(messages: DataFrame) -> dict[str, DataFrame]:
    """P9: split by message type (target __init__.py:437-621's switch)."""
    return {
        t: messages.filter(F.col("type") == t)
        for t in ("RECORD", "SCHEMA", "STATE", "VOLUME", "ACTIVATE_VERSION")
    }


def records_for_stream(
    messages: DataFrame,
    stream: str,
    record_schema: T.StructType,
    expected_version: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """P10: RECORD payloads for one stream, validated.

    Returns (valid, quarantine):
    - valid: typed rows whose version matches and whose required
      (non-nullable) fields are present — the Draft4-validation analogue
      (__init__.py:523,617);
    - quarantine: rows failing version or schema checks, kept as raw JSON
      for inspection instead of raising mid-stream (__init__.py:482-520
      raises; a distributed engine routes).
    """
    recs = messages.filter(
        (F.col("type") == "RECORD") & (F.col("stream") == stream)
    )
    if expected_version is not None:
        version_ok = F.col("version") == expected_version
    else:
        version_ok = F.lit(True)
    parsed = recs.withColumn(
        "rec", F.from_json(F.col("record"), record_schema)
    ).withColumn("__version_ok", version_ok)

    required = [f.name for f in record_schema.fields if not f.nullable]
    schema_ok = F.lit(True)
    # a row is schema-valid if parsing succeeded and required fields are set
    schema_ok = schema_ok & F.col("rec").isNotNull()
    for r in required:
        schema_ok = schema_ok & F.col(f"rec.{r}").isNotNull()

    valid = parsed.filter(F.col("__version_ok") & schema_ok).select("rec.*")
    quarantine = parsed.filter(~(F.col("__version_ok") & schema_ok)).select(
        "stream", "version", "record"
    )
    return valid, quarantine


# ----------------------------------------------------- conformance check

def validate_message_stream(lines: list[str]) -> list[str]:
    """singer-check-tap-style conformance runner: validate an ordered
    message stream and return the list of violations (empty = clean).
    The reference declares singer-check-tap in its requirements but ships
    no runner; this implements the checks that tool applies to a tap's
    stdout, so CLI output can be asserted conformant in tests.

    Checks: every line parses as JSON with a known ``type``; each
    stream's SCHEMA precedes its first RECORD; each RECORD's fields are a
    subset of the SCHEMA's properties with JSON types matching the
    declared (possibly null-union) types; key_properties are present and
    non-null in every RECORD; RECORD versions match the announced
    ACTIVATE_VERSION; the stream ends with a STATE flush."""
    import json as _json

    violations: list[str] = []
    schemas: dict[str, dict] = {}
    keyprops: dict[str, list[str]] = {}
    versions: dict[str, int] = {}
    last_type = None

    def type_ok(value, declared) -> bool:
        types = declared if isinstance(declared, list) else [declared]
        for t in types:
            if t == "null" and value is None:
                return True
            if t == "boolean" and isinstance(value, bool):
                return True
            if t == "integer" and isinstance(value, int) and not isinstance(value, bool):
                return True
            if t == "number" and isinstance(value, (int, float)) and not isinstance(value, bool):
                return True
            if t == "string" and isinstance(value, str):
                return True
            if t == "object" and isinstance(value, dict):
                return True
            if t == "array" and isinstance(value, list):
                return True
        return False

    for i, line in enumerate(lines):
        try:
            msg = _json.loads(line)
        except ValueError:
            violations.append(f"line {i}: not JSON")
            continue
        mtype = msg.get("type")
        last_type = mtype
        if mtype == "SCHEMA":
            stream = msg.get("stream")
            if not stream or "schema" not in msg:
                violations.append(f"line {i}: SCHEMA missing stream/schema")
                continue
            schemas[stream] = msg["schema"].get("properties", {})
            keyprops[stream] = msg.get("key_properties", [])
        elif mtype == "ACTIVATE_VERSION":
            versions[msg.get("stream")] = msg.get("version")
        elif mtype == "RECORD":
            stream = msg.get("stream")
            if stream not in schemas:
                violations.append(f"line {i}: RECORD for {stream!r} before SCHEMA")
                continue
            props = schemas[stream]
            rec = msg.get("record", {})
            for k, v in rec.items():
                if k not in props:
                    violations.append(f"line {i}: field {k!r} not in SCHEMA")
                elif "type" in props[k] and not type_ok(v, props[k]["type"]):
                    violations.append(
                        f"line {i}: field {k!r}={v!r} violates type {props[k]['type']}"
                    )
            for k in keyprops.get(stream, []):
                if rec.get(k) is None:
                    violations.append(f"line {i}: key property {k!r} missing/null")
            if stream in versions and msg.get("version") != versions[stream]:
                violations.append(
                    f"line {i}: version {msg.get('version')} != activated "
                    f"{versions[stream]}"
                )
        elif mtype in ("STATE", "VOLUME"):
            pass
        else:
            violations.append(f"line {i}: unknown message type {mtype!r}")
    if lines and last_type != "STATE":
        violations.append("stream does not end with a STATE flush")
    return violations


def format_metric_line(
    kind: str, metric: str, value: int | float, tags: dict | None = None,
) -> str:
    """Singer-spec METRIC log line — the wire format the reference's
    `singer.metrics` helpers print (tap-redshift/src/sync.py:178
    wraps extraction in `metrics.record_counter`, messages.py:335 in
    `metrics.job_timer`; the library emits
    ``INFO METRIC: {"type": ..., "metric": ..., "value": ...,
    "tags": {...}}`` on stderr for harnesses to scrape). Kinds:
    ``counter`` (record_count) and ``timer`` (job durations).

    Key order and separators are pinned (sort_keys, compact commas)
    so test assertions and downstream scrapers see one stable shape.
    """
    if kind not in ("counter", "timer"):
        raise ValueError(f"unknown metric kind: {kind!r}")
    body = json.dumps(
        {"type": kind, "metric": metric, "value": value,
         "tags": tags or {}},
        sort_keys=True, separators=(", ", ": "),
    )
    return f"INFO METRIC: {body}"


def sync_metric_lines(result) -> list[str]:
    """METRIC lines for a finished sync (plans/sync.SyncResult):
    the reference emits a record_count counter tagged with the
    table's coordinates plus a sync_table job timer; here both derive
    from the Observation-collected counters (zero extra passes)."""
    tags = {"table": result.stream}
    out = [
        format_metric_line(
            "counter", "record_count", int(result.record_count), tags
        )
    ]
    if result.metrics and "elapsed_s" in result.metrics:
        out.append(
            format_metric_line(
                "timer", "sync_table",
                result.metrics["elapsed_s"], tags,
            )
        )
    return out
