"""PySpark-native analytics/replication engine.

A from-scratch rebuild of the capabilities of
kc-bonilla/redshift-to-pendo-api-data-pipeline (a Singer tap/target ELT
pipeline: Redshift extract -> Pendo metadata API load), re-expressed as a
single lazy Spark DataFrame plan per table sync, plus large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB-class inputs.

Layout
------
- ``schema``     : source-type <-> Spark ``StructType`` mapping, catalog model
- ``catalog``    : stream registry, discovery, selection resolution
- ``sources``    : parquet / JDBC / REST-allowlist readers
- ``operators``  : extract, dedup, similarity, text, multimodal, setops
- ``functions``  : column-expression record transforms (flatten/remap/reshape)
- ``plans``      : end-to-end sync pipeline + state/bookmark store
- ``sink``       : batched, rate-limited, retrying HTTP partition writer
- ``streaming``  : Structured Streaming incremental variant
"""

__version__ = "0.1.0"
