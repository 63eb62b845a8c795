"""JDBC source: Redshift/Postgres scans + information_schema discovery.

Re-expresses tap-redshift's extract surface (SURVEY.md §2.1 S1-S5):

- S1 connection open (connect.py:17-31)   -> spark.read.jdbc options
- S2 eager SELECT (connect.py:8-14)       -> lazy jdbc relation; Catalyst
  pushes filters/projections into the remote SQL
- S3-S5 metadata scans (discover.py:20-54)-> the same three
  information_schema queries through the JDBC reader
- parallel read upgrade: partitionColumn/lowerBound/upperBound/
  numPartitions splits one remote scan into N concurrent cursors — the
  scale-out replacement for the reference's single streaming cursor
  (sync.py:176-198).

No live database exists in the test environment, so tests cover the query
builders and option plumbing; the reader methods are thin `spark.read`
calls.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from redshift_to_pendo_api_data_pipeline_spark.schema import ColumnSpec


@dataclass
class JdbcConfig:
    """Connection config, the shape of tap_config.json (parsed_args.py:18-95)."""

    host: str
    port: int = 5439
    dbname: str = "dev"
    user: str = ""
    password: str = ""
    db_schema: str = "public"
    # dialect plug-in point: Redshift/postgres by default; any JDBC
    # database whose driver jar is on Spark's classpath works by
    # overriding these two (the integration tests use embedded Derby,
    # the only driver shipped with pyspark)
    driver: str = "org.postgresql.Driver"
    url_override: str | None = None

    @property
    def url(self) -> str:
        if self.url_override:
            return self.url_override
        # Redshift speaks the postgres wire protocol; either driver name works
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.dbname}"

    @property
    def properties(self) -> dict[str, str]:
        return {"user": self.user, "password": self.password, "driver": self.driver}


# -- metadata queries (S3-S5) — the same relations the reference scans ----

import re as _re

_IDENT_RE = _re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*$")


def _checked_ident(name: str, what: str = "db_schema") -> str:
    """Schema/table names are interpolated into dialect SQL text (JDBC
    metadata queries take no bind parameters through spark.read.jdbc), so
    restrict them to plain SQL identifiers — anything else (quotes,
    semicolons, whitespace) raises instead of reaching the remote SQL."""
    if not _IDENT_RE.match(name or ""):
        raise ValueError(f"{what} is not a plain SQL identifier: {name!r}")
    return name


def tables_query(db_schema: str) -> str:
    """S3: table enumeration (discover.py:20-26)."""
    db_schema = _checked_ident(db_schema)
    return (
        "SELECT table_schema, table_name, table_type "
        "FROM INFORMATION_SCHEMA.Tables "
        f"WHERE table_schema = '{db_schema}'"
    )


def columns_query(db_schema: str) -> str:
    """S4: column metadata, Tables ⋈ Columns (discover.py:28-37)."""
    db_schema = _checked_ident(db_schema)
    return (
        "SELECT c.table_schema, c.table_name, c.column_name, c.ordinal_position, "
        "c.udt_name, c.is_nullable, c.character_maximum_length "
        "FROM INFORMATION_SCHEMA.Tables t "
        "JOIN INFORMATION_SCHEMA.Columns c ON c.table_name = t.table_name "
        "AND c.table_schema = t.table_schema "
        f"WHERE t.table_schema = '{db_schema}' "
        "ORDER BY c.table_name, c.ordinal_position"
    )


def primary_keys_query(db_schema: str) -> str:
    """S5: PK columns, table_constraints ⋈ key_column_usage
    (discover.py:39-54)."""
    db_schema = _checked_ident(db_schema)
    return (
        "SELECT kc.table_schema, kc.table_name, kc.column_name "
        "FROM information_schema.table_constraints tc "
        "JOIN information_schema.key_column_usage kc "
        "ON kc.table_name = tc.table_name "
        "AND kc.table_schema = tc.table_schema "
        "AND kc.constraint_name = tc.constraint_name "
        f"WHERE tc.constraint_type = 'PRIMARY KEY' AND kc.table_schema = '{db_schema}' "
        "ORDER BY kc.table_name, kc.ordinal_position"
    )


def read_query(spark: SparkSession, cfg: JdbcConfig, query: str) -> DataFrame:
    """S2: run arbitrary SQL remotely as a derived-table relation."""
    return spark.read.jdbc(cfg.url, f"({query}) q", properties=cfg.properties)


def read_table(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
) -> DataFrame:
    """S1+S2: lazy table relation. With partition options, Spark issues
    num_partitions range-sliced SELECTs concurrently — the parallel-cursor
    upgrade over the reference's single fetchone() loop. Predicates and
    projections composed on the result are pushed into each slice's SQL."""
    qualified = f"{cfg.db_schema}.{table}"
    reader = (
        spark.read.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", qualified)
        .option("user", cfg.user)
        .option("password", cfg.password)
        .option("driver", cfg.properties["driver"])
        # stream rows instead of buffering the whole result (psycopg2
        # cursor parity; JDBC default fetches all)
        .option("fetchsize", "10000")
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


# -- large-allowlist semi-join pushdown (SURVEY §4: temp-table fallback) --

# Above this many ids, an inlined IN (...) predicate stops being a win:
# the SQL text grows into megabytes, remote parsers cap expression counts
# (and Spark's isin builds one literal expression per element), so the
# allowlist is shipped once as a table and the JOIN runs remotely.
ALLOWLIST_INLINE_MAX = 10_000


def write_allowlist_table(
    cfg: JdbcConfig, allowlist: DataFrame, table: str, key_col: str = "id"
) -> str:
    """Materialize an allowlist into a remote staging table through the
    JDBC writer (one batched insert stream per partition). Returns the
    qualified table name."""
    qualified = f"{cfg.db_schema}.{table}"
    (
        allowlist.selectExpr(f"{key_col} AS id")
        .write.mode("overwrite")
        .jdbc(cfg.url, qualified, properties=cfg.properties)
    )
    return qualified


def read_table_semijoin_remote(
    spark: SparkSession, cfg: JdbcConfig, table: str, key: str, allowlist_table: str
) -> DataFrame:
    """Scan `table` semi-joined against a remote allowlist table INSIDE
    the database: only matching rows ever cross the wire, the remote
    planner uses its own indexes, and the query text stays O(1) no matter
    how many ids the allowlist holds."""
    # the staging column is double-quoted: Spark's JDBC writer creates
    # case-sensitive quoted identifiers, so an unquoted a.id would
    # fold to the dialect's default case and miss (Derby folds up,
    # postgres folds down — the quoted form matches both)
    q = (
        f"SELECT t.* FROM {cfg.db_schema}.{table} t "
        f'JOIN {allowlist_table} a ON t.{key} = a."id"'
    )
    return read_query(spark, cfg, q)


def scan_with_allowlist(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    key: str,
    allowlist: DataFrame,
    allowlist_key: str = "id",
    inline_max: int = ALLOWLIST_INLINE_MAX,
    staging_table: str = "sync_allowlist_stage",
) -> DataFrame:
    """J3 at any allowlist size (SURVEY §4): small allowlists run as a
    broadcast left-semi join over the scan (Catalyst may push an IN list
    remotely); past `inline_max` ids the allowlist is written to a remote
    staging table and the semi-join executes AS A REAL JOIN inside the
    database — never a multi-megabyte literal list in the SQL text."""
    from redshift_to_pendo_api_data_pipeline_spark.operators.extract import (
        semi_join_allowlist,
    )

    if allowlist.count() <= inline_max:
        return semi_join_allowlist(
            read_table(spark, cfg, table), key, allowlist, allowlist_key
        )
    staged = write_allowlist_table(cfg, allowlist, staging_table, allowlist_key)
    return read_table_semijoin_remote(spark, cfg, table, key, staged)


# -- dialect layer ---------------------------------------------------------
#
# The reader/writer paths above are dialect-free (plain JDBC); everything
# dialect-SPECIFIC is the metadata discovery SQL and identifier case
# folding, captured here explicitly. Differences between the two shipped
# dialects (all public-documentation facts):
#
# | concern            | postgres/redshift              | derby            |
# |--------------------|--------------------------------|------------------|
# | url scheme         | jdbc:postgresql://host/db      | jdbc:derby:path  |
# | unquoted identifier| folds to LOWER case            | folds to UPPER   |
# | table catalog      | information_schema.tables      | SYS.SYSTABLES ⋈  |
# |                    |                                | SYS.SYSSCHEMAS   |
# | column catalog     | information_schema.columns     | SYS.SYSCOLUMNS   |
# |                    | (udt_name, is_nullable,        | (COLUMNDATATYPE  |
# |                    |  character_maximum_length)     |  stringifies as  |
# |                    |                                | 'VARCHAR(64) NOT |
# |                    |                                |  NULL' — parsed) |
# | primary keys       | information_schema             | no SQL-friendly  |
# |                    | .table_constraints ⋈           | exposure (SYSKEYS|
# |                    | .key_column_usage              | descriptor blob) |
#
# Primary keys therefore go through java.sql.DatabaseMetaData
# .getPrimaryKeys — the JDBC-standard, dialect-FREE metadata API — for
# every dialect; the postgres information_schema SQL form is kept for
# parity with the reference (discover.py:39-54) and remains the default
# for PostgresDialect when SQL-only access is preferred.


class PostgresDialect:
    """Redshift speaks the postgres wire protocol and ships the standard
    information_schema, so one dialect covers both (reference
    tap-redshift targets Redshift with psycopg2, the postgres driver)."""

    name = "postgres"

    @staticmethod
    def fold(ident: str) -> str:
        """Postgres folds unquoted identifiers to lower case."""
        return ident.lower()

    @staticmethod
    def tables_query(db_schema: str) -> str:
        return tables_query(db_schema)

    @staticmethod
    def columns_query(db_schema: str) -> str:
        return columns_query(db_schema)

    @staticmethod
    def primary_keys_query(db_schema: str) -> str:
        return primary_keys_query(db_schema)

    @staticmethod
    def normalize_column_rows(rows) -> list[tuple]:
        """information_schema rows are already the canonical shape
        (schema, table, column, position, udt, is_nullable, char_max)."""
        return [tuple(r) for r in rows]


class DerbyDialect:
    """Embedded Derby — the one driver shipped inside pyspark's jars, so
    the dialect layer is LIVE-provable hermetically. Metadata lives in
    the SYS catalog; column types stringify through COLUMNDATATYPE
    (e.g. 'VARCHAR(64) NOT NULL'), normalized below to the canonical
    information_schema shape."""

    name = "derby"

    @staticmethod
    def fold(ident: str) -> str:
        """Derby follows the SQL standard: unquoted folds to UPPER."""
        return ident.upper()

    @staticmethod
    def tables_query(db_schema: str) -> str:
        db_schema = _checked_ident(db_schema)
        return (
            "SELECT s.schemaname, t.tablename, t.tabletype "
            "FROM sys.systables t JOIN sys.sysschemas s "
            "ON t.schemaid = s.schemaid "
            f"WHERE s.schemaname = '{db_schema}'"
        )

    @staticmethod
    def columns_query(db_schema: str) -> str:
        db_schema = _checked_ident(db_schema)
        return (
            "SELECT s.schemaname, t.tablename, c.columnname, "
            "c.columnnumber, "
            "CAST(c.columndatatype AS VARCHAR(254)) AS datatype "
            "FROM sys.syscolumns c "
            "JOIN sys.systables t ON c.referenceid = t.tableid "
            "JOIN sys.sysschemas s ON t.schemaid = s.schemaid "
            f"WHERE s.schemaname = '{db_schema}' "
            "ORDER BY t.tablename, c.columnnumber"
        )

    @staticmethod
    def primary_keys_query(db_schema: str) -> str:
        raise NotImplementedError(
            "Derby exposes PK column positions only through the SYSKEYS "
            "conglomerate descriptor blob — use primary_keys_jdbc() "
            "(java.sql.DatabaseMetaData.getPrimaryKeys), the dialect-free "
            "JDBC metadata API"
        )

    @staticmethod
    def normalize_column_rows(rows) -> list[tuple]:
        """Parse 'VARCHAR(64) NOT NULL' / 'BIGINT' style type strings to
        the canonical (schema, table, column, position, udt,
        is_nullable, char_max) shape."""
        import re as _re

        out = []
        for r in rows:
            schema, table, col, pos, dtype = r[0], r[1], r[2], r[3], r[4]
            nullable = "NO" if "NOT NULL" in dtype.upper() else "YES"
            base = dtype.split("(")[0].strip().split(" ")[0].lower()
            m = _re.match(r"^[A-Za-z ]+\((\d+)", dtype)
            char_max = int(m.group(1)) if m and base in (
                "varchar", "char", "clob"
            ) else None
            out.append((schema, table, col, pos, base, nullable, char_max))
        return out


def dialect_for(cfg: JdbcConfig):
    """Pick the dialect from the connection shape: the JDBC URL *scheme*
    (``jdbc:derby:``) or a Derby driver class selects DerbyDialect;
    everything else is the postgres/redshift family (the reference's only
    target). Scheme-prefix matching, not substring — a postgres URL whose
    database happens to be named 'derbydb' must not flip dialects."""
    url = (cfg.url_override or cfg.url or "").lower()
    if url.startswith("jdbc:derby:") or cfg.driver.startswith("org.apache.derby."):
        return DerbyDialect()
    return PostgresDialect()


def primary_keys_jdbc(
    spark: SparkSession, cfg: JdbcConfig, db_schema: str, tables: list[str]
) -> list[tuple]:
    """(schema, table, column) PK rows via java.sql.DatabaseMetaData
    .getPrimaryKeys — the JDBC-standard API every driver implements, so
    this path is dialect-free. Driver-side by design: catalog metadata
    is O(tables), never data-sized."""
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    for k, v in cfg.properties.items():
        if v:
            props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(cfg.url, props)
    try:
        meta = conn.getMetaData()
        rows = []
        for t in tables:
            rs = meta.getPrimaryKeys(None, db_schema, t)
            while rs.next():
                rows.append(
                    (rs.getString("TABLE_SCHEM"), rs.getString("TABLE_NAME"),
                     rs.getString("COLUMN_NAME"))
                )
        return rows
    finally:
        conn.close()


def discover_column_specs(
    spark: SparkSession, cfg: JdbcConfig
) -> dict[str, list[ColumnSpec]]:
    """Full S3-S5 discovery through the dialect layer: dialect SQL for
    tables/columns (pushed through the same JDBC reader as data scans),
    DatabaseMetaData for primary keys. Returns per-table ColumnSpec
    lists — the dialect-parameterized version of the reference's
    discover.py flow."""
    d = dialect_for(cfg)
    col_rows = d.normalize_column_rows(
        read_query(spark, cfg, d.columns_query(cfg.db_schema)).collect()
    )
    tables = sorted({r[1] for r in col_rows})
    pk_rows = primary_keys_jdbc(spark, cfg, cfg.db_schema, tables)
    return column_specs_from_metadata(list(pk_rows) + list(col_rows))


def column_specs_from_metadata(rows) -> dict[str, list[ColumnSpec]]:
    """Assemble discovery rows (S4 + S5 results) into per-table ColumnSpec
    lists — the catalog-build step (discover.py:57-97) minus the
    JSON-schema detour."""
    pk: set[tuple[str, str]] = set()
    cols: dict[str, list[ColumnSpec]] = {}
    for r in rows:
        if len(r) == 3:  # pk row: (schema, table, column)
            pk.add((r[1], r[2]))
    for r in rows:
        if len(r) in (6, 7):  # column row (7th = character_maximum_length)
            _, table, name, _, udt, nullable = r[:6]
            char_max = r[6] if len(r) == 7 and r[6] is not None else None
            cols.setdefault(table, []).append(
                ColumnSpec(
                    name=name,
                    sql_datatype=udt,
                    nullable=str(nullable).lower() == "yes",
                    is_primary_key=(table, name) in pk,
                    char_max_length=int(char_max) if char_max else None,
                )
            )
    return cols
