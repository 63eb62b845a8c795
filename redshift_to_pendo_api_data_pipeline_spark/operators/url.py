"""URL-level curation operators (C4, Raffel et al. 2020; RefinedWeb,
Penedo et al. 2023 practice): URL normalization, domain blocklist
filtering, and URL-keyed keep-best dedup. A web-corpus pipeline runs
these BEFORE any text operator — the URL is the cheapest dedup key and
the blocklist is the cheapest quality gate, both resolved without
touching document bytes.

No reference analogue (the reference's scope is DB -> API sync:
tap-redshift/README.md); this is beyond-reference extension work in the
same tier as the Gopher rule sets.

Everything here is pure column algebra (regexp extract/replace, array
filter, broadcast joins) — zero UDFs, zero shuffles beyond the ones the
dedup contract requires, and every expression has a 1:1 DuckDB mirror
so the registry queries hash-check cross-engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

# C4/RefinedWeb-style tracking parameters: stripped during
# normalization so they never split a dedup key. Matched as a whole
# parameter name (the '=' or end anchor keeps 'ref=' from eating
# 'referrer=').
TRACKING_PARAM_RE = r"^(utm_[A-Za-z]+|gclid|fbclid|ref)(=|$)"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"


def url_normalize(col: Column) -> Column:
    """Canonical form of an http(s) URL, NULL when unparseable:

    - scheme and host lowercased;
    - userinfo ('user:pass@') stripped from the authority BEFORE host
      and port parse — it never participates in the URL's identity,
      and leaving it in would let 'https://x@blocked.org/' evade a
      domain blocklist and would merge distinct hosts that share a
      username under one dedup key;
    - default ports dropped (http:80, https:443) — non-default ports
      (including :80 on https) are kept; a NON-NUMERIC port (':abc'),
      a port beyond 65535 (urllib rejects it — emitting a key would
      disagree with every standards-following parser), any '[' or ']'
      anywhere in the authority incl. userinfo (IPv6 literals, and the bracket soup Python's
      urlsplit raises on — fuzz-found: 'http://]0[x.com' previously
      produced host ']0[x.com' where urllib errors), or a TAB/CR/LF
      anywhere in the URL (urllib strips them per WHATWG, so keeping
      them yields a host/path no other parser agrees with) all make
      the whole URL unparseable (NULL) rather than being silently
      repaired — safe by contract (NULL-normalized rows are never
      dropped: dedup keys them by their own id, the blocklist keeps
      them; a NULL is never a WRONG merge key);
    - path: trailing slashes collapsed away, empty path becomes '/';
    - query: starts at the first '?' BEFORE any '#' (a '?' inside the
      fragment is fragment text, not a query); tracking parameters
      (``TRACKING_PARAM_RE``) removed, the surviving parameters kept
      in their original order (reordering would merge URLs whose
      servers treat order as meaningful);
    - fragment dropped (never reaches the server).

    Pure regexp/array column algebra — identical expressions exist in
    DuckDB, so normalized URLs hash-check cross-engine."""
    scheme = F.lower(F.regexp_extract(col, _SCHEME_RE, 1))
    authority = F.regexp_extract(col, _HOSTPORT_RE, 1)
    # userinfo strip: everything after the LAST '@' is host[:port]
    hostport = F.regexp_extract(authority, r"([^@]*)$", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    bad_port = hostport.contains(":") & ~hostport.rlike(r"^[^:]*:[0-9]+$")
    # fuzz-hardened NULL classes (r11, vs urllib.parse ground truth):
    # out-of-range port (urlsplit raises past 65535; try_cast absorbs
    # absurd digit runs that would overflow an ANSI cast), brackets
    # anywhere in the authority (userinfo included — urlsplit raises on
    # 'http://]@0' though the host parse would discard the bracket —
    # IPv6 literals and urlsplit's Invalid-IPv6 soup both land here),
    # and TAB/CR/LF anywhere (WHATWG parsers strip them; keeping them
    # builds a key no other parser would derive)
    bad_port = bad_port | (
        (port != "")
        & (F.coalesce(port.try_cast("int"), F.lit(1 << 30)) > 65535)
    )
    bad_host = authority.rlike(r"[\[\]]") | col.rlike("[\\t\\r\\n]")
    path_raw = F.regexp_extract(col, _PATH_RE, 1)
    path_stripped = F.regexp_replace(path_raw, r"/+$", "")
    path = F.when(path_stripped == "", F.lit("/")).otherwise(path_stripped)
    pre_fragment = F.regexp_extract(col, r"^([^#]*)", 1)
    query_raw = F.regexp_extract(pre_fragment, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query_raw, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    query_join = F.array_join(params, "&")
    query = F.when(
        query_join == "", F.lit("")
    ).otherwise(F.concat(F.lit("?"), query_join))
    default_port = (
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    portstr = F.when(default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    return F.when(
        (scheme != "") & (host != "") & ~bad_port & ~bad_host,
        F.concat(scheme, F.lit("://"), host, portstr, path, query),
    )


def registrable_domain(col: Column) -> Column:
    """Naive eTLD+1 — the last two dot-labels of the normalized URL's
    host (a real deployment swaps in the public-suffix list; the
    operator shape — extract + broadcast blocklist join — is
    unchanged). NULL for unparseable URLs."""
    host = F.lower(F.regexp_extract(url_normalize(col), _HOSTPORT_RE, 1))
    return F.regexp_extract(host, r"([^.:]+\.[^.:]+)(:[0-9]+)?$", 1)


def filter_blocked_domains(
    df: DataFrame, url_col: str, blocked_domains: Sequence[str]
) -> DataFrame:
    """Drop rows whose registrable domain is on the blocklist. The
    blocklist is config-bounded (same legitimate-broadcast contract as
    weak_label's rule table): broadcast left_anti join, fact side never
    shuffles."""
    from redshift_to_pendo_api_data_pipeline_spark.operators.routing import (
        local_df,
    )

    bl = local_df(
        df.sparkSession,
        [(d.lower(),) for d in blocked_domains], "__bdom string"
    )
    keyed = df.withColumn(
        "__rdom", registrable_domain(F.col(url_col))
    )
    return (
        keyed.join(
            F.broadcast(bl),
            keyed["__rdom"] == bl["__bdom"],
            "left_anti",
        )
        .drop("__rdom")
    )


def url_dedup_keep_best(
    df: DataFrame, url_col: str, id_col: str, score_col: str
) -> DataFrame:
    """URL-keyed keep-best dedup: within each NORMALIZED-URL duplicate
    cluster, survive the highest-``score_col`` row (ties to smallest
    id) — `exact_dedup_keep_best`'s policy with the URL as the
    identity, the first dedup a web corpus runs (two crawls of one
    page dedup on URL before any text is compared). Rows whose URL is
    unparseable (normalize -> NULL) are each their own cluster, keyed
    by their id — a malformed URL is no license to drop the doc.

    Scale contract: one digest-key exchange; shuffle rows carry
    (digest, id, score), never URL text or document bytes; the winner
    is a row_number window ordered (score DESC, id ASC) whose rank-1
    filter is WindowGroupLimit-bounded map-side."""
    keyed = df.withColumn(
        "__digest",
        F.coalesce(
            F.md5(url_normalize(F.col(url_col))),
            F.concat(F.lit("__id__"), F.col(id_col).cast("string")),
        ),
    )
    w = Window.partitionBy("__digest").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__digest", "__rn")
    )


def url_stage(
    url_col: str,
    id_col: str,
    score_col: str,
    blocked_domains: Sequence[str] = (),
):
    """CLI `curate` funnel stage: blocklist filter then URL-keyed
    keep-best dedup (the order every web pipeline uses — blocking
    first shrinks the dedup key space for free)."""

    def fn(df: DataFrame) -> DataFrame:
        out = df
        if blocked_domains:
            out = filter_blocked_domains(out, url_col, blocked_domains)
        return url_dedup_keep_best(out, url_col, id_col, score_col)

    return fn
