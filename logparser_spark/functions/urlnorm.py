"""URL canonicalization — the normalize-before-dedup step every
crawl/proxy-log pipeline needs (rfc3986 §6 syntax-based normalization,
the subset that is safe without fetching: case, default ports,
fragments, query-param order).

Reference parity: the reference groups top-URLs on the raw string
(repository/LogRepository.java top-url SQL), so `http://A.b/x?b=1&a=2`
and `http://a.b/x?a=2&b=1` count as different resources. At crawl
scale that splits hot URLs across dozens of spellings; canonicalizing
first makes URL-keyed dedup/top-K exact.

Scale posture: one pure Catalyst expression tree (regexp_extract per
component + array_sort for the query) — zero shuffle, fuses into the
scan projection, evaluated JVM-side. No Python anywhere. The component
regex executes once per extracted group (~6 regex runs per row —
Catalyst CSE does NOT merge extracts that differ by group index); that
is still cheap JVM work on a map stage, and `parse_url()` is no
replacement (it nulls out the scheme-less `host:port` CONNECT targets
proxy logs are full of).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one component grammar shared by every extract:
# [scheme://] host [:port] [/path] [?query] (fragment already stripped)
_C = r"^(?:([A-Za-z][A-Za-z0-9+.\-]*)://)?([^/?#:]*)(?::(\d+))?([^?#]*)(?:\?(.*))?$"

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}


def normalize_url_expr(url: Column | str) -> Column:
    """Canonical form of a URL (or proxy-log ``host:port`` CONNECT
    target): lowercase scheme+host, default port stripped, fragment
    dropped, query params sorted bytewise (only when every key is
    distinct — repeated-key order is semantics), bare-root ``/``
    dropped. Idempotent (property-tested); ``-``, empty, IPv6-bracket,
    and userinfo (``user@host``) URLs pass through unchanged; the
    path's case and encoding are preserved (path case is significant on
    most origins — only scheme/host are case-insensitive per rfc3986
    §6.2.2.1).
    """
    u = F.col(url) if isinstance(url, str) else url
    bare = F.regexp_replace(u, r"#.*", "")  # fragment is client-side only
    scheme = F.lower(F.regexp_extract(bare, _C, 1))
    host = F.lower(F.regexp_extract(bare, _C, 2))
    port = F.regexp_extract(bare, _C, 3)
    path = F.regexp_extract(bare, _C, 4)
    query = F.regexp_extract(bare, _C, 5)
    # the raw authority (everything between scheme and path): used only
    # to detect forms the simple grammar must not touch
    authority = F.regexp_extract(
        bare, r"^(?:[A-Za-z][A-Za-z0-9+.\-]*://)?([^/?#]*)", 1
    )

    default_port = F.create_map(
        *[F.lit(x) for kv in _DEFAULT_PORTS.items() for x in kv]
    )[scheme]
    port_part = F.when(
        (port == "") | (port == F.coalesce(default_port, F.lit(""))), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))

    path_part = F.when(path == "/", F.lit("")).otherwise(path)

    # Sort params ONLY when every key is distinct: with a repeated key
    # (?a=1&a=2) the order is semantics (last-value-wins servers), so
    # reordering would conflate distinct resources. Key = text before
    # the first '=' (a bare flag is its own key).
    params = F.split(query, "&")
    keys = F.transform(params, lambda p: F.substring_index(p, "=", 1))
    keys_distinct = F.size(F.array_distinct(keys)) == F.size(keys)
    sorted_q = F.when(
        keys_distinct, F.array_join(F.array_sort(params), "&")
    ).otherwise(query)
    query_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), sorted_q)
    )

    scheme_part = F.when(scheme == "", F.lit("")).otherwise(
        F.concat(scheme, F.lit("://"))
    )
    rebuilt = F.concat(scheme_part, host, port_part, path_part, query_part)
    # pass-through for the reference's null-URL sentinel, anything the
    # grammar can't place a host for, bracketed IPv6 authorities (":"
    # inside the host breaks the component split), authorities carrying
    # userinfo ("user@host" — userinfo is case-SENSITIVE and "u:p@h"
    # misparses the simple grammar), and a non-empty path that doesn't
    # start with "/" ("h.com:80abc" splits as port 80 + path "abc";
    # stripping the port would concatenate host+path into a DIFFERENT
    # host) — never emit a mangled URL
    return F.when(
        (u == "-")
        | (u == "")
        | u.isNull()
        | (host == "")
        | authority.startswith("[")
        | authority.contains("@")
        | ((path != "") & ~path.startswith("/")),
        u,
    ).otherwise(rebuilt)


def with_normalized_url(
    df: DataFrame, url_col: str = "url", out_col: str = "url_norm"
) -> DataFrame:
    """Add the canonical-URL column (pure projection, zero shuffle)."""
    return df.withColumn(out_col, normalize_url_expr(url_col))


def url_dup_groups(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-keyed duplicate groups AFTER canonicalization: one row per
    canonical URL spelled more than one way, with the spellings count
    and total occurrences. The crawl-frontier dedup primitive: one
    groupBy on the canonical key (uniform-ish; a hot URL combines
    map-side like any count aggregate)."""
    n = with_normalized_url(df, url_col)
    return (
        n.groupBy(F.col("url_norm"))
        .agg(
            F.countDistinct(url_col).alias("n_spellings"),
            F.count(F.lit(1)).alias("occurrences"),
            F.min(url_col).alias("example_raw"),
        )
        .where(F.col("n_spellings") > 1)
    )
