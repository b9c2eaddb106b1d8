"""Deterministic Squid-log-line derivation from the driver's ``events``
table — expressed as ONE SQL template valid in both Spark SQL and
DuckDB, so every pipeline query has an independently-runnable oracle.

The driver's correctness gate runs our Spark ``queries()`` and our
``oracle_sql()`` (DuckDB) side-by-side on the same parquet. The Spark
side additionally round-trips the line through the token encoding
(array<int> of code points) and the vectorized parse UDF; the DuckDB
side parses the identical line with ``regexp_extract``. Integer-only
arithmetic everywhere so the strings are byte-identical across engines.

Field pools cover every reference branch (FIXTURES.md §2): status-less
actions (fallback heuristic), url forms incl. '-' and scheme-less
host:port (domain regex), invalid usernames ('-', 'admin', one
underscore), malformed lines (regex mismatch -> quarantine), rt == 0
(AVG gate), all 24 hours (events span a month).
"""

from __future__ import annotations

# Username slot shared by every well-formed branch: varies across
# valid/invalid so reject-precedence (overflow before username before
# timestamp) is observable in the data, mirroring parse.py:206-214.
_USER_SQL = """CASE user_id % 10
       WHEN 0 THEN '-' WHEN 1 THEN 'admin' WHEN 2 THEN 'x_y'
       WHEN 3 THEN 'svc_acct_' || CAST(user_id % 20 AS STRING)
       ELSE 'user' || CAST(user_id AS STRING)
     END""".strip()

# Dialect slots: {EPOCH} -> integral epoch seconds of ts; {USER} -> the
# username CASE above; everything else is shared verbatim.
#
# Reject-branch lines (modeled after LogFileParser.java:1049-1099):
#   %37 corrupt (regex mismatch), %41 truncated (regex mismatch),
#   %43 rt > Integer.MAX_VALUE (numeric_overflow),
#   %47 bytes > Long.MAX_VALUE (numeric_overflow),
#   %53 epoch seconds past the int64-microsecond bound (bad_timestamp).
_LINE_TEMPLATE = """
CASE WHEN event_id % 37 = 0 THEN 'CORRUPT ' || CAST(event_id AS STRING) || ' @@@'
WHEN event_id % 41 = 0 THEN CAST({EPOCH} AS STRING) || '.' || lpad(CAST(event_id % 1000 AS STRING), 3, '0') || ' truncated'
WHEN event_id % 43 = 0 THEN
  CAST({EPOCH} AS STRING) || '.' || lpad(CAST(event_id % 1000 AS STRING), 3, '0')
  || ' 2147483648 10.9.9.9 TCP_MISS/200 ' || CAST((event_id * 97) % 1048576 AS STRING)
  || ' GET http://site-overflow.example.com/p/1 ' || {USER} || ' DIRECT/10.0.0.1 text/html'
WHEN event_id % 47 = 0 THEN
  CAST({EPOCH} AS STRING) || '.' || lpad(CAST(event_id % 1000 AS STRING), 3, '0')
  || ' 120 10.9.9.9 TCP_HIT/200 9223372036854775808 GET http://site-overflow.example.com/p/2 '
  || {USER} || ' DIRECT/10.0.0.1 text/html'
WHEN event_id % 53 = 0 THEN
  '9223372036854.' || lpad(CAST(event_id % 1000 AS STRING), 3, '0')
  || ' 120 10.9.9.9 TCP_HIT/200 512 GET http://site-overflow.example.com/p/3 '
  || {USER} || ' DIRECT/10.0.0.1 text/html'
ELSE
  CAST({EPOCH} AS STRING) || '.' || lpad(CAST(event_id % 1000 AS STRING), 3, '0')
  || ' ' || CAST(event_id % 5000 AS STRING)
  || ' 10.' || CAST(user_id % 4 AS STRING) || '.' || CAST(user_id % 50 AS STRING) || '.' || CAST(event_id % 250 + 1 AS STRING)
  || ' ' || CASE event_type
       WHEN 'view' THEN CASE WHEN event_id % 11 = 0 THEN 'TCP_HIT' ELSE 'TCP_HIT/200' END
       WHEN 'click' THEN CASE WHEN event_id % 11 = 0 THEN 'TCP_MISS'
                              WHEN event_id % 5 = 0 THEN 'TCP_MISS/301'
                              WHEN event_id % 7 = 0 THEN 'TCP_MISS/404'
                              ELSE 'TCP_MISS/200' END
       WHEN 'purchase' THEN CASE WHEN event_id % 13 = 0 THEN 'TCP_TUNNEL' ELSE 'TCP_TUNNEL/200' END
       WHEN 'signup' THEN CASE WHEN event_id % 11 = 0 THEN 'NONE' ELSE 'TCP_REFRESH_MODIFIED/304' END
       ELSE CASE WHEN event_id % 11 = 0 THEN 'TCP_DENIED'
                 WHEN event_id % 5 = 0 THEN 'TCP_MISS/500'
                 WHEN event_id % 7 = 0 THEN 'TCP_MISS/503'
                 ELSE 'TCP_DENIED/403' END
     END
  || ' ' || CAST((event_id * 97) % 1048576 AS STRING)
  || ' ' || CASE event_id % 3 WHEN 0 THEN 'GET' WHEN 1 THEN 'POST' ELSE 'CONNECT' END
  || ' ' || CASE event_id % 7
       WHEN 0 THEN '-'
       WHEN 1 THEN 'https://site-' || CAST(event_id % 40 AS STRING) || '.example.com:8443/p/' || CAST(event_id % 500 AS STRING)
       WHEN 2 THEN 'site-' || CAST(event_id % 40 AS STRING) || '.example.com:443'
       ELSE 'http://site-' || CAST(event_id % 40 AS STRING) || '.example.com/p/' || CAST(event_id % 500 AS STRING)
     END
  || ' ' || {USER}
  || ' DIRECT/10.0.0.1 ' || CASE WHEN event_id % 2 = 0 THEN 'text/html' ELSE 'application/json' END
END
""".strip()


def line_expr_spark() -> str:
    """Spark SQL expression for the derived log line (column: events.*).

    Spark reads the pandas-written parquet timestamp as TIMESTAMP_NTZ;
    casting NTZ -> TIMESTAMP under ``spark.sql.session.timeZone=UTC``
    and then -> LONG floors to the same epoch seconds as DuckDB's
    ``floor(epoch(ts))`` on the naive timestamp.
    """
    return _LINE_TEMPLATE.replace(
        "{EPOCH}", "CAST(CAST(ts AS TIMESTAMP) AS LONG)"
    ).replace("{USER}", _USER_SQL)


def line_expr_duckdb() -> str:
    return _LINE_TEMPLATE.replace(
        "{EPOCH}", "CAST(floor(epoch(ts)) AS BIGINT)"
    ).replace("{USER}", _USER_SQL)


# --- DuckDB-side parse (the oracle's equivalent of the pandas UDF) ----

# RE2-compatible; identical semantics to functions/parse.py LOG_PATTERN.
RX = (
    r"^(\d+\.\d+)\s+(\d+)\s+(\d+\.\d+\.\d+\.\d+)\s+([A-Z_]+)(?:/(\d{3}))?\s+"
    r"(\d+)\s+(\S+)\s+(\S+)\s+(\S+|-)\s+(\S+)\s+(\S+)"
)
DOMAIN_RX = r"^(?:https?://)?([^/:]+)(?::\d+)?(?:/.*)?$"


def duckdb_parsed_cte(limit_sql: str = "") -> str:
    """WITH-clause prefix producing the oracle's parsed relation.

    Columns mirror the Spark pipeline's output: event_id (doc_id
    analog), source (event_type), time (UTC timestamp), ip, username,
    url, domain, status_code, response_time_ms, response_size_bytes,
    action, http_method, valid, category.
    """
    line = line_expr_duckdb()
    return f"""
WITH lines AS (
  SELECT event_id, event_type AS source, ts, ({line}) AS line
  FROM events {limit_sql}
),
rawparse AS (
  SELECT *,
    regexp_extract(line, '{RX}', 1) AS g_ts,
    regexp_extract(line, '{RX}', 2) AS g_rt,
    regexp_extract(line, '{RX}', 3) AS g_ip,
    regexp_extract(line, '{RX}', 4) AS g_action,
    regexp_extract(line, '{RX}', 5) AS g_status,
    regexp_extract(line, '{RX}', 6) AS g_bytes,
    regexp_extract(line, '{RX}', 7) AS g_method,
    regexp_extract(line, '{RX}', 8) AS g_url,
    regexp_extract(line, '{RX}', 9) AS g_user
  FROM lines
),
flags AS (
  SELECT *,
    (g_ts <> '') AS matched,
    -- Integer.parseInt / Long.parseLong overflow -> reject
    -- (LogFileParser.java:1055,1059; parse.py:147). TRY_CAST is exact.
    (g_ts <> '' AND (TRY_CAST(g_rt AS INTEGER) IS NULL OR TRY_CAST(g_bytes AS BIGINT) IS NULL)) AS num_over,
    -- epoch-seconds bound so secs*1e6+999999 fits int64 (parse.py:127,155);
    -- string compare after stripping leading zeros, like parse._exceeds.
    (length(ltrim(split_part(g_ts, '.', 1), '0')) < 13
     OR (length(ltrim(split_part(g_ts, '.', 1), '0')) = 13
         AND ltrim(split_part(g_ts, '.', 1), '0') <= '9223372036853')) AS sec_ok,
    (g_user <> '' AND g_user <> '-' AND
     (contains(lower(g_user), 'user') OR length(g_user) - length(replace(g_user, '_', '')) >= 2)
    ) AS uname_ok
  FROM rawparse
),
okflags AS (
  SELECT *, (matched AND NOT num_over AND sec_ok AND uname_ok) AS ok FROM flags
),
parsed AS (
  SELECT
    event_id, source,
    ok AS valid,
    CASE WHEN ok THEN
      CAST(split_part(g_ts, '.', 1) AS BIGINT) * 1000000
      + CAST(rpad(CASE WHEN split_part(g_ts, '.', 2) = '' THEN '0' ELSE split_part(g_ts, '.', 2) END, 6, '0') AS BIGINT)
    END AS epoch_us,
    CASE WHEN ok THEN
      make_timestamp(
        CAST(split_part(g_ts, '.', 1) AS BIGINT) * 1000000
        + CAST(rpad(CASE WHEN split_part(g_ts, '.', 2) = '' THEN '0' ELSE split_part(g_ts, '.', 2) END, 6, '0') AS BIGINT))
    END AS time,
    CASE WHEN ok THEN g_ip END AS ip,
    CASE WHEN ok THEN g_user END AS username,
    CASE WHEN ok THEN g_url END AS url,
    CASE WHEN ok THEN
      CASE WHEN g_url = '-' THEN ''
           ELSE coalesce(regexp_extract(g_url, '{DOMAIN_RX}', 1), '') END
    END AS domain,
    CASE WHEN ok THEN
      CASE WHEN g_status <> '' THEN CAST(g_status AS INT)
           WHEN contains(g_action, 'DENIED') OR contains(g_action, 'DENY') THEN 403
           WHEN contains(g_action, 'MISS') OR contains(g_action, 'HIT')
             OR contains(g_action, 'TUNNEL') OR contains(g_action, 'REFRESH') THEN 200
           ELSE 0 END
    END AS status_code,
    CASE WHEN ok THEN CAST(g_rt AS INT) END AS response_time_ms,
    CASE WHEN ok THEN CAST(g_bytes AS BIGINT) END AS response_size_bytes,
    CASE WHEN ok THEN g_action END AS action,
    CASE WHEN ok THEN g_method END AS http_method,
    CASE WHEN NOT ok THEN 'quarantine'
         WHEN contains(g_action, 'DENIED') OR contains(g_action, 'DENY') THEN 'denied'
         WHEN CASE WHEN g_status <> '' THEN CAST(g_status AS INT)
                   WHEN contains(g_action, 'DENIED') OR contains(g_action, 'DENY') THEN 403
                   WHEN contains(g_action, 'MISS') OR contains(g_action, 'HIT')
                     OR contains(g_action, 'TUNNEL') OR contains(g_action, 'REFRESH') THEN 200
                   ELSE 0 END >= 400 THEN 'error'
         WHEN CASE WHEN g_status <> '' THEN CAST(g_status AS INT)
                   WHEN contains(g_action, 'DENIED') OR contains(g_action, 'DENY') THEN 403
                   WHEN contains(g_action, 'MISS') OR contains(g_action, 'HIT')
                     OR contains(g_action, 'TUNNEL') OR contains(g_action, 'REFRESH') THEN 200
                   ELSE 0 END BETWEEN 200 AND 399 THEN 'success'
         ELSE 'other' END AS category,
    -- precedence mirrors parse.py:206-214 / LogFileParser.java:1049-1099
    CASE WHEN NOT matched THEN 'regex_mismatch'
         WHEN num_over THEN 'numeric_overflow'
         WHEN NOT uname_ok THEN 'invalid_username'
         WHEN NOT sec_ok THEN 'bad_timestamp' END AS reject_reason
  FROM okflags
)
"""
