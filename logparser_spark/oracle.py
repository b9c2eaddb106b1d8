"""Single-process pandas oracle — an INDEPENDENT, deliberately naive
per-row reimplementation of the pipeline semantics used only by tests.

Independence matters: the production path is vectorized
(Series.str.extract over Arrow batches); this oracle re-derives every
row with plain ``re.match`` + scalar Python, mirroring the reference's
control flow (LogFileParser.parseLineToCSV, LogFileParser.java:1049-1099)
so the two implementations cannot share a bug.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd

LOG_RX = re.compile(
    r"^(\d+\.\d+)\s+(\d+)\s+(\d+\.\d+\.\d+\.\d+)\s+([A-Z_]+)(?:/(\d{3}))?\s+"
    r"(\d+)\s+(\S+)\s+(\S+)\s+(\S+|-)\s+(\S+)\s+(\S+)"
)
DOMAIN_RX = re.compile(r"^(?:https?://)?([^/:]+)(?::\d+)?(?:/.*)?$")


def valid_username(u: str | None) -> bool:
    if not u or u == "-":
        return False
    if "user" in u.lower():
        return True
    return u.count("_") >= 2


def status_fallback(status_str: str | None, action: str) -> int:
    if status_str:
        return int(status_str)
    if "DENIED" in action or "DENY" in action:
        return 403
    if any(t in action for t in ("MISS", "HIT", "TUNNEL", "REFRESH")):
        return 200
    return 0


def extract_domain(url: str | None) -> str:
    if not url or url == "-":
        return ""
    m = DOMAIN_RX.match(url)
    return m.group(1) if m else ""


@dataclass
class ParsedRow:
    valid: bool
    reject_reason: str | None = None
    epoch_us: int | None = None
    ip: str | None = None
    username: str | None = None
    url: str | None = None
    domain: str | None = None
    status_code: int | None = None
    response_time_ms: int | None = None
    response_size_bytes: int | None = None
    action: str | None = None
    http_method: str | None = None


RT_MAX = 2**31 - 1  # Integer.parseInt overflow -> reject (java:1055)
BYTES_MAX = 2**63 - 1  # Long.parseLong overflow -> reject (java:1059)
SECS_MAX = 9223372036853  # epoch_us must fit int64 (documented deviation)


# Input contract (shared with the vectorized engines): lone surrogates
# are not UTF-8-representable and normalize to U+FFFD at the boundary —
# the same permissiveness codec.decode_tokens applies to corrupt tokens.
SURROGATE_RX = re.compile("[\ud800-\udfff]")


def parse_line(line: str) -> ParsedRow:
    if line and SURROGATE_RX.search(line):
        line = SURROGATE_RX.sub("�", line)
    m = LOG_RX.match(line or "")
    if not m:
        return ParsedRow(False, "regex_mismatch")
    # reference code order: numeric parses throw before the username
    # check, which precedes timestamp conversion (java:1055-1075)
    if int(m.group(2)) > RT_MAX or int(m.group(6)) > BYTES_MAX:
        return ParsedRow(False, "numeric_overflow")
    uname = m.group(9)
    if not valid_username(uname.strip() if uname else uname):
        return ParsedRow(False, "invalid_username")
    ts_raw = m.group(1)
    sec, _, frac = ts_raw.partition(".")
    if int(sec) > SECS_MAX:
        return ParsedRow(False, "bad_timestamp")
    epoch_us = int(sec) * 1_000_000 + int((frac or "0").ljust(6, "0")[:6])
    action = m.group(4)
    return ParsedRow(
        True,
        None,
        epoch_us,
        m.group(3),
        uname.strip(),
        m.group(8),
        extract_domain(m.group(8)),
        status_fallback(m.group(5), action),
        int(m.group(2)),
        int(m.group(6)),
        action,
        m.group(7),
    )


def categorize(row: ParsedRow) -> str:
    if not row.valid:
        return "quarantine"
    if "DENIED" in row.action or "DENY" in row.action:
        return "denied"
    s = row.status_code
    if s >= 400:
        return "error"
    if 200 <= s < 400:
        return "success"
    return "other"


def parse_frame(lines: pd.Series) -> pd.DataFrame:
    """Per-row oracle over a Series of decoded lines."""
    rows = [parse_line(s) for s in lines]
    out = pd.DataFrame([r.__dict__ for r in rows], index=lines.index)
    # None+bigint -> float64 in the DataFrame constructor loses exact
    # integers near 2^63; rebuild from the raw Python ints
    for c in ("epoch_us", "response_size_bytes", "response_time_ms", "status_code"):
        out[c] = pd.array([getattr(r, c) for r in rows], dtype="Int64")
    out["category"] = [categorize(r) for r in rows]
    return out


STATUS_CLASS = {
    "2xx": "2xx (Успех)",
    "3xx": "3xx (Перенаправление)",
    "4xx": "4xx (Ошибка клиента)",
    "5xx": "5xx (Ошибка сервера)",
    "other": "Другие",
}


def status_class(s: int) -> str:
    if 200 <= s < 300:
        return STATUS_CLASS["2xx"]
    if 300 <= s < 400:
        return STATUS_CLASS["3xx"]
    if 400 <= s < 500:
        return STATUS_CLASS["4xx"]
    if s >= 500:
        return STATUS_CLASS["5xx"]
    return STATUS_CLASS["other"]


def aggregate_sinks(parsed: pd.DataFrame) -> pd.DataFrame:
    """Per-category totals — StatisticsService.calculateRealTimeStats
    semantics (count, errors, distinct ip, avg rt>0 rounded, sum bytes)."""
    rows = []
    for cat, g in parsed.groupby("category"):
        v = g[g["valid"]]
        rt = v.loc[v["response_time_ms"] > 0, "response_time_ms"]
        rows.append(
            {
                "category": cat,
                "row_count": len(g),
                "error_count": int((v["status_code"] >= 400).sum()),
                "unique_ips": int(v["ip"].nunique()),
                "bytes_total": int(v["response_size_bytes"].fillna(0).sum()),
                # Java Math.round = floor(x + 0.5)
                "avg_response_time_ms": int((rt.mean() + 0.5) // 1) if len(rt) else 0,
            }
        )
    return pd.DataFrame(rows).sort_values("category").reset_index(drop=True)


def top_urls(parsed: pd.DataFrame, k: int = 100) -> pd.DataFrame:
    """PrecalculatedTopService.calculateTopUrls + pinned tie-break."""
    v = parsed[parsed["valid"] & parsed["url"].notna() & (parsed["url"] != "-")]
    g = (
        v.groupby(["url", "domain"], as_index=False)
        .agg(
            request_count=("url", "size"),
            avg_rt_raw=("response_time_ms", "mean"),
            total_bytes=("response_size_bytes", "sum"),
            last_access_us=("epoch_us", "max"),
        )
        .assign(avg_response_time=lambda d: ((d.avg_rt_raw + 0.5) // 1).astype(int))
        .drop(columns=["avg_rt_raw"])
        .sort_values(["request_count", "url"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return g


def top_users(parsed: pd.DataFrame, k: int = 10) -> pd.DataFrame:
    """PrecalculatedTopService.calculateTopUsers + pinned tie-break."""
    v = parsed[parsed["valid"] & parsed["username"].notna() & (parsed["username"] != "-")]
    g = (
        v.groupby("username", as_index=False)
        .agg(
            min_ip=("ip", "min"),
            request_count=("username", "size"),
            unique_ips=("ip", "nunique"),
            avg_rt_raw=("response_time_ms", "mean"),
            total_bytes=("response_size_bytes", "sum"),
            first_seen_us=("epoch_us", "min"),
            last_seen_us=("epoch_us", "max"),
        )
        .assign(avg_response_time=lambda d: ((d.avg_rt_raw + 0.5) // 1).astype(int))
        .drop(columns=["avg_rt_raw"])
        .sort_values(["request_count", "username"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return g


def status_hist(parsed: pd.DataFrame) -> pd.DataFrame:
    v = parsed[parsed["valid"]].copy()
    v["status_class"] = v["status_code"].map(status_class)
    return (
        v.groupby(["category", "status_class"], as_index=False)
        .size()
        .rename(columns={"size": "row_count"})
        .sort_values(["category", "status_class"])
        .reset_index(drop=True)
    )


def hourly_hist(parsed: pd.DataFrame) -> pd.DataFrame:
    """Dense 24-slot histogram per category (StatisticsService.java:126-143)."""
    v = parsed[parsed["valid"]].copy()
    v["hour"] = (v["epoch_us"] // 1_000_000 % 86400) // 3600
    base = (
        v.groupby(["category", "hour"], as_index=False).size().rename(columns={"size": "row_count"})
    )
    cats = sorted(v["category"].unique())
    dense = pd.MultiIndex.from_product([cats, range(24)], names=["category", "hour"]).to_frame(
        index=False
    )
    out = dense.merge(base, on=["category", "hour"], how="left").fillna({"row_count": 0})
    out["row_count"] = out["row_count"].astype(int)
    return out.sort_values(["category", "hour"]).reset_index(drop=True)
