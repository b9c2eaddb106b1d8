"""Table-driven unit tests for P1-P5 semantics (SURVEY.md §5 item 4),
checking the vectorized parser and the per-row oracle agree with
hand-computed expectations on every branch of the reference logic."""

import pandas as pd
import pytest

from logparser_spark.functions.parse import parse_lines
from logparser_spark import oracle

L = "1709251200.500 250 10.0.3.17 {act} 5120 GET {url} {user} DIRECT/1.2.3.4 text/html"

CASES = [
    # (line, valid, status, domain, reason)
    (L.format(act="TCP_MISS/200", url="http://example.com/p", user="user1"), True, 200, "example.com", None),
    (L.format(act="TCP_MISS/200", url="http://example.com/p", user="USERx"), True, 200, "example.com", None),  # case-insens 'user'
    (L.format(act="TCP_MISS/200", url="http://example.com/p", user="a_b_c"), True, 200, "example.com", None),  # 2 underscores
    (L.format(act="TCP_MISS/200", url="http://example.com/p", user="a_b"), False, None, None, "invalid_username"),
    (L.format(act="TCP_MISS/200", url="http://example.com/p", user="-"), False, None, None, "invalid_username"),
    (L.format(act="TCP_MISS/200", url="http://example.com/p", user="admin"), False, None, None, "invalid_username"),
    # status fallback heuristics (LogFileParser.java:1127-1145)
    (L.format(act="TCP_DENIED", url="http://example.com/p", user="user1"), True, 403, "example.com", None),
    (L.format(act="TCP_MISS", url="http://example.com/p", user="user1"), True, 200, "example.com", None),
    (L.format(act="TCP_HIT", url="http://example.com/p", user="user1"), True, 200, "example.com", None),
    (L.format(act="TCP_TUNNEL", url="http://example.com/p", user="user1"), True, 200, "example.com", None),
    (L.format(act="TCP_REFRESH_MODIFIED", url="http://example.com/p", user="user1"), True, 200, "example.com", None),
    (L.format(act="NONE", url="http://example.com/p", user="user1"), True, 0, "example.com", None),
    # domain extraction branches (LogParserUtils.java:30-40)
    (L.format(act="TCP_MISS/200", url="https://h.io:8443/a/b", user="user1"), True, 200, "h.io", None),
    (L.format(act="TCP_MISS/200", url="h.io:443", user="user1"), True, 200, "h.io", None),
    (L.format(act="TCP_MISS/200", url="h.io/bare", user="user1"), True, 200, "h.io", None),
    (L.format(act="TCP_MISS/200", url="-", user="user1"), True, 200, "", None),
    # malformed
    ("GARBAGE not a log line", False, None, None, "regex_mismatch"),
    ("", False, None, None, "regex_mismatch"),
    ("1709251200 250 10.0.3.17 TCP_MISS/200 5120 GET u p D t", False, None, None, "regex_mismatch"),  # ts missing .frac
]


@pytest.mark.parametrize("line,valid,status,domain,reason", CASES)
def test_vectorized_matches_expectation(line, valid, status, domain, reason):
    out = parse_lines(pd.Series([line])).iloc[0]
    assert bool(out["valid"]) == valid
    if valid:
        assert out["status_code"] == status
        assert out["domain"] == domain
    else:
        assert out["reject_reason"] == reason


@pytest.mark.parametrize("line,valid,status,domain,reason", CASES)
def test_oracle_matches_expectation(line, valid, status, domain, reason):
    r = oracle.parse_line(line)
    assert r.valid == valid
    if valid:
        assert r.status_code == status
        assert r.domain == domain
    else:
        assert r.reject_reason == reason


def test_timestamp_microseconds():
    out = parse_lines(pd.Series(["1709251200.123 1 1.2.3.4 TCP_MISS/200 9 GET http://a/ user1 D t"]))
    assert out.iloc[0]["epoch_us"] == 1709251200_123000
    r = oracle.parse_line("1709251200.123 1 1.2.3.4 TCP_MISS/200 9 GET http://a/ user1 D t")
    assert r.epoch_us == 1709251200_123000


def test_arrow_engine_equals_pandas_engine(tiny_lines):
    """The Arrow/RE2 hot path and the pandas/Python-re reference twin
    must agree exactly on contract inputs (printable ASCII), including
    every reject branch and the overflow/timestamp bound edges."""
    from logparser_spark.functions.parse import parse_lines_pandas

    edges = pd.Series(
        [
            "",  # empty -> regex_mismatch
            "CORRUPT 1 @@@",
            "1709251200.123 truncated",
            # overflow bounds, exact and +1
            "1.0 2147483647 1.2.3.4 TCP_HIT/200 5 GET http://a/ user1 D t",
            "1.0 2147483648 1.2.3.4 TCP_HIT/200 5 GET http://a/ user1 D t",
            "1.0 5 1.2.3.4 TCP_HIT/200 9223372036854775807 GET http://a/ user1 D t",
            "1.0 5 1.2.3.4 TCP_HIT/200 9223372036854775808 GET http://a/ user1 D t",
            "9223372036853.999 5 1.2.3.4 TCP_HIT/200 5 GET http://a/ user1 D t",
            "9223372036854.000 5 1.2.3.4 TCP_HIT/200 5 GET http://a/ user1 D t",
            # leading zeros must not defeat the bound checks
            "0000000001.5 0002147483648 1.2.3.4 TCP_HIT/200 5 GET http://a/ user1 D t",
            # overflow + invalid username: precedence -> numeric_overflow
            "1.0 2147483648 1.2.3.4 TCP_HIT/200 5 GET http://a/ - D t",
            # bad ts + invalid username: precedence -> invalid_username
            "9223372036854.0 5 1.2.3.4 TCP_HIT/200 5 GET http://a/ admin D t",
            # status fallback branches
            "1.0 5 1.2.3.4 TCP_DENIED 5 GET http://a/ user1 D t",
            "1.0 5 1.2.3.4 NONE 5 GET http://a/ user1 D t",
            # domain forms
            "1.0 5 1.2.3.4 TCP_HIT/200 5 GET site:443 user1 D t",
            "1.0 5 1.2.3.4 TCP_HIT/200 5 GET - user1 D t",
            # multi-space separators (\\s+)
            "1.5   7  1.2.3.4  TCP_HIT/200  5  GET  http://a/b  x_y_z  D  t",
        ],
        dtype=object,
    )
    sample = pd.concat(
        [tiny_lines["line"].head(3000), edges], ignore_index=True
    ).astype(object)
    a = parse_lines(sample)
    b = parse_lines_pandas(sample)
    for col in a.columns:
        av = a[col].astype("object").where(a[col].notna(), "&N")
        bv = b[col].astype("object").where(b[col].notna(), "&N")
        mism = (av != bv).sum()
        assert mism == 0, f"{col}: {mism} mismatches"


def test_vectorized_equals_oracle_on_fixture_sample(tiny_lines):
    sample = tiny_lines["line"].head(2000).reset_index(drop=True)
    vec = parse_lines(sample)
    ora = oracle.parse_frame(sample)
    for col in ["valid", "epoch_us", "ip", "username", "url", "domain",
                "status_code", "response_time_ms", "response_size_bytes", "action"]:
        v = vec[col]
        o = ora[col]
        if col == "valid":
            v = v.astype(bool)
        mism = (v.fillna("&N") != o.fillna("&N")).sum() if v.dtype == object else (
            v.astype("object").fillna("&N") != o.astype("object").fillna("&N")
        ).sum()
        assert mism == 0, f"{col}: {mism} mismatches"
