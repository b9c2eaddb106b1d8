"""Property-based fuzz: the vectorized parse (Series.str ops over
batches) must agree with the naive per-row oracle (plain re.match +
scalar Python) on ARBITRARY input lines — well-formed, mutated, and
garbage. The two implementations share no code path, so agreement
pins the semantics."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from logparser_spark import oracle
from logparser_spark.functions.parse import parse_lines

FIELD_COLS = [
    "valid", "reject_reason", "epoch_us", "ip", "username", "url",
    "domain", "status_code", "response_time_ms", "response_size_bytes",
    "action", "http_method",
]


def assert_parse_agrees(lines: list[str]) -> None:
    got = parse_lines(pd.Series(lines, dtype=object))
    want = oracle.parse_frame(pd.Series(lines, dtype=object))
    for col in FIELD_COLS:
        g = got[col].astype("object").where(got[col].notna(), None)
        w = want[col].astype("object").where(want[col].notna(), None)
        gl = [int(v) if isinstance(v, bool) else v for v in g.tolist()]
        wl = [int(v) if isinstance(v, bool) else v for v in w.tolist()]
        assert gl == wl, (col, lines)


token = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=12
)
# spans the int32/int64 overflow boundaries (reference rejects there)
num = st.one_of(
    st.integers(0, 10**12),
    st.integers(2**31 - 2, 2**31 + 2),
    st.integers(2**63 - 2, 2**63 + 2),
    st.integers(10**20, 10**25),
).map(str)
ts = st.builds(
    lambda a, b: f"{a}.{b:03d}",
    st.one_of(st.integers(0, 2**31), st.integers(9223372036850, 9223372036860), st.integers(10**15, 10**18)),
    st.integers(0, 999),
)
ip = st.builds(
    lambda a, b, c, d: f"{a}.{b}.{c}.{d}", *[st.integers(0, 255)] * 4
)
action = st.sampled_from(
    ["TCP_MISS", "TCP_HIT/200", "TCP_DENIED", "TCP_DENIED/403", "NONE",
     "TCP_TUNNEL/200", "X/12", "lower_case", "TCP_MISS/99"]
)
url = st.sampled_from(
    ["-", "http://a.b/c", "a.b:443", "https://x.y:8443/p/1", "no slash", "http://"]
)
uname = st.sampled_from(["-", "admin", "user1", "a_b_c", "x_y", "USER_X", "_ _", "__"])

wellformed = st.builds(
    lambda t, rt, i, a, b, m, u, un, h, c: " ".join([t, rt, i, a, b, m, u, un, h, c]),
    ts, num, ip, action, num, token, url, uname, token, token,
)
# Unicode digits (Nd) and non-ASCII whitespace are excluded: Python re's
# \d/\s are Unicode-aware while the production engine's RE2 (and the
# Java reference's Pattern, and the DuckDB oracle) are ASCII-only — the
# deliberate divergence is pinned by test_unicode_digit_lines_quarantine.
garbage = st.text(
    alphabet=st.characters(
        exclude_categories=("Nd", "Zs", "Zl", "Zp"), include_characters=" 0123456789"
    ),
    max_size=60,
)
mutated = wellformed.flatmap(
    lambda s: st.integers(0, max(len(s) - 1, 0)).map(lambda i: s[:i])
)
line = st.one_of(wellformed, garbage, mutated)


@settings(max_examples=300, deadline=None)
@given(st.lists(line, min_size=1, max_size=20))
def test_vectorized_parse_agrees_with_oracle(lines):
    assert_parse_agrees(lines)


def test_unicode_digit_lines_quarantine():
    """A line whose numeric fields use Unicode digits (e.g. Arabic-Indic)
    must quarantine: RE2's ASCII \\d matches the Java reference's
    Pattern default (and the DuckDB oracle), where Python re would have
    accepted it. This is the one documented engine divergence."""
    line = "١٧٠٩.١٢٣ ٥ ١.٢.٣.٤ TCP_MISS/٢٠٠ ٩ GET http://a/ user1 D t"
    out = parse_lines(pd.Series([line], dtype=object)).iloc[0]
    assert out["valid"] == 0
    assert out["reject_reason"] == "regex_mismatch"


def test_known_edge_cases():
    assert_parse_agrees(
        [
            "",
            " ",
            "1709251200.000 5 10.0.0.1 TCP_MISS/200 99 GET http://a.b/c user1 DIRECT/1.2.3.4 text/html",
            "1709251200.5 5 10.0.0.1 TCP_MISS 99 GET - a_b_c DIRECT/- -",  # statusless + '-' url
            "1709251200.000 5 10.0.0.1 TCP_DENIED 99 GET a.b:443 admin DIRECT/- -",  # invalid uname
            "not_a_ts 5 10.0.0.1 TCP_MISS/200 99 GET http://a.b/c user1 DIRECT/- -",
            "1709251200.000 5 10.0.0.1 TCP_MISS/200 99 GET http://a.b/c user1 DIRECT/-",  # 10 fields
            "99999999999.999 1 1.2.3.4 A_B/123 0 CONNECT h:1 __x__ n -",  # big epoch
        ]
    )
