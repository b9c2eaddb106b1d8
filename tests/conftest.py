import shutil
import sys

import pytest

sys.path.insert(0, "/root/repo")

from logparser_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="logparser-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_input(tmp_path_factory):
    """10k-row raw_sequences fixture, generated once per test session."""
    from logparser_spark.fixtures import write_raw_sequences

    out = tmp_path_factory.mktemp("fixtures")
    path = write_raw_sequences(str(out), 10_000, files=8)
    yield path
    shutil.rmtree(out, ignore_errors=True)


@pytest.fixture(scope="session")
def tiny_lines():
    """The same 10k rows as decoded lines + doc_id/source ground truth
    (regenerated independently of the parquet encode path)."""
    import pandas as pd

    from logparser_spark.fixtures import generate_lines

    parts = []
    per = 10_000 // 8
    for f in range(8):
        pdf = generate_lines(per, seed=42 + f * 1000)
        pdf["doc_id"] = [f"doc-{f:03d}-{i:09d}" for i in range(per)]
        parts.append(pdf)
    return pd.concat(parts, ignore_index=True)
