"""Shared Spark fixture + the reference's replayed graph fixtures.

The fixture corpus mirrors the reference's own test inputs exactly
(FIXTURES.md §2); each test module pins the reference's expected numbers.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from propagon_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("PROPAGON_SHUFFLE_PARTITIONS", "4")
    # AQE off for tests: its per-query re-planning overhead dominates on
    # tiny fixture graphs (production default in session.py keeps it on)
    s = get_spark(
        app_name="propagon-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    yield s
    s.stop()


def make_edges(spark, rows, weights=False):
    """rows: list of (src, dst) or (src, dst, w) tuples with string names."""
    if weights:
        return spark.createDataFrame(
            [(a, b, float(w)) for a, b, w in rows],
            "src string, dst string, weight double",
        )
    return spark.createDataFrame(
        [(a, b) for a, b in rows], "src string, dst string"
    )


@pytest.fixture(scope="session")
def small_graph_rows():
    # clients/python/tests/conftest.py:24-29 — (a,b),(b,c),(c,a),(a,c),(b,a)
    return [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("b", "a")]


def scores_dict(df):
    """Collect a (name, score) frame to {name: score}."""
    return {r["name"]: r["score"] for r in df.collect()}
