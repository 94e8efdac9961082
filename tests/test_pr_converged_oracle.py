"""Tripwire for the converged-PageRank oracle's calibration sentinel.

``oracle_sql()['pagerank_converged']`` unrolls the tol=1e-6 power
iteration to the kernel's measured sf0.01 stopping iteration
(PR_CONV_ITERS_SF001) and appends a sentinel marker row whenever the
unrolled deltas contradict that calibration — L1(r_k - r_{k-1}) >= tol
(not yet converged at k) or L1(r_{k-1} - r_{k-2}) < tol (the kernel
would have stopped earlier). This test proves, in DuckDB alone (no
Spark session), that the sentinel is quiet at the calibrated count and
fires loudly one step either side of it — so if the kernel's stopping
rule or the data ever drifts, the driver's correctness gate reports a
row-count mismatch naming the problem instead of a plausible result.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_SF001_DIR", "/root/testdata/sf0.01")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/lineitem.parquet"),
    reason="driver testdata not present",
)

_MARKER = "PR_CONV_ORACLE_STALE"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    yield c
    c.close()


def _markers(con, iters: int) -> tuple[int, int]:
    sql = entry._pr_unrolled(
        entry.DAMPING, iters, seeded=False, sentinel_tol=entry.PR_CONV_TOL
    )
    rows = con.execute(sql).fetchall()
    return len(rows), sum(1 for r in rows if r[0] == _MARKER)


def test_sentinel_quiet_at_calibrated_iteration(con):
    nrows, nmark = _markers(con, entry.PR_CONV_ITERS_SF001)
    assert nmark == 0
    assert nrows > 0


def test_sentinel_fires_one_step_early_and_late(con):
    for iters in (entry.PR_CONV_ITERS_SF001 - 1, entry.PR_CONV_ITERS_SF001 + 1):
        _, nmark = _markers(con, iters)
        assert nmark == 1, f"sentinel silent at miscalibrated iters={iters}"


def test_sentinel_requires_two_prior_steps():
    with pytest.raises(ValueError):
        entry._pr_unrolled(0.85, 1, seeded=False, sentinel_tol=1e-6)
