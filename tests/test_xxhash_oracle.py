"""Keep the DuckDB xxhash64 replay in lockstep with Spark.

``__spark_entry__._xxhash64_pair_ctes`` replays Spark's
``F.xxhash64(long_col, F.lit(int32))`` — hashInt(lit, hashLong(col, 42))
— in HUGEINT/UBIGINT SQL so the harmonic_sampled source draw and the
exact-bootstrap row draws get exact oracles. Three tripwires:

1. the pure-Python model == live Spark (pins the semantics);
2. the DuckDB CTE chain (constant seed) == the model (pins the SQL);
3. the per-row-seed variant == the model across replicate seeds.

If Spark ever changes its hash (it won't — on-disk bucketing depends on
it) or anyone edits the SQL encoding, this fails in milliseconds.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as entry  # noqa: E402
from dev_xxhash_model import spark_xxhash64_long_int  # noqa: E402

IDS = list(range(64)) + [999, 10**6, 2**31, 2**40, 2**62, -1, -5, -(2**40)]


def test_model_matches_spark(spark):
    df = spark.createDataFrame([(i,) for i in IDS], "id long")
    got = {
        r["id"]: r["h"]
        for r in df.select(
            "id", F.xxhash64(F.col("id"), F.lit(2014)).alias("h")
        ).collect()
    }
    for i in IDS:
        assert got[i] == spark_xxhash64_long_int(i, 2014), i


def test_duckdb_chain_matches_model_const_seed():
    # non-negative ids only: the oracle hashes dense vocab ranks / draw
    # indexes, both >= 0 (the SQL casts through UBIGINT)
    ids = [i for i in IDS if i >= 0]
    vals = ", ".join(f"({i})" for i in ids)
    sql = (
        f"WITH ids(id) AS (VALUES {vals}),\n"
        + entry._xxhash64_pair_ctes("ids", "id", seed=2014)
        + "\nSELECT id, hx FROM xh"
    )
    got = dict(duckdb.connect().execute(sql).fetchall())
    for i in ids:
        assert got[i] == spark_xxhash64_long_int(i, 2014), i


def test_duckdb_chain_matches_model_seed_col():
    ids = [i for i in IDS if i >= 0]
    rows = [(i, s) for i in ids for s in (42, 43, 49, 2014)]
    vals = ", ".join(f"({i}, {s})" for i, s in rows)
    sql = (
        f"WITH ids(id, s) AS (VALUES {vals}),\n"
        + entry._xxhash64_pair_ctes("ids", "id", seed_col="s")
        + "\nSELECT id, s, hx FROM xh"
    )
    got = {(i, s): h for i, s, h in duckdb.connect().execute(sql).fetchall()}
    for i, s in rows:
        assert got[(i, s)] == spark_xxhash64_long_int(i, s), (i, s)


def test_exact_percentile_is_type7():
    # bootstrap.py switched percentile_approx -> F.percentile; the twin
    # uses DuckDB quantile_cont. Both must be type-7 interpolation:
    # pos = p*(n-1) over the sorted values.
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    q = duckdb.connect().execute(
        "SELECT quantile_cont(v, 0.025), quantile_cont(v, 0.975) FROM "
        f"(VALUES {', '.join(f'({v}::DOUBLE)' for v in vals)}) t(v)"
    ).fetchone()
    sv = sorted(vals)

    def type7(p):
        pos = p * (len(sv) - 1)
        lo, frac = int(pos), pos - int(pos)
        return sv[lo] + frac * (sv[min(lo + 1, len(sv) - 1)] - sv[lo])

    assert q[0] == pytest.approx(type7(0.025), abs=1e-12)
    assert q[1] == pytest.approx(type7(0.975), abs=1e-12)


def test_spark_percentile_is_type7(spark):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    lo, hi = df.select(
        F.percentile("v", F.lit(0.025)), F.percentile("v", F.lit(0.975))
    ).first()
    sv = sorted(vals)

    def type7(p):
        pos = p * (len(sv) - 1)
        i, frac = int(pos), pos - int(pos)
        return sv[i] + frac * (sv[min(i + 1, len(sv) - 1)] - sv[i])

    assert lo == pytest.approx(type7(0.025), abs=1e-12)
    assert hi == pytest.approx(type7(0.975), abs=1e-12)
