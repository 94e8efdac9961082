"""Dev harness: verify the PRODUCTION DuckDB xxhash64 replay.

Runs ``__spark_entry__._xxhash64_pair_ctes`` — the encoder the oracle
SQL actually uses (chained CTEs, 32-bit-split multiplies; see its
docstring for why lateral aliases are not an option) — over a large id
range and diffs against the pure-Python model (itself verified against
live Spark in dev_xxhash_model.py). The fast per-commit tripwire is
tests/test_xxhash_oracle.py; this script is the wide-range soak.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))

if __name__ == "__main__":
    import duckdb

    import __spark_entry__ as entry
    from dev_xxhash_model import spark_xxhash64_long_int

    n = 200_000
    sql = (
        f"WITH ids AS (SELECT range AS id FROM range(0, {n})),\n"
        + entry._xxhash64_pair_ctes("ids", "id", seed=2014)
        + "\nSELECT id, hx FROM xh"
    )
    got = dict(duckdb.connect().execute(sql).fetchall())
    bad = [i for i in range(n) if got[i] != spark_xxhash64_long_int(i, 2014)]
    print("mismatches:", len(bad), bad[:5])

    # per-row seed column variant over a smaller grid
    sql2 = (
        "WITH ids AS (SELECT a.range AS id, 42 + b.range AS s"
        " FROM range(0, 2000) a CROSS JOIN range(0, 8) b),\n"
        + entry._xxhash64_pair_ctes("ids", "id", seed_col="s")
        + "\nSELECT id, s, hx FROM xh"
    )
    got2 = {(i, s): h for i, s, h in duckdb.connect().execute(sql2).fetchall()}
    bad2 = [
        k for k, h in got2.items() if h != spark_xxhash64_long_int(k[0], k[1])
    ]
    print("seed-col mismatches:", len(bad2), bad2[:5])
