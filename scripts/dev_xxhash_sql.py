"""Dev harness: DuckDB SQL emulation of Spark ``xxhash64(long_col, int_lit)``.

Chained CTEs (NOT lateral aliases — DuckDB's binder textually inlines
alias references, and the hash chain's repeated operands would blow the
expression tree up exponentially).  Each CTE step computes one hash
stage from bare columns of the previous CTE; multiplies are split into
32-bit halves so no intermediate exceeds INT128.

Verified here against the Python model (itself verified against live
Spark in dev_xxhash_model.py).
"""

import sys

sys.path.insert(0, "/root/repo/scripts")
from dev_xxhash_model import M, P1, P2, P3, P4, P5  # noqa: E402

MH = f"{M}::HUGEINT"
B32 = 1 << 32


def _mul(x: str, c: int) -> str:
    """(x*c) mod 2^64 in HUGEINT without overflow; x a bare column."""
    return (
        f"(({x} % {B32}::HUGEINT) * {c}::HUGEINT"
        f" + ((({x} // {B32}::HUGEINT) * {c}::HUGEINT) % {B32}::HUGEINT)"
        f" * {B32}::HUGEINT) % {MH}"
    )


def _rotl(x: str, r: int) -> str:
    return f"(({x} * {1 << r}::HUGEINT) % {MH} + {x} // {1 << (64 - r)}::HUGEINT)"


def _xorshr(x: str, r: int) -> str:
    """fmix xor-shift step: x ^ (x >> r), back to HUGEINT."""
    return (
        f"CAST(xor(CAST({x} AS UBIGINT), "
        f"CAST({x} // {1 << r}::HUGEINT AS UBIGINT)) AS HUGEINT)"
    )


def xxhash64_pair_ctes(src_cte: str, id_col: str, seed: int) -> str:
    """CTE chain ``x0..x9`` ending in ``xh(<carry cols>, hx BIGINT)``:
    Spark's ``F.xxhash64(F.col(id_col), F.lit(seed))`` — i.e.
    hashInt(seed, hashLong(id, 42)) — for every row of ``src_cte``.
    All of ``src_cte``'s columns are carried through."""
    C1 = (42 + P5 + 8) % M  # hashLong initial acc
    K = (seed * P1) % M  # hashInt's input mix, constant-folded
    C2 = (P5 + 4) % M  # hashInt length term
    steps = [
        # hashLong(id, 42): k1 = rotl(id*P2,31)*P1
        f"SELECT *, {_mul(f'CAST({id_col} AS HUGEINT)', P2)} AS t FROM {src_cte}",
        f"SELECT *, {_mul(_rotl('t', 31), P1)} AS k1 FROM x0",
        # acc = rotl(C1 ^ k1, 27)*P1 + P4, then fmix
        "SELECT *, CAST(xor(CAST(k1 AS UBIGINT), "
        f"{C1 % (1 << 64)}::UBIGINT) AS HUGEINT) AS u1 FROM x1",
        f"SELECT *, ({_mul(_rotl('u1', 27), P1)} + {P4}::HUGEINT) % {MH} AS u2 FROM x2",
        f"SELECT *, {_mul(_xorshr('u2', 33), P2)} AS u3 FROM x3",
        f"SELECT *, {_mul(_xorshr('u3', 29), P3)} AS u4 FROM x4",
        # hl = fmix out = hashLong result; hashInt(seed, hl):
        f"SELECT *, ({_xorshr('u4', 32)} + {C2}::HUGEINT) % {MH} AS g0 FROM x5",
        "SELECT *, CAST(xor(CAST(g0 AS UBIGINT), "
        f"{K}::UBIGINT) AS HUGEINT) AS g1 FROM x6",
        f"SELECT *, ({_mul(_rotl('g1', 23), P2)} + {P3}::HUGEINT) % {MH} AS g2 FROM x7",
        f"SELECT *, {_mul(_xorshr('g2', 33), P2)} AS g3 FROM x8",
        f"SELECT *, {_mul(_xorshr('g3', 29), P3)} AS g4 FROM x9",
    ]
    ctes = ",\n".join(f"x{i} AS ({s})" for i, s in enumerate(steps))
    fin = _xorshr("g4", 32)
    return (
        f"{ctes},\n"
        f"xh AS (SELECT *, CAST({fin} - CASE WHEN {fin} >= {1 << 63}::HUGEINT "
        f"THEN {MH} ELSE 0::HUGEINT END AS BIGINT) AS hx FROM x10)"
    )


if __name__ == "__main__":
    import duckdb

    from dev_xxhash_model import spark_xxhash64_long_int

    n = 200_000
    sql = (
        f"WITH ids AS (SELECT range AS id FROM range(0, {n})),\n"
        + xxhash64_pair_ctes("ids", "id", 2014)
        + "\nSELECT id, hx FROM xh"
    )
    got = dict(duckdb.connect().execute(sql).fetchall())
    bad = [i for i in range(n) if got[i] != spark_xxhash64_long_int(i, 2014)]
    print("mismatches:", len(bad), bad[:5])
