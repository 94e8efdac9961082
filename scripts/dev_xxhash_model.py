"""Dev harness: pin down Spark's ``xxhash64(long_col, int_lit)`` chain.

Spark's ``F.xxhash64(a, b)`` folds children left-to-right with seed 42:
``hashInt(b, hashLong(a, 42))`` when a is LongType and b IntegerType
(sql/catalyst XxHash64 / XXH64.hashLong / XXH64.hashInt).  This script
verifies a pure-Python mod-2^64 model against a live Spark session so the
DuckDB oracle encoder (``__spark_entry__._xxhash64_pair_ctes``) can be
trusted; dev_xxhash_sql.py and tests/test_xxhash_oracle.py close the
model↔SQL leg.

Run:  python3 scripts/dev_xxhash_model.py        # model only (no Spark)
      python3 scripts/dev_xxhash_model.py spark  # + live Spark check
"""

import sys

M = 1 << 64
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) % M


def fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) % M
    h ^= h >> 29
    h = (h * P3) % M
    h ^= h >> 32
    return h


def hash_long(inp: int, seed: int) -> int:
    h = (seed + P5 + 8) % M
    k1 = (rotl((inp % M) * P2 % M, 31) * P1) % M
    h ^= k1
    h = (rotl(h, 27) * P1 + P4) % M
    return fmix(h)


def hash_int(inp: int, seed: int) -> int:
    h = (seed + P5 + 4) % M
    h ^= ((inp & 0xFFFFFFFF) * P1) % M
    h = (rotl(h, 23) * P2 + P3) % M
    return fmix(h)


def spark_xxhash64_long_int(id_val: int, lit_val: int) -> int:
    """Signed-long result of F.xxhash64(F.col(long), F.lit(int32))."""
    u = hash_int(lit_val, hash_long(id_val, 42))
    return u - M if u >= (1 << 63) else u


if __name__ == "__main__":
    ids = list(range(20)) + [10**6, 2**40, -5]
    model = {i: spark_xxhash64_long_int(i, 2014) for i in ids}
    for i, v in model.items():
        print(f"model id={i} -> {v}")
    if "spark" in sys.argv[1:]:
        from pyspark.sql import SparkSession, functions as F

        spark = (
            SparkSession.builder.master("local[1]")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "1g")
            .getOrCreate()
        )
        df = spark.createDataFrame([(i,) for i in ids], "id long")
        got = {
            r["id"]: r["h"]
            for r in df.select(
                "id", F.xxhash64(F.col("id"), F.lit(2014)).alias("h")
            ).collect()
        }
        bad = [i for i in ids if got[i] != model[i]]
        print("MISMATCHES:", bad if bad else "none — model exact")
        spark.stop()
