"""Deterministic, parallelism-independent randomness primitives.

Spark's ``F.rand(seed)`` assigns its substream PER PARTITION, so any
repartition/parallelism change reshuffles every draw — unusable both for
cross-run determinism at different cluster widths and for SQL-oracle
replay. Every sampled/random code path in this engine instead derives
its draws from ``xxhash64(key, seed)`` over a STABLE key (vertex id,
edge id pair, draw index): deterministic at any parallelism, JVM-side
(whole-stage codegen, no Python), and bit-exactly replayable in DuckDB
via the ``_xxhash64_pair_ctes`` CTE chain in ``__spark_entry__.py``.

Reference RNG parity: the reference uses seeded Xoshiro streams
(``dataset/resample.rs:39-44``, ``algos/birank.rs:196-199``); see
:mod:`propagon_spark.xoshiro` for the replay of those exact streams.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: canonical interned ids are < 2^31 (canon.py/ids.py), so
#: ``src * PAIR_KEY_BASE + dst`` is a collision-free non-negative int64
#: edge key — one hashable long, replayable by the existing
#: xxhash64(long, lit-int32) oracle model.
PAIR_KEY_BASE = 1 << 31


def hash_uniform01(key: Column, seed: int) -> Column:
    """Uniform [0, 1) double from ``xxhash64(key, seed)``.

    ``hx / 2^64 + 0.5`` maps the signed int64 hash onto [0, 1) with one
    exact power-of-two scale; int64→double rounding is IEEE
    round-to-nearest in both the JVM and DuckDB, so the value is
    bit-identical across engines. PRECONDITION (for oracle replay):
    ``key`` non-negative — DuckDB's ``%``/``//`` truncate toward zero
    and diverge from two's-complement wrap on negatives."""
    return F.xxhash64(key, F.lit(seed)) / F.lit(float(2**64)) + F.lit(0.5)


def edge_key(src: Column, dst: Column) -> Column:
    """Stable per-edge int64 key for hash-derived draws (see
    :data:`PAIR_KEY_BASE`)."""
    return src * F.lit(PAIR_KEY_BASE) + dst
