"""Keep the near-dup DuckDB oracle twins in lockstep with dedup.py.

The twins in __spark_entry__ replay dedup.py's signature arithmetic
(FNV polynomial shingle hash mod 2^64, affine Mersenne MinHash
permutations, majority-vote SimHash) in HUGEINT SQL. The driver's
correctness gate compares them against the real Spark queries at
sf=0.01 each round; this test is the cheap local tripwire — a pure
numpy replay of the UDF internals (importing _shingle_set itself, and
drawing the permutation constants from the same RandomState stream)
against the SQL on a planted-duplicate corpus, no Spark session needed.
If anyone changes the shingle prime, permutation seed, banding layout,
or block split on either side, this fails in milliseconds instead of at
the round gate.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry
from propagon_spark.functions.dedup import _MERSENNE, _shingle_set

BASE = (
    "the quick brown fox jumps over the lazy dog while the spark engine "
    "shuffles partitions across the cluster and the optimizer prunes "
    "columns from the parquet scan before the hash aggregate runs"
)
OTHER = (
    "completely different content about graph analytics pagerank "
    "iterations converging on sparse adjacency structures with salted "
    "hub vertices and checkpointed delta state for resumable runs"
)


def _corpus() -> pd.DataFrame:
    docs = {
        0: BASE,
        1: BASE.replace("lazy", "hazy"),  # near-dup of 0
        2: BASE.replace("lazy", "hazy").replace("quick", "quack"),  # chain 1~2
        3: BASE,  # exact dup of 0
        4: OTHER,
        5: OTHER[: len(OTHER) // 2] + " unrelated tail of tokens here",
        6: "tiny",  # below shingle_k=5: ineligible, must stay a singleton
        7: "zzzz qqqq xxxx wwww vvvv uuuu tttt ssss rrrr",
    }
    # pad with distinct filler docs so banding has non-trivial buckets
    rng = np.random.RandomState(7)
    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "theta"]
    for i in range(8, 30):
        docs[i] = " ".join(rng.choice(words, size=25))
    return pd.DataFrame(
        {"doc_id": list(docs), "text": [docs[k] for k in docs]}
    )


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("PRAGMA threads=2")
    c.register("documents_src", _corpus())
    c.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
    return c


def _np_signatures(docs: pd.DataFrame) -> dict[int, np.ndarray]:
    rng = np.random.RandomState(entry._MINHASH_SEED)
    a = rng.randint(1, _MERSENNE, size=entry._MINHASH_NUM, dtype=np.int64).astype(
        np.uint64
    )
    b = rng.randint(0, _MERSENNE, size=entry._MINHASH_NUM, dtype=np.int64).astype(
        np.uint64
    )
    elig = docs[docs.text.str.len() >= entry._SHINGLE_K]
    out = {}
    for doc_id, sh in zip(elig.doc_id, _shingle_set(elig.text, entry._SHINGLE_K)):
        with np.errstate(over="ignore"):
            v = (a[:, None] * sh[None, :] + b[:, None]) % np.uint64(_MERSENNE)
        out[int(doc_id)] = v.min(axis=1).astype(np.int64)
    return out


def _np_minhash_pairs(sigs: dict[int, np.ndarray]) -> pd.DataFrame:
    rows_per_band = entry._MINHASH_NUM // entry._MINHASH_BANDS
    buckets: dict[tuple, list[int]] = {}
    for doc, s in sigs.items():
        for band in range(entry._MINHASH_BANDS):
            key = (band, *s[band * rows_per_band : (band + 1) * rows_per_band])
            buckets.setdefault(key, []).append(doc)
    cand = set()
    for members in buckets.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cand.add((members[i], members[j]))
    rows = [
        (x, y, float((sigs[x] == sigs[y]).mean()))
        for x, y in sorted(cand)
        if (sigs[x] == sigs[y]).mean() >= entry.MINHASH_THRESHOLD
    ]
    return pd.DataFrame(rows, columns=["a", "b", "est_jaccard"])


def _np_simhashes(docs: pd.DataFrame) -> dict[int, int]:
    elig = docs[docs.text.str.len() >= entry._SHINGLE_K]
    bits = np.arange(64, dtype=np.uint64)
    out = {}
    for doc_id, sh in zip(elig.doc_id, _shingle_set(elig.text, entry._SHINGLE_K)):
        votes = (
            ((sh[:, None] >> bits[None, :]) & np.uint64(1))
            .astype(np.int64)
            .sum(axis=0)
        )
        sig = np.uint64(0)
        for j in np.nonzero(votes * 2 > len(sh))[0]:
            sig |= np.uint64(1) << np.uint64(j)
        out[int(doc_id)] = int(np.int64(sig.astype(np.int64)))
    return out


def test_minhash_twin_matches_numpy_replay(con):
    docs = _corpus()
    want = (
        _np_minhash_pairs(_np_signatures(docs))
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    got = (
        con.execute(entry._minhash_neardup_sql())
        .df()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # planted structure: 0~1~2 chain, 0~3 exact — the twin must find pairs
    assert len(want) >= 3, "corpus must plant minhash-visible duplicates"
    assert want.shape == got.shape
    assert (want.a.values == got.a.values).all()
    assert (want.b.values == got.b.values).all()
    assert np.array_equal(want.est_jaccard.values, got.est_jaccard.values)


def test_simhash_twin_matches_numpy_replay(con):
    docs = _corpus()
    sims = _np_simhashes(docs)
    items = sorted(sims.items())
    rows = []
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            (da, ha), (db, hb) = items[i], items[j]
            ua, ub = ha & ((1 << 64) - 1), hb & ((1 << 64) - 1)
            if not any(
                ((ua >> (16 * blk)) & 0xFFFF) == ((ub >> (16 * blk)) & 0xFFFF)
                for blk in range(4)
            ):
                continue
            ham = bin(ua ^ ub).count("1")
            if ham <= entry.SIMHASH_MAX_HAMMING:
                rows.append((da, db, ham))
    want = pd.DataFrame(rows, columns=["a", "b", "hamming"])
    got = (
        con.execute(entry._simhash_neardup_sql())
        .df()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(want) >= 2, "corpus must plant simhash-visible duplicates"
    assert want.shape == got.shape
    assert (want.values == got.values).all()


def test_clusters_twin_transitive_closure_and_singletons(con):
    got = (
        con.execute(entry._neardup_clusters_sql())
        .df()
        .set_index("doc_id")
    )
    assert len(got) == 30  # every doc present, even the ineligible one
    # 0,1,2,3 must form one cluster via transitivity (0~1, 1~2, 0~3)
    reps = {got.loc[str(d)].cluster_rep for d in (0, 1, 2, 3)}
    assert reps == {"0"}
    assert int(got.loc["0"].cluster_size) == 4
    # the sub-shingle doc is its own singleton
    assert got.loc["6"].cluster_rep == "6"
    assert int(got.loc["6"].cluster_size) == 1
    # representative is the lexicographically (string) smallest member
    member_sets: dict[str, list[str]] = {}
    for doc_id, row in got.iterrows():
        member_sets.setdefault(row.cluster_rep, []).append(doc_id)
    for rep, members in member_sets.items():
        assert rep == min(members)
        for m in members:
            assert int(got.loc[m].cluster_size) == len(members)
