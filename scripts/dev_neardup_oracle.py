"""Dev validator for the MinHash/SimHash/cluster DuckDB oracles.

The near-dup Spark paths (functions/dedup.py) are pure deterministic
integer arithmetic end-to-end — FNV-style degree-4 polynomial shingle
hash mod 2^64, affine (a*x+b) mod 2^64 mod (2^61-1) MinHash permutations
with RandomState(42) constants, majority-vote SimHash — so DuckDB can
run EXACT twins via HUGEINT modular arithmetic, the same trick as the
doc_fingerprint oracle. The only non-emulatable op, xxhash64 band
bucketing, is an implementation detail: the output pair set depends
only on "some band's 4 signature values are all equal", which the twin
tests directly (a 64-bit xxhash collision between unequal band slices
is the sole divergence mode, probability ~n^2/2^64).

This script cross-checks the SQL twins against a pure-numpy replay of
dedup.py's logic (importing its own _shingle_set so the shingle universe
is identical by construction) on the driver parquet corpora. Run:

    nice -n 19 python3 scripts/dev_neardup_oracle.py /root/testdata/sf0.001
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from propagon_spark.functions.dedup import _MERSENNE, _shingle_set  # noqa: E402

P = 1099511628211  # FNV prime used by _shingle_set
M64 = 1 << 64
NUM_HASHES, SHINGLE_K, BANDS, SEED = 64, 5, 16, 42
ROWS_PER_BAND = NUM_HASHES // BANDS
MINHASH_THRESHOLD = 0.5
SIMHASH_MAX_HAMMING = 8


def _perm_constants() -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(SEED)
    a = rng.randint(1, _MERSENNE, size=NUM_HASHES, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=NUM_HASHES, dtype=np.int64).astype(np.uint64)
    return a, b


# ---------------------------------------------------------------- numpy truth


def np_signatures(docs: pd.DataFrame) -> dict[int, np.ndarray]:
    """doc_id -> 64-long minhash signature, replaying _minhash_udf."""
    a, b = _perm_constants()
    elig = docs[docs.text.str.len() >= SHINGLE_K]
    out = {}
    shingles = _shingle_set(elig.text, SHINGLE_K)
    for doc_id, sh in zip(elig.doc_id, shingles):
        if len(sh) == 0:
            out[int(doc_id)] = np.zeros(NUM_HASHES, dtype=np.int64)
            continue
        with np.errstate(over="ignore"):
            v = (a[:, None] * sh[None, :] + b[:, None]) % np.uint64(_MERSENNE)
        out[int(doc_id)] = v.min(axis=1).astype(np.int64)
    return out


def np_minhash_pairs(sigs: dict[int, np.ndarray]) -> pd.DataFrame:
    buckets: dict[tuple, list[int]] = {}
    for doc, s in sigs.items():
        for band in range(BANDS):
            key = (band, *s[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND])
            buckets.setdefault(key, []).append(doc)
    cand = set()
    for members in buckets.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cand.add((members[i], members[j]))
    rows = []
    for x, y in sorted(cand):
        est = float((sigs[x] == sigs[y]).mean())
        if est >= MINHASH_THRESHOLD:
            rows.append((x, y, est))
    return pd.DataFrame(rows, columns=["a", "b", "est_jaccard"])


def np_simhashes(docs: pd.DataFrame) -> dict[int, int]:
    """doc_id -> signed 64-bit simhash, replaying _simhash_udf."""
    elig = docs[docs.text.str.len() >= SHINGLE_K]
    bits = np.arange(64, dtype=np.uint64)
    out = {}
    for doc_id, sh in zip(elig.doc_id, _shingle_set(elig.text, SHINGLE_K)):
        if len(sh) == 0:
            out[int(doc_id)] = 0
            continue
        votes = ((sh[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64).sum(axis=0)
        sig = np.uint64(0)
        for j in np.nonzero(votes * 2 > len(sh))[0]:
            sig |= np.uint64(1) << np.uint64(j)
        out[int(doc_id)] = int(np.int64(sig.astype(np.int64)))
    return out


def np_simhash_pairs(sims: dict[int, int]) -> pd.DataFrame:
    items = sorted(sims.items())
    rows = []
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            (da, ha), (db, hb) = items[i], items[j]
            ua, ub = ha & (M64 - 1), hb & (M64 - 1)
            shares = any(
                ((ua >> (16 * blk)) & 0xFFFF) == ((ub >> (16 * blk)) & 0xFFFF)
                for blk in range(4)
            )
            if not shares:
                continue
            ham = bin(ua ^ ub).count("1")
            if ham <= SIMHASH_MAX_HAMMING:
                rows.append((da, db, ham))
    return pd.DataFrame(rows, columns=["a", "b", "hamming"])


def np_clusters(docs: pd.DataFrame, pairs: pd.DataFrame) -> pd.DataFrame:
    """Union-find over string ids; rep = min string id (vocab name order)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.a, pairs.b):
        ra, rb = find(str(a)), find(str(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members: dict[str, list[str]] = {}
    for x in list(parent):
        members.setdefault(find(x), []).append(x)
    rows = []
    covered = {}
    for rep, ms in members.items():
        rep = min(ms)
        for m in ms:
            covered[m] = (rep, len(ms))
    for doc in docs.doc_id:
        d = str(doc)
        rep, sz = covered.get(d, (d, 1))
        rows.append((d, rep, sz))
    return pd.DataFrame(rows, columns=["doc_id", "cluster_rep", "cluster_size"])


# ---------------------------------------------------------------- SQL twins


def _shingle_cte(table: str = "documents") -> str:
    """CTEs: eligible docs -> distinct 5-byte-window FNV hashes (HUGEINT).

    Horner over ord(substr(...)) — identical to UTF-8 bytes on the
    all-ASCII driver corpus (0 multibyte docs at every sf, same
    precondition the doc_fingerprint oracle documents).
    """
    m = "18446744073709551616::HUGEINT"
    expr = "ord(substr(text, i, 1))::HUGEINT"
    for j in range(1, SHINGLE_K):
        expr = f"(({expr}) * {P}::HUGEINT + ord(substr(text, i+{j}, 1))::HUGEINT) % {m}"
    return f"""elig AS (
    SELECT doc_id, text FROM {table} WHERE length(text) >= {SHINGLE_K}),
w AS (
    SELECT e.doc_id, e.text, t.i
    FROM elig e,
         LATERAL (SELECT unnest(range(1, length(e.text) - {SHINGLE_K - 2})) AS i) t),
sh AS (
    SELECT DISTINCT doc_id, ({expr}) AS hu FROM w)"""


def _minhash_ctes(table: str = "documents") -> str:
    """Shared CTE chain ending in ``est(a, b, est_jaccard)`` — thresholded
    MinHash near-dup pairs over exact band-slice equality (the xxhash64
    bucket key in the Spark path is semantically a hash of that 4-tuple)."""
    a, b = _perm_constants()
    m = "18446744073709551616::HUGEINT"
    perms = ",\n        ".join(
        f"({i}, {int(a[i])}::HUGEINT, {int(b[i])}::HUGEINT)"
        for i in range(NUM_HASHES)
    )
    band_cols = ",\n           ".join(
        f"MIN(CASE WHEN idx % {ROWS_PER_BAND} = {r} THEN v END) AS v{r}"
        for r in range(ROWS_PER_BAND)
    )
    band_keys = ", ".join(f"v{r}" for r in range(ROWS_PER_BAND))
    return f"""{_shingle_cte(table)},
perms(idx, pa, pb) AS (
    VALUES {perms}),
mh AS (
    SELECT sh.doc_id, p.idx,
           CAST(MIN((((p.pa * sh.hu) % {m} + p.pb) % {m})
                    % {_MERSENNE}::HUGEINT) AS BIGINT) AS v
    FROM sh CROSS JOIN perms p
    GROUP BY sh.doc_id, p.idx),
bnd AS (
    SELECT doc_id, idx // {ROWS_PER_BAND} AS band,
           {band_cols}
    FROM mh GROUP BY doc_id, idx // {ROWS_PER_BAND}),
cand AS (
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM bnd x JOIN bnd y USING (band, {band_keys})
    WHERE x.doc_id < y.doc_id),
est AS (
    SELECT c.a, c.b,
           SUM(CASE WHEN ma.v = mb.v THEN 1 ELSE 0 END) / {NUM_HASHES}.0
               AS est_jaccard
    FROM cand c
    JOIN mh ma ON ma.doc_id = c.a
    JOIN mh mb ON mb.doc_id = c.b AND mb.idx = ma.idx
    GROUP BY c.a, c.b
    HAVING est_jaccard >= {MINHASH_THRESHOLD})"""


def minhash_pairs_sql(table: str = "documents") -> str:
    return f"""WITH {_minhash_ctes(table)}
SELECT a, b, est_jaccard FROM est"""


def simhash_pairs_sql(table: str = "documents") -> str:
    m = "18446744073709551616::HUGEINT"
    pows = ",\n        ".join(f"({i}, {1 << i}::HUGEINT)" for i in range(64))
    pow16 = ",\n        ".join(f"({i}, {1 << (16 * i)}::HUGEINT)" for i in range(4))
    return f"""WITH {_shingle_cte(table)},
nsh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
pw(bit, p2) AS (
    VALUES {pows}),
votes AS (
    SELECT sh.doc_id, pw.bit, pw.p2,
           SUM(CASE WHEN (sh.hu // pw.p2) % 2 = 1 THEN 1 ELSE 0 END) AS v
    FROM sh CROSS JOIN pw GROUP BY sh.doc_id, pw.bit, pw.p2),
sigu AS (
    SELECT v.doc_id,
           SUM(CASE WHEN v.v * 2 > n.n THEN v.p2 ELSE 0::HUGEINT END) AS su
    FROM votes v JOIN nsh n USING (doc_id) GROUP BY v.doc_id),
sigs AS (
    SELECT doc_id, su,
           CAST(CASE WHEN su >= 9223372036854775808::HUGEINT
                     THEN su - {m} ELSE su END AS BIGINT) AS sim
    FROM sigu),
blk(blk, p16) AS (
    VALUES {pow16}),
blocks AS (
    SELECT s.doc_id, s.sim, b.blk,
           CAST((s.su // b.p16) % 65536 AS BIGINT) AS key
    FROM sigs s CROSS JOIN blk b),
cand AS (
    SELECT DISTINCT x.doc_id AS a, x.sim AS ha, y.doc_id AS b, y.sim AS hb
    FROM blocks x JOIN blocks y ON x.blk = y.blk AND x.key = y.key
    WHERE x.doc_id < y.doc_id)
SELECT a, b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {SIMHASH_MAX_HAMMING}"""


def neardup_clusters_sql(table: str = "documents") -> str:
    return f"""WITH RECURSIVE {_minhash_ctes(table)},
prs AS MATERIALIZED (
    SELECT CAST(a AS VARCHAR) AS a, CAST(b AS VARCHAR) AS b FROM est),
se AS MATERIALIZED (
    SELECT a AS s, b AS d FROM prs UNION SELECT b, a FROM prs),
vx AS (SELECT DISTINCT s AS id FROM se),
reach(id, r) AS (
    SELECT id, id FROM vx
    UNION
    SELECT se.d, reach.r FROM reach JOIN se ON se.s = reach.id),
comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS sz
          FROM comp GROUP BY component),
clustered AS (
    SELECT c.id AS did, c.component AS rep, s.sz
    FROM comp c JOIN sizes s USING (component))
SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
       COALESCE(cl.rep, CAST(d.doc_id AS VARCHAR)) AS cluster_rep,
       COALESCE(cl.sz, 1::BIGINT) AS cluster_size
FROM {table} d LEFT JOIN clustered cl ON CAST(d.doc_id AS VARCHAR) = cl.did"""


def main(sf_dir: str) -> int:
    con = duckdb.connect()
    con.execute("PRAGMA threads=1")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    docs = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").df()

    fails = 0

    sigs = np_signatures(docs)
    want = np_minhash_pairs(sigs).sort_values(["a", "b"]).reset_index(drop=True)
    got = (
        con.execute(minhash_pairs_sql())
        .df()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    ok = want.shape == got.shape and (
        want.empty
        or (
            (want.a.values == got.a.values).all()
            and (want.b.values == got.b.values).all()
            and np.allclose(want.est_jaccard.values, got.est_jaccard.values, atol=0)
        )
    )
    print(f"minhash_pairs: numpy={len(want)} sql={len(got)} match={ok}")
    fails += not ok

    sims = np_simhashes(docs)
    want_s = np_simhash_pairs(sims).sort_values(["a", "b"]).reset_index(drop=True)
    got_s = (
        con.execute(simhash_pairs_sql())
        .df()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    ok_s = want_s.shape == got_s.shape and (
        want_s.empty or (want_s.values == got_s.values).all()
    )
    print(f"simhash_pairs: numpy={len(want_s)} sql={len(got_s)} match={ok_s}")
    fails += not ok_s

    want_c = (
        np_clusters(docs, want).sort_values("doc_id").reset_index(drop=True)
    )
    got_c = (
        con.execute(neardup_clusters_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ok_c = want_c.shape == got_c.shape and (want_c.values == got_c.values).all()
    print(f"neardup_clusters: numpy={len(want_c)} sql={len(got_c)} match={ok_c}")
    fails += not ok_c

    # embedding-LSH sign margin (round 5): the embedding_neardup oracle
    # replays sign(embedding . plane) with inlined float64 plane
    # literals; engines may sum the 64-term dot in different orders
    # (~1e-13 relative drift), so the replay is exact only while every
    # |dot| clears that by a wide margin. Assert >= 1e-9 (observed
    # minimum ~3e-6 across sf0.001/0.01/0.1).
    emb = con.execute(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    m = np.array([e[0] for e in emb], dtype=np.float64)
    from __spark_entry__ import EMB_LSH_PLANES, EMB_LSH_TABLES

    margin = min(
        np.abs(
            m
            @ np.random.RandomState(42 + 1000 * t).standard_normal(
                (m.shape[1], EMB_LSH_PLANES)
            )
        ).min()
        for t in range(EMB_LSH_TABLES)
    )
    ok = margin >= 1e-9
    print(f"embedding_lsh_sign_margin: min|dot|={margin:.3e} >= 1e-9 {ok}")
    fails += not ok

    return fails


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
