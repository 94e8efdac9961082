"""k-core delta-degree evidence (round-5 verdict item 3).

Runs the round-4 peel (full degree re-aggregation over a twice-
anti-joined edge set per round) and the round-5 delta-degree peel
(immutable persisted edge set, frontier-proportional subtraction) on the
SAME sf0.1 min-weight>=2 co-occurrence graph in one session, and reports
per-implementation wall time, driver-job count (REST jobs endpoint), and
peel structure. Usage::

    python3 BENCH/diag_kcore.py [sf_dir] [cores]

The old implementation is read from git history (tag commit before the
rewrite) so the comparison is against the exact shipped code.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OLD_REF = "45605d8^"  # last commit with the round-4 kcore


def _load_old_kcore(tmp: str):
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{OLD_REF}:propagon_spark/graph/kcore.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = os.path.join(tmp, "kcore_old.py")
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("kcore_old", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.kcore


def _max_job_id(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/jobs", timeout=10
    ) as r:
        jobs = json.load(r)
    return max((j["jobId"] for j in jobs), default=-1)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    min_w = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from propagon_spark.session import get_spark

    spark = get_spark(
        app_name="diag-kcore", master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={"spark.ui.enabled": "true",
                    "spark.ui.retainedJobs": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    g = entry._graph(spark, sf_dir, symmetric=False, min_weight=min_w)
    g.edges.persist().count()

    from propagon_spark.graph.kcore import _kcore_hindex, _kcore_peel

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        kcore_old = _load_old_kcore(tmp)

        results = {}
        frames = {}
        for name, fn in (("hindex", _kcore_hindex),
                         ("peel_delta", _kcore_peel),
                         ("old_reagg", kcore_old),
                         ("hindex_warm", _kcore_hindex)):
            j0, t0 = _max_job_id(spark), time.monotonic()
            out = fn(g)
            rows = out.count()
            dt = time.monotonic() - t0
            j1 = _max_job_id(spark)
            results[name] = {"seconds": round(dt, 2), "jobs": j1 - j0,
                             "rows": rows}
            frames[name] = out
            print(f"{name}: {dt:.1f}s, {j1-j0} driver jobs, {rows} rows",
                  flush=True)

        # equivalence: identical (id, coreness) assignments
        a = frames["hindex"].select("id", "coreness")
        b = frames["old_reagg"].select("id", "coreness")
        c = frames["peel_delta"].select("id", "coreness")
        diff = (a.exceptAll(b).count() + b.exceptAll(a).count()
                + a.exceptAll(c).count() + c.exceptAll(a).count())
        results["assignments_differ"] = diff
        print("RESULT " + json.dumps(results))
        assert diff == 0, "old and new kcore disagree!"

    spark.stop()


if __name__ == "__main__":
    main()
