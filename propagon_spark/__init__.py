"""propagon_spark — a PySpark-native link-graph analytics engine.

A from-scratch re-creation of the graph capabilities of Refefer/propagon
(reference at /root/reference, v2.0.0-alpha.1) designed for Spark's
execution model: DataFrame/Catalyst plans, explicit partitioning, vectorized
pandas/Arrow UDFs where built-ins can't express the kernel, and a driver-side
iteration controller with checkpoint/resume.

Public surface (mirrors the reference's graph group,
``/root/reference/crates/propagon-cli/src/main.rs:1092-1245``):

- :func:`propagon_spark.graph.pagerank.pagerank` — PageRank / personalized
  PageRank with the reference's sink policies (none/uniform/all/reverse) and
  teleport modes (uniform/seeds).
- :func:`propagon_spark.graph.components.connected_components` — weakly
  connected components (exact membership parity with
  ``extract_components``).
- :func:`propagon_spark.graph.lpa.label_propagation` — synchronous LPA
  (north-rule addition; absent from the v2 reference).
- :func:`propagon_spark.graph.triangles.triangle_count` — per-vertex +
  global triangle counts (north-rule addition).
- degree/kcore/hits/katz/leader_rank — the rest of the reference graph group.
"""

from propagon_spark.session import get_spark
from propagon_spark.errors import (
    PropagonError,
    EmptyDatasetError,
    InvalidParameterError,
    NumericError,
)

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "PropagonError",
    "EmptyDatasetError",
    "InvalidParameterError",
    "NumericError",
]
