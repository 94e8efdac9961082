from propagon_spark.graph.core import Graph

__all__ = ["Graph"]
