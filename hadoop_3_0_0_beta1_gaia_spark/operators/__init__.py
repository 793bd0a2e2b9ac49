"""Operator library: Spark-first re-expressions of the reference's
MapReduce operator surface (SURVEY §2)."""
