"""hadoop_3_0_0_beta1_gaia_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing capability surface of
SymbioticLab/hadoop-3.0.0-beta1-gaia (Hadoop MapReduce + GAIA geo-shuffle fork)
on Apache Spark's DataFrame/SQL stack.

Design stance (see SURVEY.md):
- The fundamental abstraction is the DataFrame; Catalyst+Tungsten own physical
  planning (partial aggregation == Combiner, SMJ/BHJ selection == the user's
  manual join choice in the reference, RangePartitioning == TotalOrderPartitioner).
- The reference's (key, value) pair-stream surface is modeled as 2-column
  DataFrames with an RDD escape hatch only where byte fidelity matters
  (TeraSort records, the streaming pipe).
- Custom code lives at the API level (the reference's four "little languages":
  field-selection specs, key-field sort specs, aggregator descriptors, join
  expressions), never as Catalyst rules.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
