"""Scalar/aggregate function library: text metrics, dedup, similarity.

The reference has no scalar-function library (arbitrary Java in Mapper.map is
its UDF surface — SURVEY §2.3); this package supplies the engine's built-in
functions, all expressed with pyspark.sql.functions (JVM-side, codegen-
friendly) so the hot path never drops into Python row-at-a-time.
"""
