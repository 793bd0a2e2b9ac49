"""Sources & sinks: the reference's InputFormat/OutputFormat surface
re-expressed as spark.read/write (SURVEY §2.1-§2.2)."""
