"""Native (JVM-side) column-function library: text analysis, hashing,
shingling. All pure `pyspark.sql.functions` compositions — no Python UDFs —
so they stay inside whole-stage codegen."""
