"""Column-expression library (pure ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen-friendly; no Python UDFs in this package)."""

from datas_spark.functions import arrays, text  # noqa: F401
