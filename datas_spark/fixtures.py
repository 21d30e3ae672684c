"""Shared synthetic-fixture builders used by multiple registry
batches. This module is a LEAF (it imports only operators/functions,
never the registry), so registry modules can import it at module level
without creating circular imports — the registryN files themselves
must only import each other lazily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datas_spark.operators import corpus as C

# deterministic fake-PII augmentation (the synthetic corpus contains
# no real PII): every 7th doc gains an email, every 11th a phone + IP
AUG_PII_SQL = """
      SELECT doc_id,
        text ||
        CASE WHEN doc_id % 7 = 0
             THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
        CASE WHEN doc_id % 11 = 0
             THEN ' call 555-123-4567 or ping 10.0.' || (doc_id % 256) || '.1'
             ELSE '' END AS text
      FROM documents
"""

EMAIL_RE = C.PII_PATTERNS["email"]
PHONE_RE = C.PII_PATTERNS["phone"]
IP_RE = C.PII_PATTERNS["ip"]


def augment_pii(docs: DataFrame) -> DataFrame:
    """Spark twin of AUG_PII_SQL."""
    did = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 7 == 0,
                F.concat(
                    F.lit(" contact user"), did.cast("string"), F.lit("@example.com")
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 11 == 0,
                F.concat(
                    F.lit(" call 555-123-4567 or ping 10.0."),
                    (did % 256).cast("string"),
                    F.lit(".1"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
