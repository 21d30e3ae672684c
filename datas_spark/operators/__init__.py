from datas_spark.operators import (  # noqa: F401
    dedup,
    selection,
    similarity,
    taskvector,
)
