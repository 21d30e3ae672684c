from datas_spark.operators import (  # noqa: F401
    clustering,
    conversations,
    corpus,
    dedup,
    joins,
    multimodal,
    scoring,
    selection,
    similarity,
    taskvector,
    validate,
)
