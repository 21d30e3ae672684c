from datas_spark.pipeline.base import (  # noqa: F401
    Pipeline,
    PipelineRegistry,
    register_scorer,
)
