"""Pipeline framework / control plane (SURVEY §2.8).

Re-expresses the reference's 5-stage lifecycle
(``/root/reference/src/pipeline/base.py:68-94``):

    load → (aux data) → preprocess/validate → forward (score) → save

as ``read → transform(DataFrame → DataFrame) → write`` over one lazy
plan, plus the name → scorer registry
(``base.py:96-113`` PipelineRegistry, ``src/pipeline/__init__.py:14-19``
factory). Registered transforms are pure functions DataFrame →
DataFrame, so a pipeline run is a single Catalyst-optimized job — the
reference's per-stage materialization disappears.

Known reference bugs deliberately NOT reproduced (SURVEY §2.3): the
length pipeline discarding its mapped result
(``score_pipeline_lenth.py:41-42``) and ``run()`` saving the unscored
data (``base.py:92`` calling ``_save_data`` with the raw rows). We
write the scored frame.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from datas_spark.io.sinks import write_json
from datas_spark.io.sources import read_json_auto

Transform = Callable[[DataFrame], DataFrame]

# constructed directly: StructType.fromDDL needs a live SparkContext,
# which must not be an import-time requirement of this module
ALPACA_SCHEMA = StructType(
    [
        StructField("instruction", StringType()),
        StructField("input", StringType()),
        StructField("output", StringType()),
    ]
)


class PipelineRegistry:
    """name → transform registry (base.py:96-113): duplicate and
    missing registrations raise, like the reference."""

    def __init__(self) -> None:
        self._scorers: dict[str, Transform] = {}

    def register(self, name: str, fn: Transform) -> None:
        if name in self._scorers:
            raise ValueError(f"scorer {name!r} already registered")
        self._scorers[name] = fn

    def get(self, name: str) -> Transform:
        if name not in self._scorers:
            raise KeyError(
                f"unknown scorer {name!r}; registered: {sorted(self._scorers)}"
            )
        return self._scorers[name]

    def names(self) -> list[str]:
        return sorted(self._scorers)


DEFAULT_REGISTRY = PipelineRegistry()


def register_scorer(name: str) -> Callable[[Transform], Transform]:
    """Decorator twin of the reference's ``PipelineRegistry.register``."""

    def deco(fn: Transform) -> Transform:
        DEFAULT_REGISTRY.register(name, fn)
        return fn

    return deco


@dataclass
class Pipeline:
    """C1/C2/C4: factory + runner. ``Pipeline("lenth", data_path=...,
    output_path=...).run(spark)`` mirrors the reference's entry point
    (``src/pipeline/__init__.py:14-19``) as one lazy Spark job."""

    name: str
    data_path: str
    output_path: str
    data_format: str = "alpaca"
    registry: PipelineRegistry = field(default_factory=lambda: DEFAULT_REGISTRY)

    def _preprocess(self, df: DataFrame) -> DataFrame:
        """C2 format gate (base.py:57-63): only alpaca passes; schema is
        validated structurally instead of by trusting a flag."""
        if self.data_format != "alpaca":
            raise ValueError(f"data format {self.data_format!r} not supported yet")
        missing = [f.name for f in ALPACA_SCHEMA.fields if f.name not in df.columns]
        if missing:
            raise ValueError(f"input missing alpaca columns: {missing}")
        return df

    def run(self, spark: SparkSession) -> DataFrame:
        """C1 lifecycle: one plan, returns (and writes) the SCORED frame."""
        raw = read_json_auto(spark, self.data_path)
        validated = self._preprocess(raw)
        scored = self.registry.get(self.name)(validated)
        write_json(scored, self.output_path, single_file=True)
        return scored


# --- default scorer registrations (mirrors src/pipeline/__init__.py:9-12) --

from datas_spark.operators.scoring import (  # noqa: E402
    ifd_scorer_proxy,
    length_scorer,
    less_scorer_stub,
    reward_scorer_proxy,
)


def _register_defaults() -> None:
    # mirrors the reference's registrations: deita→(missing module,
    # proxied by rw here), rw, ifd, lenth (src/pipeline/__init__.py:9-12)
    DEFAULT_REGISTRY.register("lenth", length_scorer)
    DEFAULT_REGISTRY.register("rw", reward_scorer_proxy)
    DEFAULT_REGISTRY.register("ifd", ifd_scorer_proxy)
    DEFAULT_REGISTRY.register("less", less_scorer_stub)


_register_defaults()
