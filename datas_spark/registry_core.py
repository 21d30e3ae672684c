"""Leaf registry core: the query/oracle tables and the @register
decorator, importable by every registryN module WITHOUT triggering the
full registry import chain (datas_spark.registry pulls in all batches;
a registryN importing IT would re-enter the chain mid-import and read
partially-initialized sibling modules — the classic circular-import
trap this module exists to break).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
