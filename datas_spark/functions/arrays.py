"""Array math as native Column expressions.

The reference stores per-token NLL lists and 4096-dim embeddings as
Python lists and reduces them with numpy on the driver
(``/root/reference/main.py:340-350``,
``score_pipeline_ifd.py:154-201``). Here every reduction is a JVM-side
``aggregate``/``zip_with`` expression over ``array<double>`` /
``array<float>`` columns, so it runs inside whole-stage codegen on the
executors — no Python, no collect.

All helpers accept a column name or Column and return a Column.
Sequential left-fold order matches DuckDB's list_* functions, so
results are bit-identical for the oracle check.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "arr_sum",
    "arr_mean",
    "arr_min",
    "arr_max",
    "dot",
    "l2_norm",
    "cosine_similarity",
    "cosine_from_norms",
    "l2_distance",
    "arr_scale",
    "arr_add",
    "arr_sub",
    "entropy",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def arr_sum(col: Column | str) -> Column:
    """Sequential sum of an array<numeric> column (left fold, stable order)."""
    return F.aggregate(_c(col), F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def arr_mean(col: Column | str) -> Column:
    """Mean of an array column; NULL for empty/NULL arrays (no div-by-zero)."""
    c = _c(col)
    return F.when(F.size(c) > 0, arr_sum(c) / F.size(c))


def arr_min(col: Column | str) -> Column:
    return F.array_min(_c(col))


def arr_max(col: Column | str) -> Column:
    return F.array_max(_c(col))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length array columns (zip_with + fold)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(col: Column | str) -> Column:
    c = _c(col)
    return F.sqrt(dot(c, c))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL if either vector has zero norm."""
    ca, cb = _c(a), _c(b)
    denom = l2_norm(ca) * l2_norm(cb)
    return F.when(denom > 0, dot(ca, cb) / denom)


def cosine_from_norms(
    a: Column | str, b: Column | str, na: Column | str, nb: Column | str
) -> Column:
    """``cosine_similarity`` with the per-side L2 norms PRECOMPUTED
    (round 12, guide §1.2 per-task work): a blocked pair join evaluates
    the cosine once per CANDIDATE, so the two norm folds — 2/3 of the
    per-candidate element ops — are recomputed fan-out times per row.
    Hoisting ``na = l2_norm(a)`` / ``nb = l2_norm(b)`` into the per-ROW
    projections leaves one dot fold per candidate.

    Bit-identical to ``cosine_similarity``: the same ``sqrt(dot(v,v))``
    doubles are produced (just earlier), and the combination
    ``dot / (na * nb)`` is the same multiplication/division order."""
    ca, cb = _c(a), _c(b)
    denom = _c(na) * _c(nb)
    return F.when(denom > 0, dot(ca, cb) / denom)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    d = F.zip_with(
        _c(a), _c(b), lambda x, y: (x.cast("double") - y.cast("double")) ** 2
    )
    return F.sqrt(F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x))


def arr_scale(col: Column | str, factor: Column | float) -> Column:
    f = F.lit(factor) if not isinstance(factor, Column) else factor
    return F.transform(_c(col), lambda x: x.cast("double") * f)


def arr_add(a: Column | str, b: Column | str) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") + y.cast("double"))


def arr_sub(a: Column | str, b: Column | str) -> Column:
    """Elementwise difference — the task-vector primitive
    (reference ``src/utils/merging.py:44-50``)."""
    return F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") - y.cast("double"))


def entropy(prob_col: Column | str, eps: float = 1e-12) -> Column:
    """Shannon entropy of a probability array — EntropySampling (SURVEY L4)."""
    return -F.aggregate(
        _c(prob_col),
        F.lit(0.0),
        lambda acc, p: acc + p.cast("double") * F.log(p.cast("double") + F.lit(eps)),
    )
