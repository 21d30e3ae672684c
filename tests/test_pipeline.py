"""Pipeline framework (SURVEY §2.8): registry errors, format gate,
end-to-end run writing the SCORED frame (the reference's save-raw bug
deliberately not reproduced)."""

import json

import pytest

from datas_spark.pipeline.base import DEFAULT_REGISTRY, Pipeline, PipelineRegistry

ALPACA = [
    {"instruction": "Give three tips.", "input": "", "output": "1. Eat 2. Sleep 3. Code"},
    {"instruction": "Sum", "input": "2+2", "output": "4"},
]


@pytest.fixture()
def alpaca_path(tmp_path):
    p = tmp_path / "alpaca.json"
    p.write_text(json.dumps(ALPACA))
    return str(p)


def test_registry_duplicate_and_missing():
    reg = PipelineRegistry()
    reg.register("x", lambda df: df)
    with pytest.raises(ValueError, match="already registered"):
        reg.register("x", lambda df: df)
    with pytest.raises(KeyError, match="unknown scorer"):
        reg.get("nope")


def test_default_registrations_mirror_reference():
    # src/pipeline/__init__.py:9-12 registers deita(missing), rw, ifd, lenth
    assert {"lenth", "rw", "ifd", "less"} <= set(DEFAULT_REGISTRY.names())


def test_format_gate(spark, alpaca_path, tmp_path):
    p = Pipeline("lenth", alpaca_path, str(tmp_path / "out"), data_format="sharegpt")
    with pytest.raises(ValueError, match="not supported"):
        p.run(spark)


def test_lenth_pipeline_end_to_end(spark, alpaca_path, tmp_path):
    out = str(tmp_path / "scored")
    scored = Pipeline("lenth", alpaca_path, out).run(spark)
    got = {r.instruction: r.lenth for r in scored.collect()}
    assert got["Sum"] == 1  # len("4")
    # the sink holds the SCORED rows (reference bug not reproduced)
    written = spark.read.json(out)
    assert "lenth" in written.columns
    assert written.count() == 2


def test_schema_validation_rejects_missing_columns(spark, tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps([{"question": "q", "answer": "a"}]))
    p = Pipeline("lenth", str(bad), str(tmp_path / "out2"))
    with pytest.raises(ValueError, match="missing alpaca columns"):
        p.run(spark)
