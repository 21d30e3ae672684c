"""ShareGPT conversation transforms (SURVEY §1.2): flatten order,
alpaca projection, regroup round-trip."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from datas_spark.operators.conversations import (
    flatten_conversations,
    regroup_turns,
    turns_to_alpaca,
)


def _conv_df(spark):
    # mirrors data/rawdata/sharegpt_simple.jsonl shape
    rows = [
        Row(
            conversation_id="c1",
            category="chat",
            conversation=[
                Row(human="hi", assistant="hello"),
                Row(human="how?", assistant="fine"),
            ],
        ),
        Row(conversation_id="c2", category="qa", conversation=[Row(human="q", assistant="a")]),
        Row(conversation_id="c3", category="empty", conversation=[]),
    ]
    return spark.createDataFrame(rows)


def test_flatten_preserves_turn_order(spark):
    turns = flatten_conversations(_conv_df(spark)).collect()
    got = {(r.conversation_id, r.turn): (r.human, r.assistant) for r in turns}
    assert got[("c1", 0)] == ("hi", "hello")
    assert got[("c1", 1)] == ("how?", "fine")
    assert got[("c2", 0)] == ("q", "a")
    assert len(turns) == 3  # empty conversation contributes no rows


def test_alpaca_projection_feeds_scorers(spark):
    turns = turns_to_alpaca(flatten_conversations(_conv_df(spark)))
    assert {"instruction", "input", "output"} <= set(turns.columns)
    scored = turns.withColumn("lenth", F.length("output"))
    got = {(r.conversation_id, r.turn): r.lenth for r in scored.collect()}
    assert got[("c1", 0)] == 5  # "hello"


def test_regroup_round_trip(spark):
    df = _conv_df(spark).where("size(conversation) > 0")
    back = regroup_turns(flatten_conversations(df))
    got = {r.conversation_id: r.conversation for r in back.collect()}
    assert [t.asDict() for t in got["c1"]] == [
        {"human": "hi", "assistant": "hello"},
        {"human": "how?", "assistant": "fine"},
    ]
