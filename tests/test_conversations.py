"""ShareGPT conversation transforms (SURVEY §1.2): flatten order,
alpaca projection, regroup round-trip."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from datas_spark.operators import conversations as CV
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


def test_conversation_dedup_merges_normalized_reposts(spark):
    from datas_spark.operators.conversations import conversation_dedup

    conv_type = "conversation_id long, conversation array<struct<human:string,assistant:string>>"
    rows = [
        (1, [("Hello there", "hi"), ("how are you", "fine")]),
        (2, [("HELLO, there!!", "hi."), ("How are you?", "fine")]),  # repost
        (3, [("different dialog", "yes")]),
    ]
    out = conversation_dedup(
        spark.createDataFrame(rows, conv_type), "conversation", "conversation_id"
    )
    assert sorted(r.conversation_id for r in out.collect()) == [1, 3]


def test_conversation_stats_values(spark):
    from datas_spark.operators.conversations import conversation_stats

    conv_type = "conversation_id long, conversation array<struct<human:string,assistant:string>>"
    rows = [(1, [("abcd", "xy"), ("ef", None)]), (2, [])]
    got = {
        r.conversation_id: (r.n_turns, r.human_chars, r.assistant_chars, r.avg_human_chars)
        for r in conversation_stats(
            spark.createDataFrame(rows, conv_type), "conversation", "conversation_id"
        ).collect()
    }
    assert got[1] == (2, 6, 2, 3.0)
    assert got[2] == (0, 0, 0, None)


def test_format_check_flags_empty_and_null_sides(spark):
    from datas_spark.operators.conversations import conversation_format_check

    rows = [
        (1, [("hi", "hello"), ("more", "words")]),     # clean
        (2, [("", "hello")]),                          # empty human
        (3, [("hi", None)]),                           # NULL assistant
        (4, []),                                       # zero turns
    ]
    df = spark.createDataFrame(
        rows,
        "conversation_id bigint, conversation array<struct<human:string,assistant:string>>",
    )
    out = {r.conversation_id: r for r in conversation_format_check(df).collect()}
    assert out[1].format_ok == 1 and out[1].n_turns == 2
    assert out[2].format_ok == 0 and out[2].n_empty_human == 1
    assert out[3].format_ok == 0 and out[3].n_empty_assistant == 1
    assert out[4].format_ok == 0 and out[4].n_turns == 0


def test_chat_training_pairs_contexts_accumulate(spark):
    df = spark.createDataFrame(
        [(1, [("h0", "a0"), ("h1", "a1"), ("h2", "a2")])],
        "conversation_id long, conversation array<struct<human:string,assistant:string>>",
    )
    out = {r.turn: r for r in CV.chat_training_pairs(df).collect()}
    assert out[0].context == "Human: h0" and out[0].target == "a0"
    assert out[1].context == "Human: h0\nAssistant: a0\nHuman: h1"
    assert out[2].context.endswith("Human: h2") and "Assistant: a1" in out[2].context
    assert len(out) == 3
