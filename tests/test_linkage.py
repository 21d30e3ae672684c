"""Entity-resolution operator tests: blocking passes, skew cap,
field scoring tiers, decision thresholds."""
import pytest
from pyspark.sql import functions as F

from datas_spark.operators.linkage import (
    LinkageField,
    blocked_candidate_pairs,
    linkage_scores,
)


def _recs(spark):
    rows = [
        (1, "alice smith", "555-1234", "NY"),
        (2, "alice smyth", "555-1234", "NY"),   # name typo, same phone
        (3, "bob jones", "555-9999", "CA"),
        (4, "bob jones", "555-0000", "CA"),     # phone differs, same name
        (5, "carol white", None, "TX"),         # null phone never blocks
    ]
    return spark.createDataFrame(rows, "rid long, name string, phone string, st string")


def test_blocking_union_of_passes(spark):
    df = _recs(spark)
    pairs = blocked_candidate_pairs(df, "rid", [["phone"], ["st", "name"]])
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # phone pass pairs (1,2); (st,name) pass pairs (3,4); null phone drops 5
    assert got == {(1, 2), (3, 4)}


def test_blocking_skew_cap_drops_hot_block(spark):
    rows = [(i, "x") for i in range(10)]
    df = spark.createDataFrame(rows, "rid long, k string")
    assert blocked_candidate_pairs(df, "rid", [["k"]], max_block_size=9).count() == 0
    assert blocked_candidate_pairs(df, "rid", [["k"]], max_block_size=10).count() == 45


def test_blocking_requires_passes(spark):
    df = _recs(spark)
    with pytest.raises(ValueError):
        blocked_candidate_pairs(df, "rid", [])


def test_linkage_score_tiers(spark):
    df = _recs(spark)
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    fields = [
        LinkageField("name", 20, -5, fuzzy_max_edit=1, w_fuzzy=10),
        LinkageField("phone", 30, -10),
    ]
    out = {(r.id_a, r.id_b): r for r in linkage_scores(
        df, "rid", pairs, fields, match_threshold=40, possible_threshold=0
    ).collect()}
    # (1,2): name edit 1 -> 10, phone agree -> 30 => 40 match
    assert out[(1, 2)].score == 40 and out[(1, 2)].decision == "match"
    assert out[(1, 2)].name_edit == 1
    # (3,4): name exact -> 20, phone disagree -> -10 => 10 possible
    assert out[(3, 4)].score == 10 and out[(3, 4)].decision == "possible"


def test_linkage_null_field_is_disagreement(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", "p")], "rid long, name string, phone string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    fields = [LinkageField("name", 5, -1), LinkageField("phone", 5, -1)]
    out = linkage_scores(df, "rid", pairs, fields, 10, 0).collect()
    assert out[0].score == 4  # 5 (name) + -1 (null phone)


def test_linkage_drops_below_possible(spark):
    df = _recs(spark)
    pairs = spark.createDataFrame([(1, 3)], "id_a long, id_b long")
    fields = [LinkageField("phone", 5, -100)]
    assert linkage_scores(df, "rid", pairs, fields, 10, 0).count() == 0


def test_golden_records_survivorship_rules(spark):
    """Mode election per field with smallest-value tie-break;
    singletons pass through; golden_id is the smallest member id."""
    from datas_spark.operators.linkage import golden_records

    recs = spark.createDataFrame(
        [
            # entity {1,2,3}: name majority 'alice'; phone tie -> min wins
            (1, "alice", "111", "addr a"),
            (2, "alice", "222", "addr a"),
            (3, "alicX", "111", None),
            # singleton
            (9, "bob", "999", "addr b"),
        ],
        "rec_id long, name string, phone string, addr string",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {r.golden_id: r for r in golden_records(
        recs, "rec_id", pairs, ["name", "phone", "addr"]
    ).collect()}
    assert set(out) == {1, 9}
    g = out[1]
    assert g.n_records == 3
    assert g.name == "alice"       # 2-1 majority
    assert g.phone == "111"        # 2-1 majority
    assert g.addr == "addr a"      # NULLs never win
    s = out[9]
    assert (s.n_records, s.name, s.phone, s.addr) == (1, "bob", "999", "addr b")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        golden_records(recs, "rec_id", pairs, [])


def test_golden_records_tie_breaks_to_smallest_value(spark):
    from datas_spark.operators.linkage import golden_records

    recs = spark.createDataFrame(
        [(1, "zeta"), (2, "alpha")], "rec_id long, name string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = golden_records(recs, "rec_id", pairs, ["name"]).collect()[0]
    assert (r.golden_id, r.name) == (1, "alpha")
