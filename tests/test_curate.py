"""Curation pipeline: every stage fires on a planted fixture, stage
precedence is deterministic, and the kept set survives end to end."""

from __future__ import annotations

from pyspark.sql import functions as F

from tits_spark.operators.curate import curate_documents, verify_jaccard_pairs

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the dog chases "
    "the fox around the yard for a while until both of them are tired and "
    "they settle down in the shade of an old oak tree to rest for the day"
)
NEAR = GOOD.replace("lazy dog", "sleepy dog").replace("old oak", "tall elm")
LOW_Q = "!!! ??? $$$ %%% 12345 67890 @@@ ### &&& *** ((( ))) +++ === [[[ ]]]"
NON_EN = (
    "szybki brazowy lis przeskakuje nad leniwym psem potem pies goni lisa "
    "po podworku przez chwile az oba zwierzaki zmecza sie i odpoczywaja "
    "w cieniu starego debu przez cala reszte popoludnia bardzo spokojnie"
)


def _docs(spark):
    rows = [
        (1, GOOD),
        (2, GOOD),        # exact dup of 1 -> dropped at exact_dup
        (3, NEAR),        # near dup of 1 -> dropped at near_dup
        (4, LOW_Q),       # fails quality gate
        (5, NON_EN),      # passes quality, fails lang gate
        (6, "completely different text about the weather in the mountains "
            "where it rains for most of the autumn and the rivers swell "
            "with cold clear water that runs down into the green valley"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_stages_fire(spark):
    out = curate_documents(
        _docs(spark), quality_min=0.6, lang="en",
        num_hashes=8, bands=8,  # 1 row per band -> any shared minhash collides
        shingle_n=8, jaccard_threshold=0.3, max_doc_freq=1000,
    )
    stages = {r["doc_id"]: r["stage"] for r in out.collect()}
    assert stages == {
        1: "kept", 2: "exact_dup", 3: "near_dup",
        4: "quality", 5: "lang", 6: "kept",
    }


def test_one_row_per_input_doc(spark):
    docs = _docs(spark)
    out = curate_documents(docs, quality_min=0.6, lang="en")
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()


def test_quality_gate_shields_dedup(spark):
    # a low-quality exact duplicate must report 'quality', not 'exact_dup'
    docs = spark.createDataFrame(
        [(1, LOW_Q), (2, LOW_Q), (3, GOOD)], "doc_id int, text string"
    )
    out = curate_documents(docs, quality_min=0.6, lang="en")
    stages = {r["doc_id"]: r["stage"] for r in out.collect()}
    assert stages == {1: "quality", 2: "quality", 3: "kept"}


def test_near_dup_keeps_smallest_id(spark):
    # a chain of near-dups keeps exactly the smallest id of the cluster
    docs = spark.createDataFrame(
        [(10, GOOD), (11, NEAR), (12, NEAR.replace("tired", "weary"))],
        "doc_id int, text string",
    )
    out = curate_documents(
        docs, quality_min=0.6, lang="en",
        num_hashes=8, bands=8, jaccard_threshold=0.3,
    )
    stages = {r["doc_id"]: r["stage"] for r in out.collect()}
    assert stages[10] == "kept"
    assert stages[11] == "near_dup"
    assert stages[12] == "near_dup"


def test_verify_jaccard_matches_full_join(spark):
    # verification restricted to candidate pairs must agree with the
    # all-pairs ngram_jaccard_pairs values on those pairs
    from tits_spark.operators.dedup import ngram_jaccard_pairs

    docs = _docs(spark).filter(F.col("doc_id").isin(1, 3, 6))
    cands = spark.createDataFrame([(1, 3), (1, 6)], "id_a int, id_b int")
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in verify_jaccard_pairs(cands, docs, threshold=0.0).collect()
    }
    want = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
        if (r["id_a"], r["id_b"]) in got
    }
    assert got == want
    assert got[(1, 3)] > 0.3  # the planted near-dup really is similar
