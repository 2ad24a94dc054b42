"""Tests for the training-data curation operators: connected components
(vs a union-find reference on random graphs), document chunking,
decontamination, PII scrubbing, stratified sampling, and the as-of join
(vs a per-row Python reference)."""

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from amundsendatabuilder_spark.functions.asof import asof_join
from amundsendatabuilder_spark.functions.components import connected_components
from amundsendatabuilder_spark.functions.curation import (
    chunk_documents,
    decontaminate,
    pii_scrub,
    stratified_sample,
)


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------

def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress: component = min reachable
    return {n: find(n) for n in parent}


def test_connected_components_chain_and_clique(spark):
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10), (20, 20),
             (30, 31), (31, 32), (30, 32)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    # self-loop-only node 20 is dropped (no edge to anything else)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   30: 30, 31: 30, 32: 30}


def test_connected_components_random_vs_union_find(spark):
    rng = random.Random(1234)
    for trial in range(3):
        n_nodes = 60
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(40 + trial * 30)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["node"]: r["component"]
               for r in connected_components(df).collect()}
        assert got == _uf_components(edges)


def test_connected_components_long_chain_converges(spark):
    # a 64-node path has diameter 63; star-contraction must still
    # converge well inside max_rounds (O(log n) rounds, not 63)
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components(df, max_rounds=16).collect()
    assert {r["component"] for r in out} == {0}
    assert len(out) == 64


def test_connected_components_max_edges_guard(spark):
    """VERDICT r04 directive 7: adversarial O(n^2) edge sets fail loudly
    with the measured count before any CC round runs."""
    edges = spark.createDataFrame(
        [(i, j) for i in range(20) for j in range(i)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="exceed max_edges"):
        connected_components(edges, max_edges=100)
    # under the cap it still runs to the right answer (one clique)
    out = connected_components(edges, max_edges=1000)
    assert {r["component"] for r in out.collect()} == {0}


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------

def test_chunk_documents_coverage_and_overlap(spark):
    words = [f"w{i}" for i in range(70)]
    df = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(words)),
         Row(doc_id=2, text="a b c"),
         Row(doc_id=3, text="solo")])
    out = {(r["doc_id"], r["chunk_id"]): r
           for r in chunk_documents(df, size=32, stride=24).collect()}
    # doc 1: 70 tokens -> 1 + ceil(38/24) = 3 chunks
    assert [k for k in out if k[0] == 1] == [(1, 0), (1, 1), (1, 2)]
    c0, c1, c2 = out[(1, 0)], out[(1, 1)], out[(1, 2)]
    assert c0["chunk_text"].split() == words[0:32]
    assert c1["chunk_text"].split() == words[24:56]
    assert c2["chunk_text"].split() == words[48:70]
    assert (c0["n_tokens"], c1["n_tokens"], c2["n_tokens"]) == (32, 32, 22)
    # short docs: one chunk, whole doc
    assert out[(2, 0)]["chunk_text"] == "a b c"
    assert out[(3, 0)]["n_tokens"] == 1


def test_chunk_documents_exact_boundary(spark):
    df = spark.createDataFrame([Row(doc_id=1, text=" ".join("x" * 1 for _ in range(32)))])
    rows = chunk_documents(df, size=32, stride=24).collect()
    assert len(rows) == 1 and rows[0]["n_tokens"] == 32


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def test_decontaminate_counts_distinct_shared_shingles(spark):
    bench = spark.createDataFrame(
        [Row(doc_id=100, text="the quick brown fox jumps over the lazy dog")])
    docs = spark.createDataFrame([
        # shares two distinct 5-grams with the benchmark
        Row(doc_id=1, text="xx the quick brown fox jumps over yy"),
        # no overlap
        Row(doc_id=2, text="completely different words here entirely now"),
        # repeats a shared shingle twice -> still counted once (distinct)
        Row(doc_id=3, text="the quick brown fox jumps _ the quick brown fox jumps"),
        # too short for a 5-gram
        Row(doc_id=4, text="tiny doc"),
    ])
    got = {r["doc_id"]: r["n_shared"]
           for r in decontaminate(docs, bench, n=5).collect()}
    assert got == {1: 2, 3: 1}


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------

def test_pii_scrub(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="mail a.user+tag@ex-ample.co.uk or bob@x.io now"),
        Row(doc_id=2, text="ssn 123-45-6789 phone +1-415-555-0199 end"),
        Row(doc_id=3, text="clean text only"),
    ])
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got[1]["scrubbed"] == "mail <EMAIL> or <EMAIL> now"
    assert got[1]["n_email"] == 2 and got[1]["n_ssn"] == 0
    assert got[2]["scrubbed"] == "ssn <SSN> phone <PHONE> end"
    assert (got[2]["n_ssn"], got[2]["n_phone"]) == (1, 1)
    assert got[3]["scrubbed"] == "clean text only"


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------

def test_stratified_sample_deterministic_and_rate(spark):
    rows = [Row(doc_id=i, lang="en" if i % 2 == 0 else "zh")
            for i in range(2000)]
    df = spark.createDataFrame(rows)
    kept = stratified_sample(df, rates={"en": 50, "zh": 10}).collect()
    again = stratified_sample(df.repartition(7), rates={"en": 50, "zh": 10}).collect()
    # identical under repartitioning (determinism contract)
    assert sorted(r["doc_id"] for r in kept) == sorted(r["doc_id"] for r in again)
    by_lang = {"en": 0, "zh": 0}
    for r in kept:
        by_lang[r["lang"]] += 1
    # 1000 docs per stratum; expect ~500 and ~100 within a loose band
    assert 400 < by_lang["en"] < 600
    assert 50 < by_lang["zh"] < 160


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------

def _py_asof(left, right, tolerance_us=None):
    out = []
    for k, lts, lid in left:
        best = None
        for rk, rts, rid in right:
            if rk == k and rts <= lts and (best is None or rts > best[0] or
                                           (rts == best[0] and rid > best[1])):
                best = (rts, rid)
        if best is not None and tolerance_us is not None and lts - best[0] > tolerance_us:
            best = None
        out.append((lid, best[0] if best else None, best[1] if best else None))
    return sorted(out)


def test_asof_join_vs_reference(spark):
    rng = random.Random(7)
    left = [(rng.randrange(5), rng.randrange(100) * 1_000_000, i)
            for i in range(200)]
    right = [(rng.randrange(5), rng.randrange(100) * 1_000_000, 1000 + i)
             for i in range(80)]
    ldf = spark.createDataFrame(
        [Row(user_id=k, ts_us=t, event_id=i) for k, t, i in left]
    ).select("user_id", F.timestamp_micros("ts_us").alias("ts"), "event_id")
    rdf = spark.createDataFrame(
        [Row(user_id=k, ts_us=t, r_id=i) for k, t, i in right]
    ).select("user_id", F.timestamp_micros("ts_us").alias("ts"), "r_id")

    got = asof_join(ldf, rdf, key="user_id", right_cols=["r_id"]).collect()
    got_t = sorted((r["event_id"], r["ts_r"], r["r_id_r"]) for r in got)
    assert got_t == _py_asof(left, right)


def test_asof_join_tolerance_and_tie(spark):
    ldf = spark.createDataFrame([Row(k=1, ts_us=10_000_000, event_id=1),
                                 Row(k=1, ts_us=50_000_000, event_id=2)]
                                ).select("k", F.timestamp_micros("ts_us").alias("ts"), "event_id")
    rdf = spark.createDataFrame([Row(k=1, ts_us=10_000_000, v="same-instant"),
                                 Row(k=1, ts_us=11_000_000, v="later")]
                                ).select("k", F.timestamp_micros("ts_us").alias("ts"), "v")
    out = {r["event_id"]: r for r in
           asof_join(ldf, rdf, key="k", right_cols=["v"],
                     tolerance_us=5_000_000).collect()}
    # <= semantics: the same-instant right row matches
    assert out[1]["v_r"] == "same-instant"
    # 50s - 11s = 39s > 5s tolerance -> voided
    assert out[2]["v_r"] is None and out[2]["ts_r"] is None


def test_asof_join_ignores_null_ts_right_rows(spark):
    """ADVICE r04: a right row with NULL ts must be invisible (DuckDB ASOF
    ignores it) — previously its payload could pair with another row's ts."""
    ldf = spark.createDataFrame([Row(k=1, ts_us=10_000_000, event_id=1)]
                                ).select("k", F.timestamp_micros("ts_us").alias("ts"), "event_id")
    rdf = spark.createDataFrame(
        [(1, 5_000_000, "real"), (1, None, "ghost")],
        "k long, ts_us long, v string",
    ).select("k", F.timestamp_micros("ts_us").alias("ts"), "v")
    out = asof_join(ldf, rdf, key="k", right_cols=["v"]).collect()
    assert len(out) == 1
    assert out[0]["v_r"] == "real" and out[0]["ts_r"] == 5_000_000
    # only null-ts right rows -> no match at all (not a ghost payload)
    rdf2 = spark.createDataFrame([(1, None, "ghost")],
                                 "k long, ts_us long, v string"
                                 ).select("k", F.timestamp_micros("ts_us").alias("ts"), "v")
    out2 = asof_join(ldf, rdf2, key="k", right_cols=["v"]).collect()
    assert out2[0]["v_r"] is None and out2[0]["ts_r"] is None


# ---------------------------------------------------------------------------
# vocab / tf-idf
# ---------------------------------------------------------------------------

def test_vocab_topk_counts_docs_not_occurrences(spark):
    from amundsendatabuilder_spark.functions.text import vocab_topk

    df = spark.createDataFrame([
        Row(doc_id=1, text="apple apple apple banana"),
        Row(doc_id=2, text="apple cherry"),
        Row(doc_id=3, text="cherry banana cherry"),
    ])
    rows = {r["term"]: (r["doc_freq"], r["rank"])
            for r in vocab_topk(df, k=10).collect()}
    # doc_freq is per-document (distinct), not occurrences
    assert rows["apple"] == (2, 1)      # ties on 2 break by term asc
    assert rows["banana"] == (2, 2)
    assert rows["cherry"] == (2, 3)


def test_tfidf_top_terms_rank_and_score(spark):
    from amundsendatabuilder_spark.functions.text import tfidf_top_terms

    df = spark.createDataFrame([
        Row(doc_id=1, text="rare common common"),
        Row(doc_id=2, text="common"),
    ])
    rows = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["score"])
            for r in tfidf_top_terms(df, k=2).collect()}
    # doc1: 'rare' df=1 -> idf 2_000_000, tf 1 -> 2_000_000
    #       'common' df=2 -> idf 1_000_000, tf 2 -> 2_000_000; tie -> term asc
    assert rows[(1, 1)] == ("common", 2, 2_000_000)
    assert rows[(1, 2)] == ("rare", 1, 2_000_000)
    assert rows[(2, 1)] == ("common", 1, 1_000_000)


def test_asof_join_matches_pandas_merge_asof(spark):
    """Cross-check vs pandas.merge_asof, the de-facto reference for as-of
    semantics (backward direction, <= match)."""
    import pandas as pd

    rng = random.Random(99)
    left = pd.DataFrame({
        "user_id": [rng.randrange(4) for _ in range(120)],
        "ts_us": [rng.randrange(50) * 2_000_000 for _ in range(120)],
        "event_id": list(range(120)),
    })
    # unique (user, ts) on the right: merge_asof picks the last duplicate,
    # our operator the max payload — dedupe to keep the comparison exact
    right = pd.DataFrame({
        "user_id": [rng.randrange(4) for _ in range(40)],
        "ts_us": [rng.randrange(50) * 2_000_000 for _ in range(40)],
        "r_id": [1000 + i for i in range(40)],
    }).groupby(["user_id", "ts_us"], as_index=False).agg({"r_id": "max"})

    exp = pd.merge_asof(
        left.assign(ts=pd.to_datetime(left.ts_us, unit="us")).sort_values("ts"),
        right.assign(ts=pd.to_datetime(right.ts_us, unit="us")).sort_values("ts"),
        on="ts", by="user_id", direction="backward",
    )
    exp_map = {int(r.event_id): (None if pd.isna(r.r_id) else int(r.r_id))
               for r in exp.itertuples()}

    ldf = spark.createDataFrame(left).select(
        "user_id", F.timestamp_micros("ts_us").alias("ts"), "event_id")
    rdf = spark.createDataFrame(right).select(
        "user_id", F.timestamp_micros("ts_us").alias("ts"), "r_id")
    got = {r["event_id"]: r["r_id_r"]
           for r in asof_join(ldf, rdf, key="user_id",
                              right_cols=["r_id"]).collect()}
    assert got == exp_map


def test_canonical_per_component(spark):
    from amundsendatabuilder_spark.functions.components import (
        canonical_per_component,
    )

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        ["node", "component"])
    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (10, 5), (11, 5)],
        ["doc_id", "n_chars"])
    got = {r["component"]: (r["canonical_id"], r["n_docs"])
           for r in canonical_per_component(comp, docs,
                                            prefer=["n_chars"]).collect()}
    # longest wins; equal length -> smallest id (2 over 3, 10 over 11)
    assert got == {1: (2, 3), 10: (10, 2)}


def test_profile_columns_into_stat_nodes(spark):
    """Profiler output feeds the TableColumnStats contract directly."""
    from amundsendatabuilder_spark.operators import amundsen_models as am
    from amundsendatabuilder_spark.sources.profiler import profile_columns

    df = spark.createDataFrame(
        [Row(a=1, b="x"), Row(a=3, b=None), Row(a=None, b="x")])
    stats = profile_columns(df, ["a", "b"], db="hive", cluster="gold",
                            schema="s", table_name="t", epoch=7)
    got = {(r["col_name"], r["stat_name"]): r["stat_val"]
           for r in stats.collect()}
    assert got == {
        ("a", "min"): "1", ("a", "max"): "3",
        ("a", "null_count"): "1", ("a", "distinct_count"): "2",
        ("b", "min"): "x", ("b", "max"): "x",
        ("b", "null_count"): "1", ("b", "distinct_count"): "1",
    }
    nodes = {r["key"] for r in am.table_column_stats_nodes(stats).collect()}
    assert "hive://gold.s/t/a/min/" in nodes and len(nodes) == 8
    rels = am.table_column_stats_relations(stats).collect()
    assert {r["end_key"] for r in rels} == {"hive://gold.s/t/a",
                                            "hive://gold.s/t/b"}


# ---------------------------------------------------------------------------
# paragraph dedup / repetition signals
# ---------------------------------------------------------------------------

def test_paragraph_dedup_keep_first(spark):
    from amundsendatabuilder_spark.functions.dedup import paragraph_dedup

    # block size 2: doc1 = [a b][c d], doc2 = [a b][a b][x y]
    # "a b" first occurs at (1, 0); its copies at (2, 0) and (2, 1) are dups.
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b c d"),
        Row(doc_id=2, text="a b a b x y"),
    ])
    rows = {r["doc_id"]: r.asDict() for r in paragraph_dedup(df, block_words=2).collect()}
    assert rows[1]["n_blocks"] == 2 and rows[1]["n_dup_blocks"] == 0
    assert rows[2]["n_blocks"] == 3 and rows[2]["n_dup_blocks"] == 2
    assert rows[2]["dup_permille"] == 666  # integer division, no float


def test_paragraph_dedup_ragged_tail_block(spark):
    from amundsendatabuilder_spark.functions.dedup import paragraph_dedup

    # 5 words at block size 2 -> blocks [a b][c d][e]; the short tail is a
    # real block (slice clips), so two docs sharing only the tail word dedup.
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e"),
        Row(doc_id=2, text="p q r s e"),
    ])
    rows = {r["doc_id"]: r.asDict() for r in paragraph_dedup(df, block_words=2).collect()}
    assert rows[1]["n_blocks"] == 3 and rows[1]["n_dup_blocks"] == 0
    assert rows[2]["n_blocks"] == 3 and rows[2]["n_dup_blocks"] == 1


def test_repetition_signals_values(spark):
    from amundsendatabuilder_spark.functions.text import repetition_signals

    df = spark.createDataFrame([
        Row(doc_id=1, text="spam spam spam spam"),   # total repetition
        Row(doc_id=2, text="all words are unique"),  # none
        Row(doc_id=3, text="go go stop go"),
    ])
    rows = {r["doc_id"]: r.asDict() for r in repetition_signals(df).collect()}
    r1 = rows[1]
    assert (r1["n_words"], r1["distinct_words"], r1["top_word_count"]) == (4, 1, 4)
    assert r1["dup_word_permille"] == 750           # (4-1)*1000 DIV 4
    assert r1["dup_bigram_permille"] == 666         # bigrams: 3 total, 1 distinct
    r2 = rows[2]
    assert r2["dup_word_permille"] == 0 and r2["dup_bigram_permille"] == 0
    assert r2["top_word_count"] == 1
    r3 = rows[3]
    # words: go x3, stop -> top 3; bigrams: [go go][go stop][stop go] all distinct
    assert (r3["top_word_count"], r3["dup_word_permille"], r3["dup_bigram_permille"]) == (3, 500, 0)


def test_repetition_signals_single_word_doc(spark):
    from amundsendatabuilder_spark.functions.text import repetition_signals

    df = spark.createDataFrame([Row(doc_id=1, text="lonely")])
    r = repetition_signals(df).collect()[0]
    assert r["n_words"] == 1 and r["dup_bigram_permille"] == 0
