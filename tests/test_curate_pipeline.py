"""End-to-end corpus curation chain (curate.py + the job.py --curate CLI
path): exact dups collapse to one survivor, near-dup clusters keep the
longest member, benchmark-contaminated docs drop, PII is scrubbed, and
the metrics account for every removal."""

import json

from pyspark.sql import Row

from amundsendatabuilder_spark.curate import curate_corpus

LONG_A = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lambda mu nu xi omicron pi rho sigma tau upsilon")


def _docs(spark):
    rows = [
        # exact dup pair (identical after fingerprint normalization)
        Row(doc_id=1, text="Hello World", n_chars=11),
        Row(doc_id=2, text="hello world", n_chars=11),
        # near-dup pair (3 of ~21 words differ -> simhash hamming 4;
        # tests pass max_hamming=6) — longer member wins
        Row(doc_id=3, text=LONG_A, n_chars=len(LONG_A)),
        Row(doc_id=4, text=LONG_A.replace("sigma", "sigmaz") + " extra",
            n_chars=len(LONG_A) + 7),
        # contaminated vs benchmark
        Row(doc_id=5, text="the quick brown fox jumps over the lazy dog ok",
            n_chars=46),
        # clean survivor with PII
        Row(doc_id=6, text="contact me at someone@example.com for details "
                           "about widgets and gadgets today", n_chars=77),
    ]
    return spark.createDataFrame(rows)


def test_curate_corpus_stages(spark):
    bench = spark.createDataFrame(
        [Row(doc_id=99, text="the quick brown fox jumps over the lazy dog")])
    curated, metrics = curate_corpus(_docs(spark), benchmark=bench,
                                     max_hamming=6)
    ids = {r["doc_id"] for r in curated.select("doc_id").collect()}

    assert metrics["input_docs"] == 6
    assert metrics["exact_dup_dropped"] == 1          # 2 collapses into 1
    assert metrics["near_dup_dropped"] == 1           # 3 loses to longer 4
    assert metrics["contaminated_dropped"] == 1       # 5
    assert metrics["pii_redactions"]["email"] == 1    # doc 6
    assert metrics["output_docs"] == len(ids)
    assert ids == {1, 4, 6}

    scrubbed = {r["doc_id"]: r["text"] for r in curated.collect()}
    assert "<EMAIL>" in scrubbed[6] and "@" not in scrubbed[6]
    # annotation columns present
    assert {"quality", "lang_pred"} <= set(curated.columns)


def test_curate_cli(spark, tmp_path):
    from amundsendatabuilder_spark import job

    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    _docs(spark).write.parquet(docs_dir)
    rc = job.main(["--curate", "--docs", docs_dir, "--output", out_dir,
                   "--max-hamming", "6"])
    assert rc == 0
    got = spark.read.parquet(out_dir)
    assert got.count() == 4  # no benchmark -> doc 5 survives
    assert "quality" in got.columns


def test_curate_deterministic_rerun(spark):
    a, _ = curate_corpus(_docs(spark), max_hamming=6)
    b, _ = curate_corpus(_docs(spark).repartition(5), max_hamming=6)
    assert sorted(r["doc_id"] for r in a.collect()) == \
           sorted(r["doc_id"] for r in b.collect())
