"""Corpus curation pipeline — the training-data path composed end to end.

One call chains the curation operators the way a 100 TB pre-training
sweep would: exact dedup → SimHash near-dup clustering → canonical-doc
selection → benchmark decontamination → PII scrubbing → quality/lang
annotation → deterministic stratified sampling.  Reachable from
spark-submit via ``python -m amundsendatabuilder_spark.job --curate``.

Composition notes (scale): every stage is a DataFrame transformation on
the running corpus frame — Catalyst fuses the scrub/annotate/sample
stages into the same scan pass; the only shuffles are the dedup
aggregations, the near-dup candidate join, and the keep-list
anti-joins (broadcast when small).  Drop decisions are all
deterministic functions of content, so a resumed or re-run curation
over the same snapshot emits the identical corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 1,
    contamination_ngram: int = 5,
    sample_rates: dict[str, int] | None = None,
    sample_default_rate: int | None = None,
    max_candidate_pairs: int | None = 100_000_000,
) -> tuple[DataFrame, dict]:
    """Run the full curation chain; returns ``(curated_frame, metrics)``.

    Metrics count what each stage removed — a curation run that silently
    caps or drops is not auditable, so every reduction is reported.
    """
    from amundsendatabuilder_spark.functions.components import (
        canonical_per_component,
        connected_components,
    )
    from amundsendatabuilder_spark.functions.curation import (
        decontaminate,
        pii_scrub_cols,
        stratified_sample,
    )
    from amundsendatabuilder_spark.functions.dedup import simhash_near_pairs
    from amundsendatabuilder_spark.functions.text import (
        doc_fingerprint,
        lang_id,
        quality_score,
    )

    def _mat(frame: DataFrame) -> DataFrame:
        # materialize at stage boundaries: each stage's metrics count()
        # and the next stage both read the materialized result instead
        # of replaying the whole lineage from the parquet scan
        return frame.localCheckpoint(eager=True)

    docs = _mat(docs)
    metrics: dict = {"input_docs": docs.count()}

    # 1. exact dedup: keep the smallest id per content fingerprint
    fp = docs.select(F.col(id_col), doc_fingerprint(F.col(text_col)).alias("_fp"))
    keep_exact = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    cur = _mat(docs.join(keep_exact.select(id_col), id_col, "semi"))
    metrics["exact_dup_dropped"] = metrics["input_docs"] - cur.count()

    # 2. near-dup clusters -> one canonical member each
    pairs = simhash_near_pairs(
        cur, id_col=id_col, text_col=text_col, max_hamming=max_hamming,
        max_candidate_pairs=max_candidate_pairs)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    prefer = ["n_chars"] if "n_chars" in cur.columns else []
    canon = canonical_per_component(comp, cur, id_col=id_col, prefer=prefer)
    drop_near = comp.join(
        canon.select(F.col("canonical_id").alias("node")), "node", "anti")
    cur = _mat(cur.join(drop_near.select(F.col("node").alias(id_col)),
                        id_col, "anti"))
    before = metrics["input_docs"] - metrics["exact_dup_dropped"]
    metrics["near_dup_dropped"] = before - cur.count()

    # 3. benchmark decontamination (drop any doc sharing a shingle)
    if benchmark is not None:
        contaminated = _mat(decontaminate(
            cur, benchmark, id_col=id_col, text_col=text_col,
            n=contamination_ngram))
        cur = cur.join(contaminated.select(id_col), id_col, "anti")
        metrics["contaminated_dropped"] = int(contaminated.count())

    # 4.+5. PII scrub IN PLACE (text replaced by the redacted form) and
    # quality/language annotation — one fused scan pass, no self-join
    scrub_col, count_cols = pii_scrub_cols(text_col)
    cur = _mat(
        cur.select(
            *[c for c in cur.columns if c != text_col],
            scrub_col.alias(text_col),
            *count_cols,
        )
    )
    redactions = cur.agg(
        F.sum("n_email").alias("e"), F.sum("n_ssn").alias("s"),
        F.sum("n_phone").alias("p")).first()
    metrics["pii_redactions"] = {
        "email": int(redactions["e"] or 0),
        "ssn": int(redactions["s"] or 0),
        "phone": int(redactions["p"] or 0),
    }
    cur = (
        cur.drop("n_email", "n_ssn", "n_phone")
        .withColumn("quality", quality_score(F.col(text_col)))
        .withColumn("lang_pred", lang_id(F.col(text_col)))
    )

    # 6. deterministic stratified sampling (optional)
    if sample_rates or sample_default_rate is not None:
        cur = _mat(cur)
        n_before = cur.count()
        cur = stratified_sample(
            cur,
            strata_col="lang_pred",
            rates=sample_rates or {},
            default_rate=(100 if sample_default_rate is None
                          else sample_default_rate),
            key_col=id_col,
        )
        metrics["sampled_out"] = n_before - cur.count()

    cur = _mat(cur)
    metrics["output_docs"] = cur.count()
    return cur, metrics
