"""Training-data curation operators: chunking, decontamination, PII
scrubbing, deterministic stratified sampling.

These extend the reference's transformer family (which is per-record
string munging, e.g. ``databuilder/transformer/regex_str_replace_transformer.py:41-43``)
with the set-level operations an LLM training-data pipeline runs at
100 TB.  Everything here is pure ``pyspark.sql.functions`` column
algebra — no Python UDFs, whole-stage-codegen throughout — and every
random-looking decision (sampling, chunk boundaries) is a deterministic
function of the row, so reruns and resumed replays produce identical
output (the same determinism contract as the CDC digests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split each document into overlapping token windows: chunk ``i``
    covers tokens ``[i*stride, i*stride+size)``; the last chunk may be
    short but every token is covered and consecutive chunks overlap by
    ``size - stride`` tokens.  Returns ``(id, chunk_id, n_tokens,
    chunk_text)``.

    Scale shape: tokenize + per-row ``sequence``/``posexplode`` — a
    narrow map-side explode with NO shuffle at all (`.explain` shows a
    single WholeStageCodegen over the scan), so it streams at parquet
    read speed regardless of corpus size; output partitioning follows
    the input files.
    """
    if not (0 < stride <= size):
        raise ValueError("need 0 < stride <= size")
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(0, n - size) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(size), F.lit(0)) / F.lit(stride)
    ).cast("int")
    exploded = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, size)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination by word ``n``-gram overlap: for every
    training doc, count how many DISTINCT ``n``-gram shingles it shares
    with the benchmark corpus.  Returns ``(id, n_shared)`` for docs with
    at least one shared shingle (the contaminated set a pipeline would
    drop or audit).

    Scale shape: the benchmark side is small (eval sets are thousands of
    docs, not billions), so its distinct shingle set is broadcast —
    the training corpus streams through a broadcast semi-join-style hash
    probe plus a map-side partial count; the only shuffle is the final
    per-doc count aggregation on already-filtered rows.
    """
    def shingles(frame: DataFrame, with_id: bool) -> DataFrame:
        ws = _tokens(F.lower(F.col(text_col)))
        sh = F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(ws) - n, F.lit(0))),
                lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
            )
        )
        cols = [F.col(id_col)] if with_id else []
        out = frame.where(F.size(ws) >= n).select(
            *cols, F.explode(sh).alias("shingle")
        )
        return out if with_id else out.distinct()

    bench_shingles = shingles(benchmark, with_id=False)
    return (
        shingles(docs, with_id=True)
        .join(F.broadcast(bench_shingles), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


PII_RULES: list[tuple[str, str, str]] = [
    # (rule name, pattern, replacement) — patterns restricted to syntax
    # RE2 and java.util.regex agree on (no backrefs / lookaround).
    ("email", r"[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+", "<EMAIL>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("phone", r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
]


def pii_scrub_cols(text_col: str = "text") -> tuple[Column, list[Column]]:
    """Column-expression form of the PII scrub: returns the scrubbed-text
    column plus the per-rule match-count columns (aliased ``n_<rule>``),
    for callers that apply the redaction IN PLACE — Catalyst fuses the
    whole chain into the surrounding scan, no join or shuffle."""
    scrubbed = F.col(text_col)
    counts = []
    for name, pat, repl in PII_RULES:
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat))
                      .cast("long").alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return scrubbed, counts


def pii_scrub(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Redact email / SSN-shaped / phone-shaped substrings, returning
    ``(id, scrubbed, n_email, n_ssn, n_phone)``.  Pure
    ``regexp_replace`` / ``regexp_count`` column chain: JVM-side regex
    over each row, no shuffle, no Python.  Rule patterns stay inside the
    RE2 ∩ java.util.regex common subset so the same rules run verbatim
    on engines that compile to either (and in the DuckDB oracle).
    """
    scrubbed, counts = pii_scrub_cols(text_col)
    return df.select(F.col(id_col), scrubbed.alias("scrubbed"), *counts)


def stratified_sample(
    df: DataFrame,
    strata_col: str = "lang",
    rates: dict[str, int] | None = None,
    default_rate: int = 10,
    key_col: str = "doc_id",
    salt: str = "s1",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff
    ``md5(salt|key) mod 100 <`` the stratum's percentage rate.  The
    decision is a pure function of (salt, key) — independent of
    partitioning, task retries, and cluster width — which is what makes
    the sample reproducible in a resumed 10^10-event replay (Spark's
    ``df.sample`` is seed-per-partition and NOT stable under
    repartitioning).  The md5→int idiom matches the engine's other
    cross-engine-deterministic hashes (``dedup.hash64``).

    Filter-only: no shuffle, predicate sits directly on the scan.
    """
    rates = rates or {}
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + "|"), F.col(key_col).cast("string"))),
                1, 15,
            ),
            16, 10,
        ).cast("long") % 100
    )
    rate = F.lit(default_rate)
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(r)).otherwise(rate)
    return df.where(bucket < rate)
