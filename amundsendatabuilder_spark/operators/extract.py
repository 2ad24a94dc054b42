"""Entity extraction — changelog upsert rows → enriched entity rows.

The reference extracts metadata entities record-at-a-time in Python model
constructors (``databuilder/models/table_metadata.py:193``); here the entire
extraction is JVM-side column expressions (regexp/sha2/split — whole-stage
codegen, zero Python in the hot path), which is the vectorized-or-better
version of the input_hint's "pandas/Arrow UDFs, no per-row Python".

Mapping (SURVEY §1.2): db=``repofs``, cluster=``gold``, schema=``repo``,
table=``path``; per-file extracted functions ≈ columns; owner derived from
commit; version watermark from the content header; per-row invariant
``content_sha256 = sha2(content, 256)`` (hex, matches hashlib sha256).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amundsendatabuilder_spark.functions import keys as K

# function-definition patterns per language (generator emits python-style
# `def` for all langs; real-world patterns kept for the lang-aware path)
_FN_PATTERNS = {
    "go": r"func (\w+)",
    "scala": r"def (\w+)",
    "java": r"(?:void|int|String) (\w+)\(",
}
_DEFAULT_FN_PATTERN = r"def (\w+)\("


def extract_entities(upserts: DataFrame, cluster: str = K.CLUSTER) -> DataFrame:
    """Enrich LWW-deduped upsert rows with every derived entity feature the
    model expansion needs. Input: (repo, path, commit, lang, content,
    event_ts[, ...]); one row per (repo, path)."""
    pattern = F.lit(_DEFAULT_FN_PATTERN)
    for lang, pat in _FN_PATTERNS.items():
        pattern = F.when(F.col("lang") == lang, F.lit(pat)).otherwise(pattern)

    tbl_key = K.table_key(F.col("repo"), F.col("path"), cluster)
    return (
        upserts.withColumn("database", F.lit(K.DATABASE))
        .withColumn("cluster", F.lit(cluster))
        .withColumn("database_key", K.database_key())
        .withColumn("cluster_key", K.cluster_key(cluster))
        .withColumn("schema_key", K.schema_key(F.col("repo"), cluster))
        .withColumn("table_key", tbl_key)
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .withColumn("description", F.substring_index(F.col("content"), "\n", 1))
        # function names + their trailing body comments (≈ column descriptions,
        # reference ColumnMetadata.description / Column→Description nodes,
        # ``databuilder/models/table_metadata.py:156-190``). Dedup by name:
        # duplicate function names in one file would expand to duplicate
        # Column-node keys, and the keyed MERGE requires the batch to be
        # unique per key (ADVICE r01). First occurrence keeps its rank and
        # comment — deterministic.
        .withColumn("__fn_raw", F.regexp_extract_all(F.col("content"), pattern, F.lit(1)))
        .withColumn(
            "__cm_raw",
            F.regexp_extract_all(F.col("content"), F.lit(r"return [^\n#]*#\s*([^\n]*)"), F.lit(1)),
        )
        .withColumn(
            "__fn_pairs",
            F.filter(
                F.transform(
                    "__fn_raw",
                    lambda fn, i: F.struct(
                        fn.alias("fn"),
                        # comments align positionally only when every function
                        # body carries one; otherwise descriptions are unknown
                        F.when(
                            F.size("__cm_raw") == F.size("__fn_raw"),
                            F.element_at("__cm_raw", i + F.lit(1)),
                        ).alias("comment"),
                    ),
                ),
                lambda p, i: F.array_position(F.col("__fn_raw"), p["fn"]) == i + 1,
            ),
        )
        .withColumn("functions", F.col("__fn_pairs.fn"))
        .withColumn("fn_comments", F.col("__fn_pairs.comment"))
        .drop("__fn_raw", "__cm_raw", "__fn_pairs")
        .withColumn(
            "version",
            F.coalesce(
                F.nullif(
                    F.regexp_extract(F.col("content"), r" v(\d+)\n", 1), F.lit("")
                ).cast("long"),
                F.lit(0),
            ),
        )
        .withColumn(
            "owner_email",
            F.concat(
                F.lit("user_"),
                (F.conv(F.substring(F.col("commit"), 1, 4), 16, 10).cast("long") % 50).cast("string"),
                F.lit("@example.com"),
            ),
        )
        .withColumn("last_updated_epoch", F.unix_timestamp(F.col("event_ts")))
    )
