"""Fixture-parity serialization — neo4j CSV shapes and canonical ES JSON.

* :func:`serialize_nodes` / :func:`serialize_relationships` reproduce the flat
  dict shape of ``databuilder/serializers/neo4_serializer.py:17-49``: node →
  ``{KEY, LABEL, attr[:UNQUOTED]...}``, relation → ``{START_KEY, START_LABEL,
  END_KEY, END_LABEL, TYPE, REVERSE_TYPE, attr...}``; int/bool attributes get
  the ``:UNQUOTED`` header suffix (``neo4_serializer.py:52-59``).
* :func:`write_neo4j_csv` spools one CSV per (label, schema-shape) with
  ``QUOTE_NONNUMERIC`` semantics, mirroring
  ``databuilder/loader/file_system_neo4j_csv_loader.py:94-191``.
* :func:`canonical_json_udf` is the sorted-key ``to_json`` of
  ``databuilder/models/elasticsearch_document.py:16-23`` — an Arrow-batched
  pandas UDF (Spark's ``to_json`` cannot sort keys), the basis of search-doc
  sha256 parity.
"""

from __future__ import annotations

import csv
import json
import os

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

UNQUOTED_TYPES = {"int", "bool"}


def _collect_attr_names(df: DataFrame) -> list[str]:
    row = df.select(
        F.array_distinct(
            F.flatten(F.collect_list(F.map_keys(F.col("attributes"))))
        ).alias("ks")
    ).first()
    return sorted(row["ks"] or [])


def serialize_nodes(nodes: DataFrame) -> DataFrame:
    """Long-format nodes → flat fixture shape: KEY, LABEL, then each attribute
    as its own column, named ``attr`` or ``attr:UNQUOTED`` per attr_types."""
    names = _collect_attr_names(nodes)
    cols = [F.col("key").alias("KEY"), F.col("label").alias("LABEL")]
    for a in names:
        suffixed = F.when(
            F.col("attr_types").isNotNull()
            & F.col("attr_types").getItem(a).isin(list(UNQUOTED_TYPES)),
            F.lit(f"{a}:UNQUOTED"),
        )
        cols.append(F.col("attributes").getItem(a).alias(a))
        cols.append(suffixed.alias(f"__suffix_{a}"))
    return nodes.select(*cols)


def serialize_relationships(rels: DataFrame) -> DataFrame:
    names = _collect_attr_names(rels)
    cols = [
        F.col("start_key").alias("START_KEY"),
        F.col("start_label").alias("START_LABEL"),
        F.col("end_key").alias("END_KEY"),
        F.col("end_label").alias("END_LABEL"),
        F.col("type").alias("TYPE"),
        F.col("reverse_type").alias("REVERSE_TYPE"),
    ]
    for a in names:
        cols.append(F.col("attributes").getItem(a).alias(a))
        cols.append(
            F.when(
                F.col("attr_types").isNotNull()
                & F.col("attr_types").getItem(a).isin(list(UNQUOTED_TYPES)),
                F.lit(f"{a}:UNQUOTED"),
            ).alias(f"__suffix_{a}")
        )
    return rels.select(*cols)


def write_neo4j_csv(nodes: DataFrame, out_dir: str) -> list[str]:
    """Emit fixture CSVs: one file per (LABEL, attribute-shape), header with
    ``:UNQUOTED`` suffixes, ``QUOTE_NONNUMERIC`` quoting. Driver-side (fixture
    emission is a test artifact, not a hot path)."""
    os.makedirs(out_dir, exist_ok=True)
    pdf = serialize_nodes(nodes).toPandas()
    out: list[str] = []
    attr_cols = [c for c in pdf.columns if c not in ("KEY", "LABEL") and not c.startswith("__suffix_")]
    for label, grp in pdf.groupby("LABEL"):
        present = [a for a in attr_cols if grp[a].notna().any()]
        shapes = grp.assign(
            __shape=grp[present].notna().apply(lambda r: ",".join(sorted(r[r].index)), axis=1)
        )
        for i, (_, sub) in enumerate(shapes.groupby("__shape")):
            cols = [a for a in present if sub[a].notna().any()]
            path = os.path.join(out_dir, f"{label.lower()}_{i}.csv")
            with open(path, "w", newline="") as f:
                w = csv.writer(f, quoting=csv.QUOTE_NONNUMERIC)
                header = ["KEY"] + [
                    sub[f"__suffix_{a}"].dropna().iloc[0]
                    if sub[f"__suffix_{a}"].notna().any()
                    else a
                    for a in cols
                ] + ["LABEL"]
                w.writerow(header)
                for _, r in sub.sort_values("KEY").iterrows():
                    vals: list = [r["KEY"]]
                    for a in cols:
                        if sub[f"__suffix_{a}"].notna().any():
                            v = r[a]
                            vals.append(int(v) if str(v).lstrip("-").isdigit() else v)
                        else:
                            vals.append(r[a])
                    vals.append(r["LABEL"])
                    w.writerow(vals)
            out.append(path)
    return out


from pyspark.sql import types as _T


@pandas_udf(_T.StringType())
def canonical_json_udf(s: pd.Series) -> pd.Series:
    """Sorted-key JSON of a struct column (already JSON-encoded via to_json is
    NOT sorted; this re-parses and dumps with sort_keys) + trailing newline —
    byte-parity with ``ElasticsearchDocument.to_json``."""
    return s.map(lambda x: json.dumps(json.loads(x), sort_keys=True) + "\n")


def canonical_doc_json(docs: DataFrame) -> DataFrame:
    """search docs → (key, doc_json, doc_sha256) with canonical sorted-key
    JSON; the sha256 column is the parity digest."""
    packed = docs.select(
        F.col("key"),
        F.to_json(F.struct(*[c for c in docs.columns])).alias("raw"),
    )
    return packed.select(
        "key",
        canonical_json_udf(F.col("raw")).alias("doc_json"),
    ).withColumn("doc_sha256", F.sha2(F.col("doc_json"), 256))


def generic_load(df: DataFrame, callback) -> None:
    """GenericLoader equivalent (``databuilder/loader/generic_loader.py:26-48``):
    invoke a user callback for every record. The reference calls the
    callback driver-side one record at a time; here it runs EXECUTOR-side
    via ``foreachPartition`` (callback receives one dict per row), so a
    custom sink keeps up at data scale — the callback must be picklable
    and side-effect only (idempotent under task retries). None records
    are skipped like the reference's ``if not record`` guard.

    Streaming: pass a batch hook through foreachBatch —
    ``stream.foreachBatch(lambda b, eid: generic_load(b, cb))``."""
    def run(rows) -> None:
        for r in rows:
            if r is None:
                continue
            callback(r.asDict())

    df.foreachPartition(run)
