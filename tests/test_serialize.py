"""Serialization parity: neo4j CSV shapes (:UNQUOTED headers,
QUOTE_NONNUMERIC) and canonical sorted-key ES JSON + sha256."""

import csv
import hashlib
import json
import os

from pyspark.sql import functions as F

from amundsendatabuilder_spark.functions.serialize import canonical_doc_json, write_neo4j_csv
from amundsendatabuilder_spark.operators.models import NODE_SCHEMA


def test_write_neo4j_csv_shapes(spark, tmp_path):
    nodes = spark.createDataFrame(
        [
            ("hive://gold.s/t", "Table", {"name": "t", "is_view": "false"},
             {"is_view": "bool"}, None),
            ("hive://gold.s/t/c1", "Column",
             {"name": "c1", "type": "bigint", "sort_order": "0"},
             {"sort_order": "int"}, None),
            ("hive://gold.s/t/c2", "Column",
             {"name": "c2", "type": "varchar", "sort_order": "1"},
             {"sort_order": "int"}, None),
        ],
        NODE_SCHEMA,
    )
    files = write_neo4j_csv(nodes, str(tmp_path / "out"))
    by_label = {os.path.basename(f).split("_")[0]: f for f in files}

    with open(by_label["column"]) as f:
        rows = list(csv.reader(f))
    header = rows[0]
    # :UNQUOTED suffix on int attrs (reference neo4_serializer.py:52-59)
    assert "sort_order:UNQUOTED" in header
    assert header[0] == "KEY" and header[-1] == "LABEL"
    # QUOTE_NONNUMERIC: ints unquoted in the raw text
    raw = open(by_label["column"]).read()
    assert '"0"' not in raw.splitlines()[1]

    with open(by_label["table"]) as f:
        t_rows = list(csv.reader(f))
    assert "is_view:UNQUOTED" in t_rows[0]


def test_canonical_doc_json_parity(spark):
    """canonical JSON must byte-match Python json.dumps(sort_keys=True)+'\\n'
    — the reference ElasticsearchDocument.to_json contract — so the sha256
    digests are portable."""
    from amundsendatabuilder_spark.operators.search_docs import DOC_SCHEMA

    doc = {
        "key": "repofs://gold.r/p",
        "database": "repofs",
        "cluster": "gold",
        "schema": "r",
        "name": "p",
        "display_name": "r.p",
        "description": "hello",
        "last_updated_timestamp": 1704067200,
        "column_names": ["a", "b"],
        "column_descriptions": [],
        "total_usage": 0,
        "unique_usage": 0,
        "tags": ["python"],
        "badges": [],
        "schema_description": None,
        "programmatic_descriptions": [],
    }
    df = spark.createDataFrame([tuple(doc[f.name] for f in DOC_SCHEMA.fields)], DOC_SCHEMA)
    out = canonical_doc_json(df).first()
    # Spark's to_json omits null fields; the canonical form re-parses, so the
    # reference computation must drop nulls the same way
    ref = {k: v for k, v in doc.items() if v is not None}
    expected = json.dumps(ref, sort_keys=True) + "\n"
    assert out["doc_json"] == expected
    assert out["doc_sha256"] == hashlib.sha256(expected.encode()).hexdigest()


def test_generic_load_callback(spark, tmp_path):
    """GenericLoader shim: executor-side per-record callback (writes land
    from worker processes, so assert via the filesystem)."""
    import glob
    import json
    import os

    from amundsendatabuilder_spark.functions.serialize import generic_load

    out_dir = str(tmp_path / "sink")
    os.makedirs(out_dir, exist_ok=True)

    def sink(record: dict) -> None:
        p = os.path.join(out_dir, f"{os.getpid()}_{record['k']}.json")
        with open(p, "w") as fh:
            json.dump(record, fh, sort_keys=True)

    df = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "k string, v int")
    generic_load(df, sink)

    got = sorted(
        json.load(open(p))["k"] for p in glob.glob(out_dir + "/*.json"))
    assert got == ["a", "b", "c"]
