"""Deterministic synthetic changelog over a corpus of source-code repositories.

Input shape fixed by FIXTURES.md §1/§2: binlog-style change events
``(event_id, event_ts, op, repo, path, commit, lang, content, shard)`` over a
``repo_files(repo, path, commit, lang, content)`` table. The generator is the
Spark-side stand-in for the reference's Kafka micro-batch source
(``databuilder/extractor/kafka_source_extractor.py:136-171``) at bench scale.

Determinism contract (FIXTURES.md): **every field is a pure function of
``event_id`` and the seed** via a splitmix64-style mixer, so output content is
bit-identical across runs, partition counts, and parallelism levels — the same
rows come out at local[8] and local[32]. Duplicate deliveries (~1%) and
bounded out-of-order timestamps are injected deterministically to exercise the
LWW dedup. Generation is `spark.range` + `mapInPandas` with pure-numpy
vectorized math — no per-row Python.

Skew (north_rule): entity selection is quadratically biased toward low entity
ids, and repo r owns 2^r paths, so the highest repo is a "mega-repo" holding
~half of all paths — hot keys on both the entity and repo axes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("op", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("shard", T.IntegerType()),
    ]
)

LANGS = np.array(["python", "java", "scala", "go", "js", "md", "yaml", "sql"])
_WORDS = np.array(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega parse merge scan sort "
    "hash join batch stream spark window shuffle bucket vector arrow".split()
)
_BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer — uint64 in, uint64 out, vectorized."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64((salt * 0x9E3779B97F4A7C15) % (1 << 64))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _hex16(a: np.ndarray) -> np.ndarray:
    return np.char.mod("%016x", a.astype(np.uint64))


def _events_pdf(eid: np.ndarray, n_entities: int, seed: int) -> pd.DataFrame:
    """Vectorized event synthesis for a batch of event_ids."""
    sd = np.uint64(seed)
    # ~1% duplicate deliveries: event N re-delivers event N-1's payload wholesale
    is_dup = (_mix(eid + sd, 99) % np.uint64(100) == 0) & (eid > 0)
    lid = eid - is_dup.astype(np.uint64)

    u = _mix(lid + sd, 1).astype(np.float64) / 2**64
    entity = np.minimum((u * u * n_entities).astype(np.int64), n_entities - 1)
    repo_id = np.floor(np.log2(entity + 1)).astype(np.int64)
    version = (_mix(lid + sd, 2) % np.uint64(5)).astype(np.int64)
    is_delete = (_mix(lid + sd, 3) % np.uint64(10)) == 0
    jitter = (_mix(lid + sd, 4) % np.uint64(600)).astype(np.int64)
    ts_sec = _BASE_EPOCH + lid.astype(np.int64) * 2 - jitter

    ent64 = entity.astype(np.uint64)
    commit = np.char.add(
        np.char.add(
            _hex16(_mix(ent64 * np.uint64(31) + _mix(lid + sd, 2), 5)),
            _hex16(_mix(ent64 + sd, 6)),
        ),
        _hex16(_mix(lid + sd, 7)),
    ).astype("U40")  # truncate 48 hex → 40-char commit sha

    lang = LANGS[(_mix(ent64 + sd, 8) % np.uint64(len(LANGS))).astype(np.int64)]
    repo = np.char.add("org/project-", np.char.mod("%03d", repo_id))
    path = np.char.add(
        np.char.add(
            np.char.add("src/mod_", np.char.mod("%02d", entity % 97)),
            np.char.mod("/file_%d", entity),
        ),
        ".txt",
    )

    # deterministic pseudo-source: header comment + imports + 1-4 function defs
    nw = len(_WORDS)
    w1 = _WORDS[(_mix(ent64 + version.astype(np.uint64), 10) % np.uint64(nw)).astype(np.int64)]
    w2 = _WORDS[(_mix(ent64 + version.astype(np.uint64), 11) % np.uint64(nw)).astype(np.int64)]
    n_funcs = 1 + (_mix(ent64, 12) % np.uint64(4)).astype(np.int64)
    blocks = []
    for i in range(4):
        fname = np.char.add(
            np.char.add(
                "fn_",
                np.char.mod("%08x", _mix(ent64 * np.uint64(7) + np.uint64(i), 13) % np.uint64(1 << 32)),
            ),
            np.char.mod("_%d", version),
        )
        block = np.char.add(
            np.char.add("def ", fname),
            np.char.add("(x):\n    return x  # ", np.char.add(w1, np.char.add(" ", w2))),
        )
        blocks.append(np.where(n_funcs > i, np.char.add(block, "\n"), ""))
    header = np.char.add(
        np.char.add("# module ", path),
        np.char.add(np.char.mod(" v%d\n", version), np.char.add("import ", np.char.add(w1, "\n"))),
    )
    content = np.char.add(header, np.char.add(blocks[0], np.char.add(blocks[1], np.char.add(blocks[2], blocks[3]))))

    pdf = pd.DataFrame(
        {
            "event_id": eid.astype(np.int64),
            "event_ts": pd.to_datetime(ts_sec, unit="s"),
            "op": np.where(is_delete, "delete", np.where(version == 0, "insert", "update")),
            "repo": repo,
            "path": path,
            "commit": commit,
            "lang": lang,
            "content": pd.Series(np.where(is_delete, None, content)),
            "shard": (eid // np.uint64(100_000)).astype(np.int32),
        }
    )
    return pdf


def changelog_df(
    spark: SparkSession,
    n_events: int,
    n_entities: int | None = None,
    seed: int = 42,
    num_partitions: int | None = None,
    start: int = 0,
) -> DataFrame:
    """Distributed deterministic changelog of ``n_events`` rows starting at
    event_id ``start`` (chunk by ``start`` for micro-batch replay)."""
    n_entities = n_entities or max(64, n_events // 10)
    parts = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                yield _events_pdf(b["id"].to_numpy(dtype=np.uint64), n_entities, seed)

    return (
        spark.range(start, start + n_events, 1, parts)
        .mapInPandas(gen, schema=CHANGELOG_SCHEMA)
    )


def write_changelog_chunks(
    spark: SparkSession,
    out_dir: str,
    n_events: int,
    n_chunks: int,
    n_entities: int | None = None,
    seed: int = 42,
) -> list[str]:
    """Materialize the changelog as ``n_chunks`` parquet files (one per
    micro-batch) for file-source streaming replay. Returns chunk paths."""
    per = n_events // n_chunks
    paths = []
    for i in range(n_chunks):
        cnt = per if i < n_chunks - 1 else n_events - per * (n_chunks - 1)
        df = changelog_df(spark, cnt, n_entities or max(64, n_events // 10), seed,
                          start=i * per)
        p = f"{out_dir}/chunk_{i:05d}"
        df.write.mode("overwrite").parquet(p)
        paths.append(p)
    return paths


def expected_final_state(changelog: DataFrame) -> DataFrame:
    """Ground-truth final ``repo_files`` state: independent LWW computation
    (max (event_ts, commit) per (repo, path); delete wins ⇒ row absent).
    Used by tests to validate the engine end-state — NOT by the engine."""
    w = F.struct("event_ts", "commit", "op", "lang", "content").alias("s")
    return (
        changelog.groupBy("repo", "path")
        .agg(F.max(w).alias("s"))
        .where(F.col("s.op") != "delete")
        .select(
            "repo", "path",
            F.col("s.commit").alias("commit"),
            F.col("s.lang").alias("lang"),
            F.col("s.content").alias("content"),
            F.col("s.event_ts").alias("event_ts"),
        )
    )
