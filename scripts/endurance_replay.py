"""Endurance replay — the 10^10-event posture evidence (r3 VERDICT #7).

Runs a >=16-epoch MoR replay interleaving cdc epochs with usage epochs,
with compaction cadence and a simulated mid-run kill (a SECOND pipeline
object over the same warehouse re-replays everything; the epoch ledger
must no-op the already-applied prefix). Asserts digest parity vs an
identical CoW replay and records PER-EPOCH walls — the O(batch) claim is
"per-epoch wall stays flat as the table grows", quantified here as the
ratio of the last-quarter mean epoch wall to the second-quarter mean.

Usage: python3 scripts/endurance_replay.py [events] [chunks] [out.json]
Defaults: 2_000_000 events, 16 chunks, BENCH_ENDURANCE_last_run.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

WORK = "/dev/shm/endurance" if os.path.isdir("/dev/shm") else tempfile.gettempdir()

os.makedirs(WORK, exist_ok=True)
if os.path.isdir("/dev/shm") and "SPARK_LOCAL_DIRS" not in os.environ:
    d = "/dev/shm/spark_endurance_local"
    os.makedirs(d, exist_ok=True)
    os.environ["SPARK_LOCAL_DIRS"] = d

from pyspark.sql import functions as F  # noqa: E402

from amundsendatabuilder_spark.session import get_spark  # noqa: E402
from amundsendatabuilder_spark.sources.changelog import (  # noqa: E402
    CHANGELOG_SCHEMA,
    write_changelog_chunks,
)
from amundsendatabuilder_spark.streaming.pipeline import CDCPipeline  # noqa: E402


def usage_batch(spark, chunk_path, seed):
    """Deterministic usage events derived from the chunk's entity keys."""
    keys = (
        spark.read.schema(CHANGELOG_SCHEMA).parquet(chunk_path)
        .select("repo", "path").distinct().limit(2000)
    )
    return keys.select(
        "repo", "path",
        F.concat(F.lit("u"), (F.xxhash64("repo", "path", F.lit(seed)) % 50)
                 .cast("string"), F.lit("@x.com")).alias("user_email"),
        (F.abs(F.xxhash64("path", F.lit(seed))) % 5 + 1).alias("read_count"),
    )


def digest(pipe):
    parts = []
    for tbl in (pipe.repo_files, pipe.graph_nodes, pipe.graph_relations,
                pipe.search_documents, pipe.table_usage):
        df = tbl.read()
        cols = sorted(c for c in df.columns
                      if c not in ("publish_tag", "updated_ms"))
        row = (df.select(F.sha2(F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in cols]), 256).alias("h"))
            .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10)
                       .cast("decimal(38,0)")).alias("s")).first())
        parts.append(str(row["s"]))
    return "|".join(parts)


def run_replay(spark, chunks, mode, kill_at=None, n_buckets=64):
    wh = tempfile.mkdtemp(prefix=f"end_{mode}_", dir=WORK)
    walls = []
    compactions = []  # per-epoch {buckets, files, bytes} or None
    pipe = CDCPipeline(spark, wh, n_buckets=n_buckets, table_mode=mode,
                       compact_every=4)
    epoch = 0
    resumed_skips = 0
    for i, p in enumerate(chunks):
        if kill_at is not None and i == kill_at:
            # simulated kill: abandon the pipeline object mid-run and build
            # a fresh one over the same warehouse (new process semantics);
            # re-replay EVERYTHING — the ledger must skip the applied prefix
            pipe = CDCPipeline(spark, wh, n_buckets=n_buckets, table_mode=mode,
                               compact_every=4)
            for j, q in enumerate(chunks[:i]):
                m = pipe.apply_batch(
                    spark.read.schema(CHANGELOG_SCHEMA).parquet(q), 2 * j)
                if m.get("skipped"):
                    resumed_skips += 1
                pipe.apply_usage(usage_batch(spark, q, j), 2 * j + 1)
        t0 = time.time()
        mb = pipe.apply_batch(spark.read.schema(CHANGELOG_SCHEMA).parquet(p), 2 * i)
        walls.append(round(time.time() - t0, 2))
        mu = pipe.apply_usage(usage_batch(spark, p, i), 2 * i + 1)
        comp = None
        for m in (mb, mu):
            c = m.get("compaction")
            if c:
                comp = {k: (comp or {}).get(k, 0) + v for k, v in c.items()}
        compactions.append(comp)
    d = digest(pipe)
    rows = pipe.current_entities().count()
    shutil.rmtree(wh, ignore_errors=True)
    return {"mode": mode, "epoch_walls": walls, "digest": d, "rows": rows,
            "resumed_skips": resumed_skips, "compactions": compactions}


def main():
    events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out_path = (sys.argv[3] if len(sys.argv) > 3
                else "/root/repo/BENCH_ENDURANCE_last_run.json")
    kill_at = n_chunks // 2

    spark = get_spark("endurance", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    cl = tempfile.mkdtemp(prefix="end_cl_", dir=WORK)
    chunks = write_changelog_chunks(spark, cl, events, n_chunks,
                                    n_entities=max(1000, events // 10))
    t0 = time.time()
    mor = run_replay(spark, chunks, "mor", kill_at=kill_at)
    cow = run_replay(spark, chunks, "cow")
    shutil.rmtree(cl, ignore_errors=True)

    w = mor["epoch_walls"]
    q = max(1, len(w) // 4)

    def med(xs):
        s = sorted(xs)
        return (s[len(s) // 2] + s[(len(s) - 1) // 2]) / 2

    # median, not mean: this host throws single 2-3x outlier epochs
    # (documented variance), and one of those should not read as growth
    flatness = round(med(w[-q:]) / med(w[q:2 * q]), 3)
    out = {
        "events": events, "chunks": n_chunks, "kill_at_epoch": kill_at,
        "mor_epoch_walls": mor["epoch_walls"],
        # per-epoch compaction bytes/files (None = no compaction that epoch):
        # separates compaction-cadence cost from host noise in the flatness
        # reading (r4 VERDICT directive 8)
        "mor_epoch_compactions": mor["compactions"],
        "cow_epoch_walls": cow["epoch_walls"],
        "digest_parity_mor_vs_cow": mor["digest"] == cow["digest"],
        "resumed_skips": mor["resumed_skips"],
        "rows": mor["rows"],
        # last-quarter mean / second-quarter mean of MoR epoch walls:
        # ~1.0 = per-epoch cost is O(batch), not O(table)
        "epoch_wall_flatness_ratio": flatness,
        "total_wall_sec": round(time.time() - t0, 1),
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
