"""spark-submit entrypoint for the CDC engine.

Usage (north_rule packaging: ``spark-submit --py-files``):

    zip -r engine.zip amundsendatabuilder_spark/
    spark-submit --py-files engine.zip -m ... amundsendatabuilder_spark/job.py \
        --warehouse /data/warehouse --source /data/changelog \
        --checkpoint /data/ckpt [--stream | --batch] [--buckets 4096]

Batch mode replays parquet chunk dirs as one epoch each; stream mode runs the
Structured Streaming file source with ``availableNow`` (drain + stop) or
continuously with ``--follow``. A synthetic changelog can be generated with
``--generate N`` for load testing.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="PySpark CDC ingest engine")
    p.add_argument("--conf", help="JSON config file; scoped keys under"
                   " 'pipeline.*' (warehouse, buckets, cluster, source,"
                   " checkpoint) supply defaults that CLI flags override —"
                   " the reference's Scoped.get_scoped_conf idiom"
                   " (databuilder/__init__.py:63-75)")
    p.add_argument("--warehouse")
    p.add_argument("--source", help="changelog parquet dir (stream/batch input)")
    p.add_argument("--checkpoint", help="streaming checkpoint dir")
    p.add_argument("--buckets", type=int, default=4096)
    p.add_argument("--cluster", default="gold")
    p.add_argument("--stream", action="store_true")
    p.add_argument("--follow", action="store_true",
                   help="stream continuously instead of availableNow")
    p.add_argument("--max-files-per-trigger", type=int, default=16)
    p.add_argument("--generate", type=int, default=0,
                   help="generate N synthetic changelog events into --source")
    p.add_argument("--chunks", type=int, default=8)
    p.add_argument("--vacuum-tombstones-ms", type=int, default=0)
    p.add_argument("--expire-snapshots", type=int, default=0, metavar="N",
                   help="after the run, drop manifests older than the last"
                        " N versions and delete unreferenced data files"
                        " (Iceberg expire_snapshots + remove_orphan_files)")
    p.add_argument("--expire-grace-ms", type=int, default=3_600_000)
    p.add_argument("--catalog-scan", action="store_true",
                   help="scan the session catalog (DESCRIBE walk + fs probe)"
                        " into the graph tables as one catalog epoch")
    p.add_argument("--catalog-epoch", type=int, default=0)
    p.add_argument("--catalog-schemas", default="",
                   help="comma-separated schema allowlist for --catalog-scan")
    p.add_argument("--catalog-database", default="delta")
    p.add_argument("--curate", action="store_true",
                   help="run the corpus-curation chain (exact dedup ->"
                        " near-dup clusters -> canonical keep -> decontam"
                        " -> PII scrub -> quality/lang -> sample) over"
                        " --docs, writing --output")
    p.add_argument("--docs", help="documents parquet for --curate")
    p.add_argument("--benchmark",
                   help="optional benchmark parquet for decontamination")
    p.add_argument("--output", help="curated-corpus output dir for --curate")
    p.add_argument("--sample-rates", default="",
                   help='JSON dict of per-language percentage rates,'
                        ' e.g. {"en": 50}')
    p.add_argument("--max-hamming", type=int, default=1,
                   help="SimHash near-dup threshold for --curate")
    p.add_argument("--profile", action="store_true",
                   help="profile --docs columns (min/max/nulls/distinct)"
                        " into TableColumnStats rows, printed as JSON")
    p.add_argument("--profile-cols", default="",
                   help="comma-separated columns for --profile"
                        " (default: all non-text columns)")
    p.add_argument("--sessions", action="store_true",
                   help="replay --source event parquet (chunk_* dirs ="
                        " epochs, else one epoch) into per-user sessions"
                        " via the exactly-once 'sessions' channel")
    p.add_argument("--session-gap-min", type=int, default=30)
    p.add_argument("--ingest-csv",
                   help="replay the reference's example/sample_data CSV"
                        " fixture family (21 files) through every entity"
                        " path into the graph tables as one fixture epoch,"
                        " then rebuild the three ES doc families")
    p.add_argument("--ingest-epoch", type=int, default=0)
    p.add_argument("--export-docs",
                   help="optional dir for --ingest-csv to write canonical"
                        " ES JSON docs (table/user/dashboard)")
    p.add_argument("--no-fs-probe", action="store_true",
                   help="skip the filesystem mtime probe for tables whose"
                        " catalog detail carries no lastModified")
    p.add_argument("--history", metavar="TABLE",
                   help="print the commit log (snapshots metadata table) of"
                        " one warehouse table as JSON and exit")
    p.add_argument("--changes", nargs="+", metavar=("TABLE FROM", "TO"),
                   help="print the incremental change feed of TABLE between"
                        " snapshot FROM and TO (default: current) — counts"
                        " per _change_type; --output writes the feed rows"
                        " to parquet")
    args = p.parse_args(argv)

    if args.conf:
        from amundsendatabuilder_spark.orchestration import scoped_conf

        with open(args.conf) as fh:
            pconf = scoped_conf(json.load(fh), "pipeline")
        for key in ("warehouse", "source", "checkpoint", "cluster"):
            if getattr(args, key) in (None, p.get_default(key)):
                setattr(args, key, pconf.get(key, getattr(args, key)))
        if args.buckets == p.get_default("buckets"):
            args.buckets = int(pconf.get("buckets", args.buckets))
    if not args.warehouse and not (args.curate or args.profile):
        p.error("--warehouse (or pipeline.warehouse in --conf) is required")

    from pyspark.sql import SparkSession

    from amundsendatabuilder_spark.orchestration import Closer

    # the reference's DefaultJob guarantees teardown through Job.closer
    # (databuilder/job/job.py:71,87); same idiom, context-managed. Only
    # stop the session if THIS entry created it — under getOrCreate a host
    # process (tests, a notebook) may own the session already, and stopping
    # a borrowed session would tear down the host's executor state.
    # getOrCreate falls back to the process-wide default session
    # (SparkSession._instantiatedSession), so test ownership against the
    # same lookup — getActiveSession alone is thread-local and would
    # claim (then stop) a host session created on another thread
    owns_session = (
        SparkSession.getActiveSession() is None
        and getattr(SparkSession, "_instantiatedSession", None) is None
    )
    spark = SparkSession.builder.appName("cdc-ingest").getOrCreate()
    closer = Closer()
    if owns_session:
        closer.register(spark.stop)
    from amundsendatabuilder_spark.sources.changelog import write_changelog_chunks
    from amundsendatabuilder_spark.streaming.pipeline import CDCPipeline

    with closer:
        if args.profile:
            if not args.docs:
                p.error("--profile requires --docs")
            from amundsendatabuilder_spark.sources.profiler import (
                profile_columns,
            )

            docs = spark.read.parquet(args.docs)
            cols = ([c for c in args.profile_cols.split(",") if c]
                    or [f.name for f in docs.schema.fields
                        if f.name != "text"])
            stats = profile_columns(
                docs, cols, db="repofs", cluster=args.cluster,
                schema="docs", table_name="documents")
            print(json.dumps([r.asDict() for r in stats.collect()]))
            return 0
        if args.curate:
            if not (args.docs and args.output):
                p.error("--curate requires --docs and --output")
            from amundsendatabuilder_spark.curate import curate_corpus

            docs = spark.read.parquet(args.docs)
            bench = (spark.read.parquet(args.benchmark)
                     if args.benchmark else None)
            rates = json.loads(args.sample_rates) if args.sample_rates else None
            curated, metrics = curate_corpus(
                docs, benchmark=bench, max_hamming=args.max_hamming,
                sample_rates=rates,
            )
            curated.write.mode("overwrite").parquet(args.output)
            metrics["output"] = args.output
            print(json.dumps(metrics, default=str))
            return 0
        if args.generate:
            paths = write_changelog_chunks(
                spark, args.source, args.generate, args.chunks
            )
            print(json.dumps({"generated_chunks": paths}))
            return 0

        if args.history or args.changes:
            # metadata-only audit modes over an EXISTING warehouse — no
            # CDCPipeline construction (which would create missing tables)
            from pyspark.sql import functions as F

            from amundsendatabuilder_spark.plans.lake import SnapshotLake

            lake = SnapshotLake(spark, args.warehouse)
            name = args.history or args.changes[0]
            if not lake.exists(name):
                p.error(f"table {name!r} does not exist in {args.warehouse}")
            tbl = lake.table(name)
            if args.history:
                print(json.dumps(tbl.history(), default=str))
                return 0
            if len(args.changes) not in (2, 3):
                p.error("--changes takes TABLE FROM [TO]")
            v_from = int(args.changes[1])
            v_to = int(args.changes[2]) if len(args.changes) == 3 else None
            feed = tbl.changes(v_from, v_to)
            if args.output:
                feed.write.mode("overwrite").parquet(args.output)
            counts = {
                r["_change_type"]: r["count"]
                for r in feed.groupBy("_change_type").count().collect()
            }
            print(json.dumps({
                "table": name, "from_version": v_from,
                "to_version": v_to if v_to is not None
                else tbl.current().version,
                "changes": counts,
                "output": args.output,
            }))
            return 0

        pipe = CDCPipeline(
            spark, args.warehouse, n_buckets=args.buckets, cluster=args.cluster
        )
        if args.sessions:
            import glob

            if not args.source:
                p.error("--sessions requires --source")
            chunks = sorted(d for d in glob.glob(f"{args.source}/*")
                            if "/chunk_" in d) or [args.source]
            out = [
                pipe.apply_sessions(spark.read.parquet(c), i,
                                    gap_minutes=args.session_gap_min)
                for i, c in enumerate(chunks)
            ]
            print(json.dumps({"epochs": len(out),
                              "skipped": sum("skipped" in m for m in out),
                              "sessions_rows":
                                  pipe.user_sessions.read().count()},
                             default=str))
            return 0
        if args.ingest_csv:
            from amundsendatabuilder_spark.sample_ingest import (
                ingest_fixture_dir,
            )

            metrics = ingest_fixture_dir(
                pipe, args.ingest_csv, epoch_id=args.ingest_epoch,
                export_dir=args.export_docs,
            )
            print(json.dumps(metrics, default=str))
            return 0
        if args.catalog_scan:
            # catalog → nodes → merge → staleness candidates: the reference's
            # metadata DefaultJob + Neo4jStalenessRemovalTask, one CLI call
            from pyspark.sql import functions as F

            from amundsendatabuilder_spark.sources.fs_probe import (
                table_last_updated_fs,
            )
            from amundsendatabuilder_spark.sources.spark_catalog import (
                catalog_locations,
                catalog_scrape,
                scan_rows_from_scrape,
            )

            schemas = [s for s in args.catalog_schemas.split(",") if s] or None
            scraped = catalog_scrape(spark, schema_list=schemas)
            scan = scan_rows_from_scrape(
                spark, scraped, database=args.catalog_database,
                cluster=args.cluster)
            fs_lu = None
            if not args.no_fs_probe:
                fs_lu = table_last_updated_fs(catalog_locations(spark, scraped))
            metrics = pipe.apply_catalog(scan, args.catalog_epoch,
                                         fs_last_updated=fs_lu)
            tag = metrics.get("publish_tag", f"catalog_epoch_{args.catalog_epoch}")
            # count ONLY nodes the catalog channel itself published — scoped
            # by the channel's tag prefix, not by label: the cdc channel
            # publishes Table/Column/Description/Timestamp nodes too (under
            # cdc publish_tags) and those are live, while catalog-published
            # Database/Cluster/Schema/Tag nodes DO go stale and must count
            stale = (
                pipe.graph_nodes.read()
                .where(F.col("publish_tag").startswith("catalog_epoch_"))
                .where(F.col("publish_tag") != F.lit(tag))
                .groupBy("label").count().collect()
            )
            metrics["stale_candidates"] = {r["label"]: r["count"] for r in stale}
            print(json.dumps(metrics, default=str))
            return 0
        if args.stream:
            if not args.checkpoint:
                p.error("--stream requires --checkpoint")
            q = pipe.run_stream(
                args.source,
                args.checkpoint,
                max_files_per_trigger=args.max_files_per_trigger,
                available_now=not args.follow,
            )
            q.awaitTermination()
        else:
            import glob

            chunks = sorted(d for d in glob.glob(f"{args.source}/*") if "/chunk_" in d)
            metrics = pipe.replay_batches(chunks)
            print(json.dumps({"epochs": len(metrics)}))

        if args.vacuum_tombstones_ms:
            print(json.dumps(pipe.vacuum_tombstones(args.vacuum_tombstones_ms)))
        if args.expire_snapshots:
            print(json.dumps(pipe.expire_snapshots(
                keep_last=args.expire_snapshots,
                orphan_grace_ms=args.expire_grace_ms)))
        return 0


if __name__ == "__main__":
    sys.exit(main())
