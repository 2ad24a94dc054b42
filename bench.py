"""Benchmark harness — CDC replay throughput + headline query timings.

Prints ONE JSON line:
  {"metric": "cdc_replay_events_per_sec", "value": <wall sec total>,
   "unit": "sec", "queries": {...per-query sec...}, "sf": ...,
   "replay": {"events": N, "events_per_sec_N": ..., "events_per_sec_4N": ...,
              "scaling_efficiency": ...}}

Scaling evidence (BASELINE.json north_rule, sandboxed form): the same replay
job runs at two parallelism levels — local[CPUS/4] and local[CPUS] — on the
identical pre-materialized changelog; efficiency =
throughput_4N / (4 × throughput_N). Final-state digests of both runs are
compared to prove determinism across cluster sizes.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_EVENTS (default 2_000_000),
SPARK_GRAFT_BENCH_CHUNKS (default 4).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "1000000"))
N_CHUNKS = int(os.environ.get("SPARK_GRAFT_BENCH_CHUNKS", "2"))
N_ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "2"))

# shuffle + checkpoint blocks on tmpfs: this box's real disk throttles 32
# concurrent writers long before the CPUs saturate
if os.path.isdir("/dev/shm") and "SPARK_LOCAL_DIRS" not in os.environ:
    _d = "/dev/shm/spark_bench_local"
    os.makedirs(_d, exist_ok=True)
    os.environ["SPARK_LOCAL_DIRS"] = _d

HEADLINE_QUERIES = [
    "lww_latest_event",
    "cdc_final_state",
    "usage_agg",
    "grouped_columns",
    "search_doc_join",
    "exact_dedup",
    "minhash_lsh",
    "embedding_topk",
    "text_quality",
    "cdc_replay_tables",
]


def _session(cores: int, app: str):
    from amundsendatabuilder_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark(app, master=f"local[{cores}]", shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _force(df) -> int:
    """Fully materialize a DataFrame (noop sink — no driver collect)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _state_digest(df) -> str:
    from pyspark.sql import functions as F

    cols = sorted(c for c in df.columns if c not in ("publish_tag", "updated_ms"))
    row = (
        df.select(F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]), 256).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"))
        .first()
    )
    return str(row["s"])


def run_replay(cores: int, chunks: list[str], tag: str) -> dict:
    # JIT is already warm: the cdc_replay_tables headline query ran the full
    # pipeline in this same JVM (codegen/JIT state survives session restarts)
    spark = _session(cores, f"bench-replay-{cores}")
    from amundsendatabuilder_spark.streaming.pipeline import CDCPipeline

    wh = tempfile.mkdtemp(prefix=f"bench_wh_{tag}_")
    pipe = CDCPipeline(spark, wh, n_buckets=128)
    t0 = time.time()
    pipe.replay_batches(chunks)
    wall = time.time() - t0
    digest = _state_digest(pipe.repo_files.read())
    n_final = pipe.repo_files.read().count()
    spark.stop()
    shutil.rmtree(wh, ignore_errors=True)
    return {"cores": cores, "wall_sec": round(wall, 2), "digest": digest,
            "final_rows": n_final}


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    out: dict = {"sf": SF_DIR, "unit": "sec"}

    # -- 1. headline queries at full parallelism --------------------------
    spark = _session(CPUS, "bench-queries")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    qtimes: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        t0 = time.time()
        _force(qs[name](spark, SF_DIR))
        qtimes[name] = round(time.time() - t0, 3)
        _log(f"query {name}: {qtimes[name]}s")

    # -- 2. materialize the bench changelog (not timed) -------------------
    from amundsendatabuilder_spark.sources.changelog import write_changelog_chunks

    cl_dir = tempfile.mkdtemp(prefix="bench_cl_")
    t0 = time.time()
    chunks = write_changelog_chunks(
        spark, cl_dir, N_EVENTS, N_CHUNKS, n_entities=max(1000, N_EVENTS // 10)
    )
    spark.stop()
    _log(f"changelog gen ({N_EVENTS} events): {round(time.time() - t0, 1)}s")

    # -- 3. replay at N and 4N cores, interleaved rounds -------------------
    # the sandbox host is burstable (sustained load gets hypervisor-throttled
    # and run order biases results); alternate arms and take per-arm MIN wall
    runs: dict[str, list[dict]] = {"N": [], "4N": []}
    for _ in range(N_ROUNDS):
        runs["N"].append(run_replay(max(1, CPUS // 4), chunks, "N"))
        _log(f"replay N ({runs['N'][-1]['cores']} cores): {runs['N'][-1]['wall_sec']}s")
        runs["4N"].append(run_replay(CPUS, chunks, "4N"))
        _log(f"replay 4N ({runs['4N'][-1]['cores']} cores): {runs['4N'][-1]['wall_sec']}s")

    small = min(runs["N"], key=lambda r: r["wall_sec"])
    big = min(runs["4N"], key=lambda r: r["wall_sec"])
    tput_big = N_EVENTS / big["wall_sec"]
    tput_small = N_EVENTS / small["wall_sec"]
    eff = tput_big / (4.0 * tput_small)
    shutil.rmtree(cl_dir, ignore_errors=True)

    out.update(
        {
            "metric": "cdc_replay_wall_sec_4N",
            "value": big["wall_sec"],
            "queries": qtimes,
            "replay": {
                "events": N_EVENTS,
                "chunks": N_CHUNKS,
                "cores_4N": big["cores"],
                "cores_N": small["cores"],
                "events_per_sec_4N": round(tput_big, 1),
                "events_per_sec_N": round(tput_small, 1),
                "scaling_efficiency_N_to_4N": round(eff, 3),
                "digests_match_across_parallelism": big["digest"] == small["digest"],
                "final_rows": big["final_rows"],
                "wall_samples_N": [r["wall_sec"] for r in runs["N"]],
                "wall_samples_4N": [r["wall_sec"] for r in runs["4N"]],
            },
        }
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
