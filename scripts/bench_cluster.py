"""Scaling evidence on a REAL multi-executor topology: Spark local-cluster
mode spawns separate Worker+Executor JVMs, so N executors vs 4N executors is
measured with genuine per-executor isolation (own heap, GC, python workers).
Each ARM runs in a FRESH subprocess (fresh driver JVM): sequential sessions
inside one JVM degrade over time (accumulated metaspace/code-cache/shuffle
state), which contaminated same-process measurements by up to 2x."""
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)
EVENTS = int(os.environ.get("BC_EVENTS", "8000000"))
CHUNKS = int(os.environ.get("BC_CHUNKS", "2"))
EXECS = [int(c) for c in os.environ.get("BC_EXECS", "1,4").split(",")]
CORES_PER = int(os.environ.get("BC_CORES_PER", "2"))
MEM_MB = int(os.environ.get("BC_EXEC_MEM_MB", "10240"))
ROUNDS = int(os.environ.get("BC_ROUNDS", "2"))
WORK = os.environ.get("BC_DIR", "/dev/shm/bc_work")

ARM_SRC = r'''
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
n_exec, cores_per, mem_mb, work, chunks_json = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5])
chunks = json.loads(chunks_json)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")
os.environ["PYTHONPATH"] = "/root/repo:" + os.environ.get("PYTHONPATH", "")
local_dirs = tempfile.mkdtemp(prefix="sld_", dir=work)
os.environ["SPARK_LOCAL_DIRS"] = local_dirs
from amundsendatabuilder_spark.session import get_spark
spark = get_spark(
    f"bc-{n_exec}x{cores_per}",
    master=f"local-cluster[{n_exec},{cores_per},{mem_mb}]",
    shuffle_partitions=n_exec * cores_per,
    extra_conf={
        "spark.executor.memory": f"{mem_mb - 2048}m",
        "spark.python.worker.reuse": "true",
        "spark.executorEnv.PYTHONPATH": "/root/repo",
    },
)
spark.sparkContext.setLogLevel("ERROR")
from amundsendatabuilder_spark.streaming.pipeline import CDCPipeline
wh = tempfile.mkdtemp(prefix=f"bc_wh_{n_exec}_", dir=work)
pipe = CDCPipeline(spark, wh, n_buckets=128)
t0 = time.time()
pipe.replay_batches(chunks)
wall = time.time() - t0
# digest for cross-topology determinism proof
from pyspark.sql import functions as F
df = pipe.repo_files.read()
cols = sorted(c for c in df.columns if c not in ("publish_tag", "updated_ms"))
row = (df.select(F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]), 256).alias("h"))
       .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s")).first())
n_rows = df.count()
spark.stop()
shutil.rmtree(wh, ignore_errors=True)
shutil.rmtree(local_dirs, ignore_errors=True)
print(json.dumps({"wall": round(wall, 1), "digest": str(row["s"]), "rows": n_rows}))
'''


def log(m):
    print(f"[bc] {m}", file=sys.stderr, flush=True)


def run_arm(n_exec, chunks):
    out = subprocess.run(
        [sys.executable, "-c", ARM_SRC, str(n_exec), str(CORES_PER),
         str(MEM_MB), WORK, json.dumps(chunks)],
        capture_output=True, text=True, timeout=3600,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not line:
        raise RuntimeError(f"arm {n_exec} failed: {out.stderr[-2000:]}")
    return json.loads(line[-1])


def main():
    os.makedirs(WORK, exist_ok=True)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")
    os.environ["PYTHONPATH"] = "/root/repo:" + os.environ.get("PYTHONPATH", "")
    from amundsendatabuilder_spark.session import get_spark

    spark = get_spark("bc-gen", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from amundsendatabuilder_spark.sources.changelog import write_changelog_chunks

    cl = tempfile.mkdtemp(prefix="bc_cl_", dir=WORK)
    t0 = time.time()
    chunks = write_changelog_chunks(spark, cl, EVENTS, CHUNKS,
                                    n_entities=max(1000, EVENTS // 10))
    spark.stop()
    log(f"gen {EVENTS} events in {time.time()-t0:.1f}s")

    results = {e: [] for e in EXECS}
    digests = {}
    for r in range(ROUNDS):
        for e in EXECS:
            res = run_arm(e, chunks)
            results[e].append(res["wall"])
            digests[e] = res["digest"]
            log(f"round {r} executors={e}x{CORES_PER}: {res['wall']}s "
                f"({EVENTS/res['wall']:.0f} ev/s)")
    best = {e: min(v) for e, v in results.items()}
    out = {"events": EVENTS, "chunks": CHUNKS, "cores_per_executor": CORES_PER,
           "walls": results, "best": best,
           "tput": {e: round(EVENTS / w, 0) for e, w in best.items()},
           "digests_match": len(set(digests.values())) == 1}
    for a in EXECS:
        for b in EXECS:
            if b == 4 * a:
                out[f"eff_{a}to{b}_executors"] = round(
                    (EVENTS / best[b]) / (4 * EVENTS / best[a]), 3)
    print(json.dumps(out))
    shutil.rmtree(cl, ignore_errors=True)


if __name__ == "__main__":
    main()
