"""Scaling experiment: replay the same pre-materialized changelog at several
parallelism levels, print wall/throughput per level."""
import json, os, shutil, sys, tempfile, time

sys.path.insert(0, "/root/repo")
EVENTS = int(os.environ.get("BM_EVENTS", "2000000"))
CHUNKS = int(os.environ.get("BM_CHUNKS", "2"))
CORES = [int(c) for c in os.environ.get("BM_CORES", "2,8,32").split(",")]
MODE = os.environ.get("BM_MODE", "cow")
CONF = dict(kv.split("=", 1) for kv in os.environ.get("BM_CONF", "").split(",") if "=" in kv)
ROUNDS = int(os.environ.get("BM_ROUNDS", "2"))

if os.path.isdir("/dev/shm") and "SPARK_LOCAL_DIRS" not in os.environ:
    d = "/dev/shm/spark_bench_local"
    os.makedirs(d, exist_ok=True)
    os.environ["SPARK_LOCAL_DIRS"] = d
os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

from amundsendatabuilder_spark.session import get_spark

def log(m):
    print(f"[bm] {m}", file=sys.stderr, flush=True)

spark = get_spark("bm-gen", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
from amundsendatabuilder_spark.sources.changelog import write_changelog_chunks
BM_DIR = os.environ.get("BM_DIR", "/dev/shm/bm_work" if os.path.isdir("/dev/shm") else None)
if BM_DIR:
    os.makedirs(BM_DIR, exist_ok=True)
cl = tempfile.mkdtemp(prefix="bm_cl_", dir=BM_DIR)
t0 = time.time()
chunks = write_changelog_chunks(spark, cl, EVENTS, CHUNKS, n_entities=max(1000, EVENTS // 10))
spark.stop()
log(f"gen {EVENTS} events in {time.time()-t0:.1f}s")

from amundsendatabuilder_spark.streaming.pipeline import CDCPipeline

def run(cores):
    s = get_spark(f"bm-{cores}", master=f"local[{cores}]", shuffle_partitions=cores, extra_conf=CONF)
    s.sparkContext.setLogLevel("ERROR")
    wh = tempfile.mkdtemp(prefix=f"bm_wh_{cores}_", dir=BM_DIR)
    pipe = CDCPipeline(s, wh, n_buckets=128, table_mode=MODE)
    t = time.time()
    pipe.replay_batches(chunks)
    wall = time.time() - t
    s.stop()
    shutil.rmtree(wh, ignore_errors=True)
    return wall

if os.environ.get("BM_WARMUP", "1") == "1":
    w = run(CORES[-1])
    log(f"warmup ({CORES[-1]} cores): {w:.1f}s")
results = {c: [] for c in CORES}
for r in range(ROUNDS):
    for c in CORES:
        w = run(c)
        results[c].append(round(w, 1))
        log(f"round {r} cores={c}: {w:.1f}s ({EVENTS/w:.0f} ev/s)")
best = {c: min(v) for c, v in results.items()}
out = {"events": EVENTS, "chunks": CHUNKS, "mode": MODE, "walls": results, "best": best,
       "tput": {c: round(EVENTS / w, 0) for c, w in best.items()}}
for a in CORES:
    for b in CORES:
        if b == 4 * a:
            out[f"eff_{a}to{b}"] = round((EVENTS / best[b]) / (4 * EVENTS / best[a]), 3)
print(json.dumps(out))
shutil.rmtree(cl, ignore_errors=True)
