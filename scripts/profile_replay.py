"""Phase-level replay profile at one core width: wall per epoch phase plus
executor task-time totals, to locate the non-scaling (driver-serial or
under-parallel) fraction. Usage:
    python scripts/profile_replay.py <cores> [events] [chunks]
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

cores = int(sys.argv[1])
events = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 2

WORK = "/dev/shm/profile_work"
os.makedirs(WORK, exist_ok=True)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
os.environ["SPARK_CDC_MAT_BATCH"] = os.environ.get("SPARK_CDC_MAT_BATCH", "1")
os.environ["SPARK_CDC_DEBUG_TIMING"] = "1"
local_dirs = tempfile.mkdtemp(prefix="sld_", dir=WORK)
os.environ["SPARK_LOCAL_DIRS"] = local_dirs

from amundsendatabuilder_spark.session import get_spark

spark = get_spark(f"profile-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")

from amundsendatabuilder_spark.sources.changelog import write_changelog_chunks
from amundsendatabuilder_spark.streaming.pipeline import CDCPipeline

cl_dir = tempfile.mkdtemp(prefix="prof_cl_", dir=WORK)
chunk_paths = write_changelog_chunks(
    spark, cl_dir, events, chunks, n_entities=max(1000, events // 10)
)

# warmup
wwh = tempfile.mkdtemp(prefix="warm_wh_", dir=WORK)
warm = write_changelog_chunks(spark, cl_dir + "_w", 100_000, 2, n_entities=10_000)
CDCPipeline(spark, wwh, n_buckets=128).replay_batches(warm)
shutil.rmtree(wwh, ignore_errors=True)

sc = spark.sparkContext
tracker = sc.statusTracker()

wh = tempfile.mkdtemp(prefix=f"prof_wh_{cores}_", dir=WORK)
pipe = CDCPipeline(spark, wh, n_buckets=128)

# sample active task count to estimate parallel utilization
import threading

samples = []
stop = threading.Event()


def sampler():
    while not stop.is_set():
        n = 0
        for sid in tracker.getActiveStageIds():
            info = tracker.getStageInfo(sid)
            if info:
                n += info.numActiveTasks
        samples.append(min(n, cores))
        time.sleep(0.05)


th = threading.Thread(target=sampler, daemon=True)
th.start()
t0 = time.time()
pipe.replay_batches(chunk_paths)
wall = time.time() - t0
stop.set()
th.join()

busy = sum(samples) / max(1, len(samples))
zero = sum(1 for s in samples if s == 0) / max(1, len(samples))
print(json.dumps({
    "cores": cores, "events": events, "chunks": chunks,
    "wall": round(wall, 2),
    "avg_active_tasks": round(busy, 2),
    "utilization": round(busy / cores, 3),
    "zero_task_frac": round(zero, 3),
}))
spark.stop()
shutil.rmtree(wh, ignore_errors=True)
shutil.rmtree(cl_dir, ignore_errors=True)
shutil.rmtree(cl_dir + "_w", ignore_errors=True)
shutil.rmtree(local_dirs, ignore_errors=True)
