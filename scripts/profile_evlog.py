"""Replay profile via the Spark event log: exact per-job spans, task-time
sums, and the wall not covered by any job (pure driver time). Usage:
    python scripts/profile_evlog.py <cores> [events] [chunks]
"""
import glob
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
EVDIR = tempfile.mkdtemp(prefix="evlog_", dir=WORK)
os.makedirs(WORK, exist_ok=True)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
os.environ["SPARK_CDC_MAT_BATCH"] = os.environ.get("SPARK_CDC_MAT_BATCH", "1")
local_dirs = tempfile.mkdtemp(prefix="sld_", dir=WORK)
os.environ["SPARK_LOCAL_DIRS"] = local_dirs

from amundsendatabuilder_spark.session import get_spark

shuffle_p = int(os.environ.get("SPARK_EXP_SHUFFLE", str(cores)))
spark = get_spark(
    f"evprof-{cores}", master=f"local[{cores}]", shuffle_partitions=shuffle_p,
    extra_conf={"spark.eventLog.enabled": "true", "spark.eventLog.dir": EVDIR,
                "spark.eventLog.compress": "false"},
)
spark.sparkContext.setLogLevel("ERROR")

from amundsendatabuilder_spark.sources.changelog import write_changelog_chunks
from amundsendatabuilder_spark.streaming.pipeline import CDCPipeline

cl_dir = tempfile.mkdtemp(prefix="prof_cl_", dir=WORK)
chunk_paths = write_changelog_chunks(
    spark, cl_dir, events, chunks, n_entities=max(1000, events // 10)
)
wwh = tempfile.mkdtemp(prefix="warm_wh_", dir=WORK)
warm = write_changelog_chunks(spark, cl_dir + "_w", 100_000, 2, n_entities=10_000)
CDCPipeline(spark, wwh, n_buckets=128,
            table_mode=os.environ.get("SPARK_EXP_MODE", "cow")).replay_batches(warm)
shutil.rmtree(wwh, ignore_errors=True)

wh = tempfile.mkdtemp(prefix=f"prof_wh_{cores}_", dir=WORK)
pipe = CDCPipeline(spark, wh, n_buckets=128,
                   table_mode=os.environ.get("SPARK_EXP_MODE", "cow"))
t0 = time.time()
pipe.replay_batches(chunk_paths)
wall = time.time() - t0
t0_ms = int(t0 * 1000)
spark.stop()

jobs = {}
task_ms = 0.0
gc_ms = run_ms = cpu_ms = deser_ms = shw_ms = fetch_ms = 0.0
stage_tasks = {}
evfiles = [f for f in glob.glob(f"{EVDIR}/**", recursive=True) if os.path.isfile(f)]
for f in evfiles:
    for line in open(f, errors="ignore"):
        try:
            e = json.loads(line)
        except Exception:
            continue
        if not isinstance(e, dict):
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart" and e["Submission Time"] >= t0_ms:
            jobs[e["Job ID"]] = {"start": e["Submission Time"], "stages": e["Stage IDs"]}
        elif ev == "SparkListenerJobEnd" and e["Job ID"] in jobs:
            jobs[e["Job ID"]]["end"] = e["Completion Time"]
        elif ev == "SparkListenerTaskEnd":
            info = e.get("Task Info", {})
            dur = info.get("Finish Time", 0) - info.get("Launch Time", 0)
            if info.get("Finish Time", 0) >= t0_ms:
                task_ms += dur
                tm = e.get("Task Metrics") or {}
                gc_ms += tm.get("JVM GC Time", 0)
                run_ms += tm.get("Executor Run Time", 0)
                cpu_ms += tm.get("Executor CPU Time", 0) / 1e6  # ns -> ms
                deser_ms += tm.get("Executor Deserialize Time", 0)
                sw = tm.get("Shuffle Write Metrics") or {}
                shw_ms += sw.get("Shuffle Write Time", 0) / 1e6  # ns -> ms
                sr = tm.get("Shuffle Read Metrics") or {}
                fetch_ms += sr.get("Fetch Wait Time", 0)
                sid = e.get("Stage ID")
                st = stage_tasks.setdefault(sid, [0, 0])
                st[0] += 1
                st[1] += dur

# merge job intervals to find covered wall (any job running)
iv = sorted((j["start"], j.get("end", j["start"])) for j in jobs.values())
covered = 0
cur_s = cur_e = None
for s, en in iv:
    if cur_s is None:
        cur_s, cur_e = s, en
    elif s <= cur_e:
        cur_e = max(cur_e, en)
    else:
        covered += cur_e - cur_s
        cur_s, cur_e = s, en
if cur_s is not None:
    covered += cur_e - cur_s

job_rows = []
for jid, j in sorted(jobs.items()):
    span = (j.get("end", j["start"]) - j["start"]) / 1000
    tsum = sum(stage_tasks.get(s, [0, 0])[1] for s in j["stages"]) / 1000
    ntask = sum(stage_tasks.get(s, [0, 0])[0] for s in j["stages"])
    job_rows.append((jid, round(span, 2), round(tsum, 2), ntask))

print(json.dumps({
    "cores": cores, "events": events, "chunks": chunks,
    "wall_sec": round(wall, 2),
    "n_jobs": len(jobs),
    "job_covered_sec": round(covered / 1000, 2),
    "uncovered_driver_sec": round(wall - covered / 1000, 2),
    "task_time_sum_sec": round(task_ms / 1000, 2),
    "task_time_over_wall_x_cores": round(task_ms / 1000 / (wall * cores), 3),
    "gc_sec": round(gc_ms / 1000, 2),
    "exec_run_sec": round(run_ms / 1000, 2),
    "exec_cpu_sec": round(cpu_ms / 1000, 2),
    "deser_sec": round(deser_ms / 1000, 2),
    "shuffle_write_sec": round(shw_ms / 1000, 2),
    "fetch_wait_sec": round(fetch_ms / 1000, 2),
}))
print("top jobs by span (jid, span_s, task_sum_s, n_tasks):")
for r in sorted(job_rows, key=lambda r: -r[1])[:15]:
    print("  ", r)
shutil.rmtree(wh, ignore_errors=True)
shutil.rmtree(cl_dir, ignore_errors=True)
shutil.rmtree(cl_dir + "_w", ignore_errors=True)
shutil.rmtree(local_dirs, ignore_errors=True)
shutil.rmtree(EVDIR, ignore_errors=True)
