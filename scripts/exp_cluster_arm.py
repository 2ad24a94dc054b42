"""One replay arm on an explicit master (threads or local-cluster), fresh
process. Usage:
    python scripts/exp_cluster_arm.py <master> <total_cores> <events> <chunks_json> <warm_json>
Prints one JSON line {"wall":..,"digest":..,"rows":..}.
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
master, cores, events = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
chunks = json.loads(sys.argv[4])
warm = json.loads(sys.argv[5])

WORK = "/dev/shm/exp_work"
os.makedirs(WORK, exist_ok=True)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")
os.environ["SPARK_CDC_MAT_BATCH"] = os.environ.get("SPARK_CDC_MAT_BATCH", "1")
local_dirs = tempfile.mkdtemp(prefix="sld_", dir=WORK)
os.environ["SPARK_LOCAL_DIRS"] = local_dirs

from amundsendatabuilder_spark.session import get_spark

extra = {}
if os.environ.get("SPARK_EXP_AQE") == "0":
    extra["spark.sql.adaptive.enabled"] = "false"
if master.startswith("local-cluster"):
    # per-executor resources fixed across arms — the cluster-scaling shape
    extra = {"spark.executor.memory": "3g",
             "spark.python.worker.reuse": "true"}
shuffle_p = int(os.environ.get("SPARK_EXP_SHUFFLE", str(cores)))
spark = get_spark(f"exp-{cores}", master=master, shuffle_partitions=shuffle_p,
                  extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")

from amundsendatabuilder_spark.streaming.pipeline import CDCPipeline

if warm:
    wwh = tempfile.mkdtemp(prefix="warm_wh_", dir=WORK)
    CDCPipeline(spark, wwh, n_buckets=128).replay_batches(warm)
    shutil.rmtree(wwh, ignore_errors=True)

wh = tempfile.mkdtemp(prefix="exp_wh_", dir=WORK)
mode = os.environ.get("SPARK_EXP_MODE", "cow")
pipe = CDCPipeline(spark, wh, n_buckets=128, table_mode=mode,
                   compact_every=int(os.environ.get("SPARK_EXP_COMPACT_EVERY", "8")))
t0 = time.time()
pipe.replay_batches(chunks)
wall = time.time() - t0

from pyspark.sql import functions as F

df = pipe.repo_files.read()
cols = sorted(c for c in df.columns if c not in ("publish_tag", "updated_ms"))
row = (df.select(F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]), 256).alias("h"))
       .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s")).first())
n = df.count()
spark.stop()
shutil.rmtree(wh, ignore_errors=True)
shutil.rmtree(local_dirs, ignore_errors=True)
print(json.dumps({"wall": round(wall, 2), "digest": str(row["s"]), "rows": n}))
