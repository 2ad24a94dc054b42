"""Interleaved variant matrix for the replay: each round runs every variant
once (fresh subprocess, same chunks); report per-variant minima. Usage:
    python scripts/exp_matrix.py <rounds> <events> [variant...]
Variants: name=cores,env1=v1,env2=v2  (cores first, then env overrides)
"""
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")
rounds = int(sys.argv[1])
events = int(sys.argv[2])
specs = sys.argv[3:]

WORK = "/dev/shm/exp_work"
os.makedirs(WORK, exist_ok=True)

# generate chunks once (one shared copy per events-count)
tag = f"mx_{events}"
cl = os.path.join(WORK, tag)
if not os.path.exists(cl):
    os.environ["SPARK_LOCAL_DIRS"] = tempfile.mkdtemp(dir=WORK)
    from amundsendatabuilder_spark.session import get_spark
    from amundsendatabuilder_spark.sources.changelog import write_changelog_chunks

    spark = get_spark("gen", master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    write_changelog_chunks(spark, cl, events, 2, n_entities=max(1000, events // 10))
    write_changelog_chunks(spark, cl + "_w", 100_000, 2, n_entities=10_000)
    spark.stop()
chunks = sorted(os.path.join(cl, d) for d in os.listdir(cl) if d.startswith("chunk"))
warm = sorted(os.path.join(cl + "_w", d) for d in os.listdir(cl + "_w") if d.startswith("chunk"))

results: dict[str, list[float]] = {}
digests: dict[str, set] = {}
for r in range(rounds):
    for spec in specs:
        name, _, envs = spec.partition("=")
        parts = envs.split(",")
        cores = parts[0]
        env = dict(os.environ)
        env.setdefault("SPARK_EXP_SHUFFLE", "32")
        env.setdefault("SPARK_CDC_TARGET_PARTITIONS", "32")
        for kv in parts[1:]:
            k, _, v = kv.partition("=")
            env[k] = v
        out = subprocess.run(
            [sys.executable, "scripts/exp_cluster_arm.py", f"local[{cores}]",
             cores, str(events), json.dumps(chunks), json.dumps(warm)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not lines:
            print(f"[{name}] FAILED: {out.stderr[-500:]}", flush=True)
            continue
        res = json.loads(lines[-1])
        results.setdefault(name, []).append(res["wall"])
        digests.setdefault(name, set()).add(res["digest"])
        print(f"[round {r}] {name}: {res['wall']}s", flush=True)

print(json.dumps({
    "minima": {k: min(v) for k, v in results.items()},
    "all": results,
    "digest_consistent": len({d for s in digests.values() for d in s}) == 1,
}))
