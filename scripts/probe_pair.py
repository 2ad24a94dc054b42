"""One-off probe: raw scaling + CPU factorization for arbitrary core pairs.

Usage: python3 scripts/probe_pair.py 8,32 [events] [chunks] [rounds]

Reuses bench.py's fresh-subprocess arm (identical fixed-partition plan,
event-log CPU parse) to answer: what raw N->4N efficiency and substrate
CPU ratio does THIS host give at these widths right now?
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

cores_list = [int(x) for x in sys.argv[1].split(",")]
events = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
chunks_n = int(sys.argv[3]) if len(sys.argv) > 3 else 2
rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 1

os.makedirs(bench.WORK, exist_ok=True)
spark = bench._session(8, "probe-gen")
from amundsendatabuilder_spark.sources.changelog import write_changelog_chunks  # noqa: E402

cl_dir = tempfile.mkdtemp(prefix="probe_cl_", dir=bench.WORK)
chunks = write_changelog_chunks(spark, cl_dir, events, chunks_n,
                                n_entities=max(1000, events // 10))
warm = write_changelog_chunks(spark, cl_dir + "_warm", 100_000, 2,
                              n_entities=10_000)
spark.stop()
print(f"[probe] changelog ready: {events} events x {chunks_n} chunks",
      file=sys.stderr, flush=True)

runs: dict[int, list[dict]] = {}
for r in range(rounds):
    for c in cores_list:
        res = bench.run_arm(c, chunks, warm)
        runs.setdefault(c, []).append(res)
        print(f"[probe] round {r} cores={c}: wall={res['wall']}s "
              f"({events / res['wall']:.0f} ev/s) cpu={res['exec_cpu_sec']} "
              f"util={res['cpu_util']} tasks={res['n_tasks']}",
              file=sys.stderr, flush=True)

for i in range(len(cores_list)):
    for j in range(i + 1, len(cores_list)):
        a, b = cores_list[i], cores_list[j]
        small = min(runs[a], key=lambda r: r["wall"])
        big = min(runs[b], key=lambda r: r["wall"])
        ratio = b / a
        eff = (events / big["wall"]) / (ratio * (events / small["wall"]))
        substrate = small["exec_cpu_sec"] / max(1e-9, big["exec_cpu_sec"])
        engine = big["cpu_util"] / max(1e-9, small["cpu_util"])
        print(json.dumps({
            "pair": f"{a}to{b}", "wall_N": small["wall"], "wall_4N": big["wall"],
            "raw_eff": round(eff, 3), "substrate_cpu_ratio": round(substrate, 3),
            "engine_factor_uncapped": round(engine, 3),
            "digests_match": small["digest"] == big["digest"],
        }))
import shutil

shutil.rmtree(cl_dir, ignore_errors=True)
shutil.rmtree(cl_dir + "_warm", ignore_errors=True)
