"""Benchmark harness — CDC replay throughput + scaling + headline queries.

Prints ONE JSON line:
  {"metric": "cdc_replay_wall_sec_4N", "value": <sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "replay": {...}, "controls": {...}}

Scaling evidence (BASELINE.json north_rule, sandboxed form): the same replay
job runs at two parallelism levels — N and 4N cores — on the identical
pre-materialized changelog; efficiency = tput_4N / (4 x tput_N).

Methodology (r2 + r3; full dossier in BENCH.md):
* IDENTICAL JOB AT BOTH WIDTHS: shuffle partitioning, engine repartition
  targets, file layout, and engine concurrency are pinned
  (SPARK_CDC_TARGET_PARTITIONS / fixed shuffle partitions / parallel
  prepares on) so the two arms run the same plan and task set — scaling
  executors on a real cluster does not change the job (r3; arm task counts
  are asserted ~equal in the output);
* each arm runs in a FRESH subprocess (fresh driver JVM — sequential
  sessions in one JVM degrade up to 2x);
* arms are interleaved round-robin, per-arm MINIMA reported (the host is
  burstable: identical runs vary up to 5x with time of day);
* all work dirs on /dev/shm (the real disk is IO-credit throttled);
* final-state digests must be bit-identical across parallelism levels;
* the designated pair is measured (default 1->4 cores; extra pairs via
  SPARK_GRAFT_BENCH_PAIRS) and each arm's
  event log is parsed for exec-CPU and utilization, giving the exact
  factorization eff = substrate_cpu_ratio x engine_parallel_efficiency:
  per-task CPU-seconds of the identical task set inflate ~1.6x from 2->8
  threads on this virtualized host (spin/memcpy/random-gather controls all
  scale >=0.87, multi-JVM local-cluster shows the same inflation, CPU clock
  pinned 2.7GHz, steal 0) — that factor is the substrate's; the engine's
  factor is reported as hardware_normalized_efficiency;
* HARDWARE CONTROL PROBES (pure-CPU spin, streaming memcpy, random-access
  gather) run in the same session and are recorded next to the numbers.

Output protocol (r4): the LAST stdout line is a COMPACT summary JSON —
headline metric, per-query seconds, and the scalar replay/scaling numbers —
sized to survive any tail-capture window (r3's full record got clipped to
parsed:null). The full dossier (per-pair samples, controls, factorization
inputs) goes to BENCH_DETAIL_last_run.json in the repo root.

The HEADLINE pair is the designated first entry of SPARK_GRAFT_BENCH_PAIRS
(default 1:4) — fixed up front, never max-selected from the measured pairs
(r3 ADVICE: picking the best pair post-hoc biases the reported efficiency).
8->32 was probed and rejected as the designated pair: at 32 threads this
host's per-task CPU inflation plus one-wave stages collapse utilization to
~0.25 (raw eff 0.29) — the evidence lives in BENCH.md.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_EVENTS (default 2_000_000),
SPARK_GRAFT_BENCH_CHUNKS (4), SPARK_GRAFT_BENCH_ROUNDS (6),
SPARK_GRAFT_BENCH_PAIRS (default "1:4"; first = headline),
SPARK_GRAFT_BENCH_BUDGET_SEC (default 2000: skip later rounds when exceeded).

r5 default change: EVENTS 6M -> 2M, ROUNDS 3 -> 6 (budget-gated). This
host's quiet windows are ~10 min; a 6M arm takes 14-22 min so every
r5 6M run straddled a degraded window no matter when it launched
(BENCH.md run4/run5). At 2M each arm fits inside one window and the
budget admits 3-6 rounds, so the per-arm MINIMA (unchanged protocol)
select the quietest window actually observed. The 6M protocol stays
available via SPARK_GRAFT_BENCH_EVENTS=6000000 for r3/r4 comparability;
the record's replay.events field says which variant ran.

r4 variance defense: defaults sized so at least TWO full rounds fit the
budget and the headline takes per-arm MINIMA across rounds — the r4-run3
artifact (BENCH_LOCAL_r04_run3.json) shows why one round is not enough:
a substrate window inflated the 4-core arm's per-task CPU 2.2x (exec-CPU
989 -> 2174 s for the identical task set) while the 1-core arm ran fast,
reading raw 0.40 on a pair whose replicated good-window value is
0.82-0.83. Each arm now also records a same-moment single-thread CPU
probe (pre_probe_miters_1t) tagging the host window it ran in.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "2000000"))
N_CHUNKS = int(os.environ.get("SPARK_GRAFT_BENCH_CHUNKS", "4"))
N_ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "6"))
PAIRS_SPEC = os.environ.get("SPARK_GRAFT_BENCH_PAIRS", "1:4")
BUDGET = int(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "2000"))
DETAIL_FILE = os.environ.get(
    "SPARK_GRAFT_BENCH_DETAIL",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "BENCH_DETAIL_last_run.json"))
WORK = "/dev/shm/bench_work" if os.path.isdir("/dev/shm") else tempfile.gettempdir()

# shuffle + checkpoint blocks on tmpfs: the box's real disk is credit-throttled
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
    "asof_signup",
    "doc_chunks",
    "dedup_components",
    "cdc_replay_tables",
]

ARM_SRC = r'''
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, "/root/repo")
cores, work, chunks_json, warm_json = (
    int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4])
chunks = json.loads(chunks_json)
warm_chunks = json.loads(warm_json)
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
# r5: batch materialization OFF in the replay arms — the map-heavy node/
# rel expansion copies are pure memory-bandwidth cost and membw is the
# non-scaling resource on this host (see pipeline.apply_batch comment);
# override with SPARK_CDC_MAT_BATCH for A/B runs
os.environ.setdefault("SPARK_CDC_MAT_BATCH", "0")
# IDENTICAL JOB AT BOTH WIDTHS: on a real cluster the plan (shuffle
# partitioning, file layout, engine concurrency) is sized to the DATA and
# held fixed while executors scale N->4N; deriving task counts from the
# session width would bench two different jobs (and the narrow arm's fat
# partitions spill while the wide arm pays 4x per-task fixed costs).
FIXED_PARTITIONS = os.environ.get("SPARK_GRAFT_BENCH_PARTITIONS", "32")
os.environ["SPARK_CDC_TARGET_PARTITIONS"] = FIXED_PARTITIONS
os.environ["SPARK_CDC_PARALLEL_PREPARE"] = "1"
local_dirs = tempfile.mkdtemp(prefix="sld_", dir=work)
os.environ["SPARK_LOCAL_DIRS"] = local_dirs
from amundsendatabuilder_spark.session import get_spark
evdir = tempfile.mkdtemp(prefix="ev_", dir=work)
spark = get_spark(f"bench-replay-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=int(FIXED_PARTITIONS),
                  extra_conf={"spark.eventLog.enabled": "true",
                              "spark.eventLog.dir": evdir,
                              "spark.eventLog.compress": "false",
                              # pin the remaining width-derived partition
                              # counts so both arms run the SAME task set:
                              # AQE's post-shuffle coalescing and the scan's
                              # split count both default to session width
                              "spark.sql.adaptive.coalescePartitions.enabled": "false",
                              "spark.sql.files.minPartitionNum": FIXED_PARTITIONS})
spark.sparkContext.setLogLevel("ERROR")
from amundsendatabuilder_spark.streaming.pipeline import CDCPipeline
MODE = os.environ.get("SPARK_GRAFT_BENCH_MODE", "mor")
# JIT/codegen warmup: a small replay through the identical plan shapes so
# the timed section measures the engine, not cold-JVM compilation
if warm_chunks:
    wwh = tempfile.mkdtemp(prefix="warm_wh_", dir=work)
    CDCPipeline(spark, wwh, n_buckets=128, table_mode=MODE).replay_batches(warm_chunks)
    shutil.rmtree(wwh, ignore_errors=True)
wh = tempfile.mkdtemp(prefix=f"bench_wh_{cores}_", dir=work)
pipe = CDCPipeline(spark, wh, n_buckets=128, table_mode=MODE)
t0 = time.time()
pipe.replay_batches(chunks)
wall = time.time() - t0
from pyspark.sql import functions as F
df = pipe.repo_files.read()
cols = sorted(c for c in df.columns if c not in ("publish_tag", "updated_ms"))
row = (df.select(F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]), 256).alias("h"))
       .agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s")).first())
n_rows = df.count()
spark.stop()
# parse the arm's own event log: exec-CPU and task counts over the TIMED
# window — the substrate/engine efficiency decomposition needs them
import glob
task_ms = cpu_ms = 0.0
n_tasks = 0
t0_ms = int(t0 * 1000)
for f in [f for f in glob.glob(evdir + "/**", recursive=True) if os.path.isfile(f)]:
    for line in open(f, errors="ignore"):
        try:
            e = json.loads(line)
        except Exception:
            continue
        if isinstance(e, dict) and e.get("Event") == "SparkListenerTaskEnd":
            info = e.get("Task Info", {})
            if info.get("Finish Time", 0) >= t0_ms:
                task_ms += info.get("Finish Time", 0) - info.get("Launch Time", 0)
                cpu_ms += (e.get("Task Metrics") or {}).get("Executor CPU Time", 0) / 1e6
                n_tasks += 1
shutil.rmtree(wh, ignore_errors=True)
shutil.rmtree(local_dirs, ignore_errors=True)
shutil.rmtree(evdir, ignore_errors=True)
print(json.dumps({"wall": round(wall, 2), "digest": str(row["s"]), "rows": n_rows,
                  "exec_cpu_sec": round(cpu_ms / 1000, 2),
                  "task_sum_sec": round(task_ms / 1000, 2),
                  "n_tasks": n_tasks,
                  "cpu_util": round(cpu_ms / 1000 / (wall * cores), 3)}))
'''


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _session(cores: int, app: str):
    from amundsendatabuilder_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(app, master=f"local[{cores}]", shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_arm(cores: int, chunks: list[str], warm_chunks: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", ARM_SRC, str(cores), WORK, json.dumps(chunks),
         json.dumps(warm_chunks)],
        capture_output=True, text=True, timeout=3600,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"arm cores={cores} failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


# ---- hardware control probes (no Spark) -----------------------------------

def _spin_work(n: int) -> int:
    x = 0
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
    return x


def _bw_work(args) -> float:
    import numpy as np

    m, it = args
    a = np.zeros(m * 1024 * 1024 // 8)
    b = np.ones_like(a)
    t0 = time.time()
    for _ in range(it):
        np.copyto(a, b)
    return 2 * m * it / 1024 / (time.time() - t0)


def _cpu_probe(nproc: int, iters: int = 25_000_000) -> float:
    """Aggregate integer-op rate (Miter/s) at nproc workers."""
    from multiprocessing import Pool

    t0 = time.time()
    with Pool(nproc) as p:
        p.map(_spin_work, [iters] * nproc)
    return nproc * iters / (time.time() - t0) / 1e6


def _membw_probe(nproc: int, mb: int = 64, iters: int = 25) -> float:
    """Aggregate memcpy bandwidth (GB/s) at nproc workers."""
    from multiprocessing import Pool

    with Pool(nproc) as p:
        return sum(p.map(_bw_work, [(mb, iters)] * nproc))


def _gather_work(args) -> float:
    """Random-access gather+reduce over a working set larger than an LLC
    slice — the memory pattern of hash aggregation / join probe / shuffle row
    assembly (the replay's actual hot loops), unlike _bw_work's streaming
    copy which prefetches perfectly and overstates what the memory system
    gives THIS workload class at high thread counts."""
    import numpy as np

    mb, iters, seed = args
    n = mb * 1024 * 1024 // 8
    rng = np.random.default_rng(seed)
    a = rng.random(n)
    idx = rng.integers(0, n, size=n // 4)
    out = np.empty(idx.size)     # preallocated: the timed loop must measure
    np.take(a, idx, out=out)     # gathers, not allocator/page-fault churn
    float(out.sum())             # warmup pass faults everything
    t0 = time.time()
    acc = 0.0
    for _ in range(iters):
        np.take(a, idx, out=out)
        acc += float(out.sum())
    dt = time.time() - t0
    # each gathered element costs one cache line (64B) of DRAM traffic
    return idx.size * 64 * iters / 1024**3 / dt


def _randaccess_probe(nproc: int, mb: int = 256, iters: int = 4) -> float:
    """Aggregate random-gather bandwidth (GB/s of cache-line traffic) at
    nproc workers."""
    from multiprocessing import Pool

    with Pool(nproc) as p:
        return sum(p.map(_gather_work, [(mb, iters, 7 + i) for i in range(nproc)]))


def hardware_controls(n: int, n4: int) -> dict:
    cpu_n, cpu_4n = _cpu_probe(n), _cpu_probe(n4)
    bw_n, bw_4n = _membw_probe(n), _membw_probe(n4)
    ra_n, ra_4n = _randaccess_probe(n), _randaccess_probe(n4)
    return {
        "cpu_rate_N_miters": round(cpu_n, 1),
        "cpu_rate_4N_miters": round(cpu_4n, 1),
        "cpu_scaling_eff_N_to_4N": round(cpu_4n / (4 * cpu_n), 3),
        "membw_N_gbps": round(bw_n, 1),
        "membw_4N_gbps": round(bw_4n, 1),
        "membw_scaling_eff_N_to_4N": round(bw_4n / (4 * bw_n), 3),
        # the control MATCHED to the workload: random-access cache-line
        # traffic (hash agg/join/shuffle shape). Streaming memcpy scales
        # near-linearly on this box while per-task CPU time on identical
        # plans inflates 1.6-1.8x from 2->8 threads — the gap is the memory
        # hierarchy under random access, which THIS probe reproduces.
        "randaccess_N_gbps": round(ra_n, 1),
        "randaccess_4N_gbps": round(ra_4n, 1),
        "randaccess_scaling_eff_N_to_4N": round(ra_4n / (4 * ra_n), 3),
    }


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
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

    cl_dir = tempfile.mkdtemp(prefix="bench_cl_", dir=WORK)
    t0 = time.time()
    chunks = write_changelog_chunks(
        spark, cl_dir, N_EVENTS, N_CHUNKS, n_entities=max(1000, N_EVENTS // 10)
    )
    warm_chunks = write_changelog_chunks(
        spark, cl_dir + "_warm", 100_000, 2, n_entities=10_000
    )
    spark.stop()
    _log(f"changelog gen ({N_EVENTS} events): {round(time.time() - t0, 1)}s")

    # -- 3. hardware controls at the designated pair's widths --------------
    pair_specs = [
        tuple(int(x) for x in p.split(":")) for p in PAIRS_SPEC.split(",")
    ]
    n, n4 = pair_specs[0]
    controls = hardware_controls(n, n4)
    _log(f"controls: {controls}")

    # -- 4. replay pairs (N -> 4N cores): fresh subprocess per arm,
    # interleaved round-robin across ALL pairs so every arm sees the same
    # spread of host states; per-arm minima reported
    bench_t0 = time.time()
    runs: dict[int, list[dict]] = {}
    for r in range(N_ROUNDS):
        if r > 0 and time.time() - bench_t0 > BUDGET:
            _log(f"budget {BUDGET}s exceeded; stopping after round {r}")
            break
        for cores in sorted({c for pr in pair_specs for c in pr}):
            # same-moment host probe: single-thread CPU rate right before
            # the arm, so each wall sample carries a tag of the substrate
            # window it ran in (the r4-run3 artifact shows a 2.2x per-task
            # CPU inflation window hitting ONE arm of a pair)
            probe = _cpu_probe(1, 8_000_000)
            res = run_arm(cores, chunks, warm_chunks)
            res["cores"] = cores
            res["pre_probe_miters_1t"] = probe
            runs.setdefault(cores, []).append(res)
            _log(f"replay {cores} cores: {res['wall']}s "
                 f"({N_EVENTS/res['wall']:.0f} ev/s, cpu_util {res.get('cpu_util')})")

    def pair_result(nc: int, n4c: int) -> dict:
        small = min(runs[nc], key=lambda r: r["wall"])
        big = min(runs[n4c], key=lambda r: r["wall"])
        eff = (N_EVENTS / big["wall"]) / (4.0 * (N_EVENTS / small["wall"]))
        # wall = cpu_sum/(cores*util)  =>  eff factors EXACTLY into
        #   (cpu_N/cpu_4N)  x  (util_4N/util_N)
        # first factor: per-task CPU inflation of the SAME task set at width
        # (the substrate's share — virtualized-CPU contention, unfixable in
        # guest software; the controls bound what userspace can get);
        # second factor: how well the ENGINE keeps the wider arm busy.
        substrate = round(small["exec_cpu_sec"] / max(1e-9, big["exec_cpu_sec"]), 3)
        engine = round(big["cpu_util"] / max(1e-9, small["cpu_util"]), 3)
        return {
            "cores_N": nc, "cores_4N": n4c,
            "wall_N": small["wall"], "wall_4N": big["wall"],
            "events_per_sec_N": round(N_EVENTS / small["wall"], 1),
            "events_per_sec_4N": round(N_EVENTS / big["wall"], 1),
            "scaling_efficiency_N_to_4N": round(eff, 3),
            "substrate_cpu_ratio": substrate,
            # the factorization defines the engine factor as the utilization
            # ratio; >1.0 means the wide arm was BETTER utilized. Both the
            # raw ratio and the capped form are published (r3 VERDICT: the
            # cap can mask an engine CPU regression, so keep the raw number
            # and the absolute exec-CPU sums next to it)
            "engine_parallel_efficiency_capped": min(1.0, engine),
            "engine_parallel_efficiency_uncapped": engine,
            "identical_plan": abs(small["n_tasks"] - big["n_tasks"]) <= max(4, small["n_tasks"] // 50),
            "n_tasks": [small["n_tasks"], big["n_tasks"]],
            "exec_cpu_sec": [small["exec_cpu_sec"], big["exec_cpu_sec"]],
            "cpu_util": [small["cpu_util"], big["cpu_util"]],
            "digests_match": small["digest"] == big["digest"],
            "wall_samples_N": [x["wall"] for x in runs[nc]],
            "wall_samples_4N": [x["wall"] for x in runs[n4c]],
            "probe_miters_N": [x.get("pre_probe_miters_1t") for x in runs[nc]],
            "probe_miters_4N": [x.get("pre_probe_miters_1t") for x in runs[n4c]],
            # per-ROUND factorization evidence (r4 VERDICT directive 2b:
            # window attribution must be machine-checkable from the compact
            # record alone): round i pairs the i-th N arm with the i-th 4N
            # arm, so a mid-run window collapse shows up as one round's
            # substrate ratio diverging while its raw eff tracks it
            "raw_eff_rounds": [
                round(a["wall"] / (4.0 * b["wall"]), 3)
                for a, b in zip(runs[nc], runs[n4c])
            ],
            "substrate_cpu_ratio_rounds": [
                round(a["exec_cpu_sec"] / max(1e-9, b["exec_cpu_sec"]), 3)
                for a, b in zip(runs[nc], runs[n4c])
            ],
        }

    pairs = {f"{a}to{b}": pair_result(a, b) for a, b in pair_specs}
    # HEADLINE = the designated first pair, fixed before measurement
    # (never the post-hoc best pair — that biases the reported number)
    head = pairs[f"{pair_specs[0][0]}to{pair_specs[0][1]}"]
    big = min(runs[head["cores_4N"]], key=lambda r: r["wall"])
    eff = head["scaling_efficiency_N_to_4N"]
    shutil.rmtree(cl_dir, ignore_errors=True)
    shutil.rmtree(cl_dir + "_warm", ignore_errors=True)

    replay_summary = {
        "events": N_EVENTS,
        "chunks": N_CHUNKS,
        "table_mode": os.environ.get("SPARK_GRAFT_BENCH_MODE", "mor"),
        "fixed_partitions": int(os.environ.get("SPARK_GRAFT_BENCH_PARTITIONS", "32")),
        "cores_4N": head["cores_4N"],
        "cores_N": head["cores_N"],
        "events_per_sec_4N": head["events_per_sec_4N"],
        "events_per_sec_N": head["events_per_sec_N"],
        "scaling_efficiency_N_to_4N": round(eff, 3),
        # eff factors exactly into substrate_cpu_ratio x
        # engine_parallel_efficiency (see pair_result); the
        # hardware-normalized number is the ENGINE's (capped) factor — what
        # the same job would scale at on a substrate whose per-task CPU cost
        # did not grow with width (the userspace controls in the detail file
        # bound what the substrate gives ANY guest code at these widths)
        "hardware_normalized_efficiency": head["engine_parallel_efficiency_capped"],
        "engine_parallel_efficiency_uncapped": head["engine_parallel_efficiency_uncapped"],
        "substrate_cpu_ratio": head["substrate_cpu_ratio"],
        "identical_plan_across_widths": head["identical_plan"],
        "digests_match_across_parallelism": head["digests_match"],
        # per-round evidence in the COMPACT line so the driver's artifact
        # carries the window attribution even if the detail file is lost
        "raw_eff_rounds": head["raw_eff_rounds"],
        "substrate_cpu_ratio_rounds": head["substrate_cpu_ratio_rounds"],
        "final_rows": big["rows"],
        # every measured pair's raw efficiency at top level (no selection)
        "raw_eff_all_pairs": {
            k: p["scaling_efficiency_N_to_4N"] for k, p in pairs.items()
        },
    }

    # full dossier (per-pair samples, CPU sums, controls) → detail file;
    # the stdout record stays compact so the driver's tail capture always
    # gets a parseable final line (r3's record was clipped)
    detail = dict(out)
    detail.update({
        "metric": "cdc_replay_wall_sec_4N", "value": head["wall_4N"],
        "queries": qtimes, "queries_cores": CPUS, "controls": controls,
        "replay": {**replay_summary, "pairs": pairs},
    })
    try:
        with open(DETAIL_FILE, "w") as fh:
            json.dump(detail, fh, indent=1)
        _log(f"detail record -> {DETAIL_FILE}")
    except OSError as e:
        _log(f"detail write failed: {e}")

    out.update({
        "metric": "cdc_replay_wall_sec_4N",
        "value": head["wall_4N"],
        "queries": qtimes,
        # r2→r3 comparability: the query section always runs at this fixed
        # width regardless of the replay scaling pair (VERDICT r02 #10)
        "queries_cores": CPUS,
        "replay": replay_summary,
        "detail_file": os.path.basename(DETAIL_FILE),
    })
    sys.stdout.flush()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
