"""Two-parallelism scaling benchmark (north rule evidence): the SAME
job at local[N] and local[4N] on the SAME input, reporting throughput
at both plus scaling efficiency → BENCH/BASELINE.md.

Measurement protocol (VERDICT r1 #4: interleaved A/B pairs, median):

* the input is the sf documents table replicated ``SCALE_MULT``-fold
  (deterministic: crossJoin with a range, url disambiguated by replica
  id) so the job is compute-bound rather than fixed-overhead-bound;
* BOTH parallelism levels run as resident subprocesses (fresh JVMs,
  warmed up once); the controller then alternates N→4N→N→4N… so each
  efficiency PAIR is measured inside the same co-tenant-noise window —
  sequential phases (round 1) let a load storm hit one phase only and
  produced 0.33–1.35 swings;
* the headline is the MEDIAN of ≥5 per-pair efficiencies (not the max);
* each level also times a quarter-size input, so the marginal
  (Amdahl-decomposed) efficiency can be derived: the per-job constant
  (planning, codegen, stage barriers) is O(1) per job and vanishes at
  10^12-doc inputs — the ledger reports both.

Usage: python scripts/scaling_bench.py [sf_dir] [N] [mult] [pairs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import json, sys, time
from pyspark.sql import functions as F
from openie_backend_spark.session import get_spark
from openie_backend_spark.operators.extract import extract_pages
from openie_backend_spark.operators.filters import instance_quality_filter
from openie_backend_spark.operators.group import group_extractions
from openie_backend_spark.operators.materialize import spo_table
from openie_backend_spark.operators.dedup import minhash_lsh_pairs

sf_dir, cpus, mult = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
mult_small = max(mult // 4, 1)
spark = get_spark(app_name=f"scaling-{cpus}", parallelism=cpus)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(sf_dir + "/documents.parquet")
base_docs = docs.count()

def replicated(m):
    reps = spark.range(m).withColumnRenamed("id", "rep")
    return (
        docs.crossJoin(reps)
        .select(
            F.concat(F.lit("doc://"), F.col("doc_id"), F.lit("#"), F.col("rep")).alias("url"),
            (F.col("doc_id") * m + F.col("rep")).alias("doc_id2"),
            "text", "lang",
        )
        .repartition(cpus * 3)
    )

big = replicated(mult)
small = replicated(mult_small)

def kg(src):
    ex = instance_quality_filter(
        extract_pages(src, include_layers=False), min_conf=0.0)
    return spo_table(group_extractions(ex)).count()

def mh():
    # make replicas textually distinct: replicated text would put 100
    # exact copies in every LSH bucket and the benchmark would measure
    # the O(k^2) pair blow-up of a pathological corpus, not minhashing
    distinct_text = small.select(
        F.col("doc_id2").alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz"), (F.col("doc_id2") % mult)).alias("text"),
    )
    return minhash_lsh_pairs(
        distinct_text, num_hashes=8, bands=4, max_full_bucket=20
    ).count()

# warm-up: same code paths (codegen, Python worker pool, page cache)
warm = big.limit(200).cache(); warm.count()
ex = instance_quality_filter(extract_pages(warm, include_layers=False), min_conf=0.0)
spo_table(group_extractions(ex)).count()
warm.unpersist()

print(json.dumps({"ready": True, "cpus": cpus, "base_docs": base_docs}), flush=True)

for line in sys.stdin:
    cmd = line.strip()
    if cmd == "quit":
        break
    t0 = time.time()
    if cmd == "big":
        n = kg(big)
    elif cmd == "small":
        n = kg(small)
    elif cmd == "mh":
        n = mh()
    else:
        continue
    print(json.dumps({"cmd": cmd, "sec": round(time.time() - t0, 2),
                      "out": n}), flush=True)
"""


class Level:
    def __init__(self, sf_dir: str, cpus: int, mult: int):
        self.cpus = cpus
        self.proc = subprocess.Popen(
            [sys.executable, "-c", WORKER, sf_dir, str(cpus), str(mult)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
            cwd=REPO, env=dict(os.environ, PYTHONPATH=REPO),
        )
        self.ready = json.loads(self._read())

    def _read(self) -> str:
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"worker local[{self.cpus}] died")
            line = line.strip()
            if line.startswith("{"):
                return line

    def run(self, cmd: str) -> dict:
        self.proc.stdin.write(cmd + "\n")
        self.proc.stdin.flush()
        return json.loads(self._read())

    def stop(self):
        try:
            self.proc.stdin.write("quit\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 400
    n_pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    lo = Level(sf_dir, n, mult)
    hi = Level(sf_dir, 4 * n, mult)
    base_docs = lo.ready["base_docs"]
    n_docs = base_docs * mult
    mult_small = max(mult // 4, 1)

    pairs = []
    for i in range(n_pairs):
        a = lo.run("big"); a_s = lo.run("small")
        b = hi.run("big"); b_s = hi.run("small")
        raw = (n_docs / b["sec"]) / (4 * (n_docs / a["sec"]))
        marg_lo = base_docs * (mult - mult_small) / max(a["sec"] - a_s["sec"], 1e-3)
        marg_hi = base_docs * (mult - mult_small) / max(b["sec"] - b_s["sec"], 1e-3)
        marg = marg_hi / (4 * marg_lo)
        pairs.append({
            "n_sec": a["sec"], "n_small_sec": a_s["sec"],
            "hi_sec": b["sec"], "hi_small_sec": b_s["sec"],
            "raw_eff": round(raw, 3), "marg_eff": round(marg, 3),
            "triples": b["out"],
        })
        assert a["out"] == b["out"], "determinism: outputs differ across levels"
        print(f"pair {i+1}/{n_pairs}: raw {raw:.3f} marg {marg:.3f} "
              f"(N {a['sec']}s, 4N {b['sec']}s)", file=sys.stderr)

    mh_lo = lo.run("mh"); mh_hi = hi.run("mh")
    assert mh_lo["out"] == mh_hi["out"]
    # eff = (docs/s at 4N) / (4 × docs/s at N) = lo_sec / (4 · hi_sec)
    mh_eff = mh_lo["sec"] / mh_hi["sec"] / 4
    lo.stop(); hi.stop()

    raw_med = statistics.median(p["raw_eff"] for p in pairs)
    marg_med = statistics.median(p["marg_eff"] for p in pairs)
    best_pair = max(p["raw_eff"] for p in pairs)
    kg_tph = max(p["triples"] / p["hi_sec"] * 3600 for p in pairs)
    hi_docs_per_sec = max(n_docs / p["hi_sec"] for p in pairs)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    ledger = os.path.join(REPO, "BENCH", "runs.jsonl")
    with open(ledger, "a") as fh:
        fh.write(json.dumps({
            "protocol": "interleaved_pairs", "mult": mult, "N": n,
            "raw_median": round(raw_med, 3), "marg_median": round(marg_med, 3),
            "mh_eff": round(mh_eff, 3), "pairs": pairs,
        }) + "\n")

    rows = "\n".join(
        f"| {i+1} | {p['n_sec']} | {p['hi_sec']} | {p['raw_eff']:.3f} | "
        f"{p['marg_eff']:.3f} |"
        for i, p in enumerate(pairs)
    )
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as fh:
        fh.write(f"""# BENCH/BASELINE — two-cluster-size scaling evidence

**Headline (median of {n_pairs} interleaved A/B pairs): KG pipeline
N→4N scaling efficiency raw = {raw_med:.3f}, marginal = {marg_med:.3f}
(gate ≥ 0.8).** MinHash dedup efficiency = {mh_eff:.3f}.

Protocol: the SAME job (extract → F2 filter → group → SPO, the engine's
headline pipeline) over {sf_dir} documents × {mult} replicas =
{n_docs} docs, at local[{n}] (N) and local[{4 * n}] (4N). Both JVMs are
resident and warmed; each pair measures N then 4N back-to-back inside
one noise window, because this host is shared and sequential-phase
protocols let a co-tenant load storm hit one phase only (round-1 runs
swung 0.33–1.35). Median-of-pairs is the headline, per the round-1
verdict; per-pair data below.

| pair | N sec | 4N sec | raw eff | marginal eff |
|---|---|---|---|---|
{rows}

- raw eff = (docs/s at 4N) / (4 × docs/s at N), end-to-end wall time.
- marginal eff: each level also times a quarter-size input; the
  marginal rate Δdocs/Δsec excludes the per-job constant (planning,
  codegen, stage barriers — O(1) per job, irrelevant at 10^12 docs).
  Constant term this run ≈ {pairs[-1]['n_small_sec']:.1f}s·4/3 at N
  vs {pairs[-1]['hi_small_sec']:.1f}s·4/3 at 4N quarter-size runs.
- KG throughput at 4N: **{kg_tph:.0f} triples/hour**,
  {hi_docs_per_sec:.0f} docs/s on this corpus (best pair).
- Output identity across levels every pair (same triple count
  {pairs[-1]['triples']}) doubles as a determinism check.
- best single pair this run: {best_pair:.3f}.

Caveat: the box has {os.cpu_count()} cores with one shared page cache;
at 4N = {4 * n} scheduler/co-tenant interference is real contention a
true 4N-executor cluster would not see, so these numbers UNDER-state
cluster scaling. Ledger of all runs: BENCH/runs.jsonl.

```json
{json.dumps(pairs, indent=2)}
```
""")
    print(json.dumps({"raw_median": round(raw_med, 3),
                      "marg_median": round(marg_med, 3),
                      "mh_eff": round(mh_eff, 3), "out": path}))


if __name__ == "__main__":
    main()
