"""Controlled same-window kg_spo A/B (VERDICT r3 #2): run the bench
suite in fresh JVMs, alternating the raw-text tagger between the
perceptron model and the rule/lexicon path (``OPENIE_TAGGER=rule``),
interleaved A-B-A-B so both arms see the same box conditions. Reports
wall AND tree-CPU seconds per query (bench.tree_cpu_seconds) — CPU is
bandwidth/co-tenant-insensitive, so the perceptron's real cost is the
CPU delta on kg_spo while the tell queries (t9_per_key_cap,
dedup_ngram_jaccard) bound the window's noise. Appends a markdown
section to BENCH/AB_TAGGER.md.

Usage: python scripts/ab_tagger_bench.py [n_pairs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH", "AB_TAGGER.md")


def run_bench(tagger: str) -> dict:
    env = dict(os.environ)
    if tagger == "rule":
        env["OPENIE_TAGGER"] = "rule"
    else:
        env.pop("OPENIE_TAGGER", None)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800,
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if p.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench.py ({tagger}) failed rc={p.returncode}:\n"
            f"{p.stderr[-2000:]}"
        )
    return json.loads(lines[-1])


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    runs: list[dict] = []
    for i in range(n_pairs):
        # alternate arm order across pairs: the first bench of a fresh
        # JVM pays JIT warmup and the heavier kg_spo raises GC pressure
        # for the rest of its suite, so a fixed order would bias the
        # tell queries against whichever arm always runs first
        order = ("perceptron", "rule") if i % 2 == 0 else ("rule", "perceptron")
        for arm in order:
            r = run_bench(arm)
            r["arm"] = arm
            runs.append(r)
            print(f"pair {i} {arm}: suite {r['value']}s wall, "
                  f"{r['cpu_total']}s cpu, kg_spo {r['queries']['kg_spo']}s "
                  f"wall / {r['cpu_seconds']['kg_spo']}s cpu, "
                  f"{r['kg_triples']} triples", flush=True)

    def med(arm, field, key=None):
        vals = [
            (r[field][key] if key else r[field])
            for r in runs if r["arm"] == arm
        ]
        return statistics.median(vals)

    tells = ["t9_per_key_cap", "dedup_ngram_jaccard", "g1_group_agg"]
    lines = [
        "",
        f"## A/B (round 4): perceptron vs rule tagger, {n_pairs} interleaved pairs",
        "",
        "| metric | perceptron | rule | delta |",
        "|---|---|---|---|",
    ]
    for label, field, key in (
        ("kg_spo wall s", "queries", "kg_spo"),
        ("kg_spo CPU s", "cpu_seconds", "kg_spo"),
        ("suite wall s", "value", None),
        ("suite CPU s", "cpu_total", None),
        ("kg triples", "kg_triples", None),
    ):
        a = med("perceptron", field, key)
        b = med("rule", field, key)
        lines.append(f"| {label} | {a} | {b} | {round(a - b, 2)} |")
    for q in tells:
        a = med("perceptron", "queries", q)
        b = med("rule", "queries", q)
        lines.append(
            f"| tell {q} wall s | {a} | {b} | "
            f"{round(abs(a - b) / max(a, b) * 100)}% spread |"
        )
    lines += [
        "",
        "Tell queries do not touch the tagger: their spread bounds the",
        "window's co-tenant noise; the kg_spo CPU delta is the tagger's",
        "real cost (tree-CPU is immune to wall-clock contention).",
        "",
        "Raw runs:",
        "```json",
        *[json.dumps({k: r[k] for k in
                      ("arm", "value", "cpu_total", "kg_triples", "queries",
                       "cpu_seconds")})
          for r in runs],
        "```",
    ]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
