"""Checkpoint-resumable pipeline driver (north rule: per-partition
lineage + counters, resume from last complete stage).

The reference restarts jobs by line offset ("tail -n +X",
``docs/reverb-cluster-extraction-indexing.txt:92-94``). Here every
stage is a pure table→table function materialized to parquet
(Iceberg-shaped: the write path is `.format()`-pluggable) with a
manifest entry recording row counts (observed in-flight via
``Observation`` — no second pass), per-file lineage from parquet
footers (metadata-only, the Iceberg-manifest shape), and per-stage
wall time; footer-sum vs observed-count is an integrity tripwire.
``run`` skips stages whose manifest entry and output both exist —
idempotent re-runs, exactly-once semantics per stage.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from openie_backend_spark.operators import extract, filters, group, link, materialize


def _parquet_file_rows(out_dir: str) -> dict[str, int]:
    """Per-FILE row counts from parquet footers — metadata-only, no
    data scan. These are exactly the counts an Iceberg manifest
    records per data file; with a real Iceberg catalog this whole
    function is a snapshot-metadata query. Driver-side O(#files)
    footer reads (a few KB each), never O(rows)."""
    import pyarrow.parquet as pq

    per: dict[str, int] = {}
    for root, _dirs, files in os.walk(out_dir):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                per[os.path.relpath(p, out_dir)] = pq.ParquetFile(
                    p
                ).metadata.num_rows
    return per


@dataclass
class StageResult:
    name: str
    rows: int
    partitions: int
    seconds: float
    resumed: bool


class Pipeline:
    """Staged KG-construction run rooted at ``work_dir``."""

    def __init__(self, spark: SparkSession, work_dir: str, fmt: str = "parquet"):
        self.spark = spark
        self.work_dir = work_dir
        self.fmt = fmt
        self.manifest_path = os.path.join(work_dir, "_manifest.json")
        os.makedirs(work_dir, exist_ok=True)
        self.manifest: dict = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as fh:
                self.manifest = json.load(fh)
        self.results: list[StageResult] = []

    def _out(self, name: str) -> str:
        return os.path.join(self.work_dir, name)

    def _save_manifest(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self.manifest, fh, indent=2)
        os.replace(tmp, self.manifest_path)

    def stage(
        self,
        name: str,
        fn: Callable[[], DataFrame],
        partition_by: list[str] | None = None,
        buckets: tuple[int, str] | None = None,
    ) -> DataFrame:
        """Run (or resume) one stage; returns the materialized table."""
        out = self._out(name)
        if name in self.manifest and os.path.exists(out):
            df = self.spark.read.format(self.fmt).load(out)
            self.results.append(StageResult(name, self.manifest[name]["rows"],
                                            self.manifest[name]["partitions"], 0.0, True))
            return df
        t0 = time.time()
        df = fn()
        if buckets:
            n, col = buckets
            # parquet path has no bucket metastore; emulate with an
            # explicit bucket column so scans can prune on it
            df = df.withColumn("_bucket", materialize.bucket_expr(F.col(col), n))
            partition_by = ["_bucket"]
        # in-flight counters (north rule: per-partition lineage +
        # counters): Observation collects the row count DURING the
        # write action — zero extra passes, exactly-once per
        # successful task. The old shape (re-read the output and
        # groupBy spark_partition_id) was a full second scan of every
        # stage's output; at 100 TB that doubles the pipeline's read
        # volume.
        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        writer = df.write.format(self.fmt).mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(out)
        observed_rows = int(obs.get["rows"])
        written = self.spark.read.format(self.fmt).load(out)
        # per-file lineage from parquet footers (metadata-only; the
        # Iceberg-manifest shape). Footer sum vs in-flight observed
        # count is an end-to-end integrity tripwire: a mismatch means
        # the sink lost or duplicated rows between the observe node
        # and the committed files.
        per_file = _parquet_file_rows(out) if self.fmt == "parquet" else {}
        rows = sum(per_file.values()) if per_file else observed_rows
        if per_file and rows != observed_rows:
            raise RuntimeError(
                f"stage {name}: observed {observed_rows} rows in-flight "
                f"but committed files hold {rows} — sink integrity violated"
            )
        parts = len(per_file) or written.rdd.getNumPartitions()
        dt = time.time() - t0
        self.manifest[name] = {
            "rows": rows,
            "partitions": parts,
            "seconds": round(dt, 2),
            "ts": time.time(),
            "per_file_rows": per_file,
            "max_file_rows": max(per_file.values(), default=rows),
        }
        self._save_manifest()
        self.results.append(StageResult(name, rows, parts, dt, False))
        return written

    # ---- the canonical KG-construction DAG (SURVEY §3.1 steps 2-7) ----

    def run(
        self,
        pages: DataFrame,
        dims: dict[str, DataFrame] | None = None,
        corpus: str = "cc",
        run_typer: bool = False,
        dedup_sentences: bool = False,
    ) -> dict[str, DataFrame]:
        # dedup_sentences: run the NLP once per DISTINCT sentence and
        # join provenance back — row-identical output, CPU ∝ distinct
        # ratio. Enable for boilerplate-heavy corpora (SCALE.md §2).
        extractions = self.stage(
            "extractions",
            lambda: extract.extract_pages(
                pages, dedup_sentences=dedup_sentences),
        )
        filtered = self.stage(
            "extractions_filtered",
            lambda: filters.instance_quality_filter(extractions),
        )
        groups = self.stage(
            "groups",
            lambda: group.group_extractions(filtered, corpus=corpus),
        )
        groups_kept = self.stage(
            "groups_filtered", lambda: filters.group_filter(groups, min_instances=1)
        )
        if dims is not None:
            linked = self.stage(
                "groups_linked", lambda: link.link_groups(groups_kept, dims)
            )
            if run_typer:
                from openie_backend_spark.operators import typer

                stop = dims.get("dim_entity_stoplist")
                linked = self.stage(
                    "groups_typed",
                    lambda: typer.type_unlinkable(
                        typer.type_unlinkable(linked, "arg1", stop),
                        "arg2",
                        stop,
                    ),
                )
        else:
            linked = groups_kept
        spo = self.stage(
            "spo",
            lambda: materialize.spo_table(linked),
            buckets=(16, "subject_id"),
        )
        # reverse index: the same triples bucketed by OBJECT, so
        # object-side point lookups prune like subject-side ones (the
        # reference's Lucene index serves arg1 and arg2 queries alike,
        # ExtractionGroupFetcher arg2 fields; columnar stores pay 2x
        # storage for the second sort order instead)
        ops = self.stage(
            "ops",
            lambda: spo.drop("_bucket"),
            buckets=(16, "object_id"),
        )
        edges = self.stage("edges", lambda: materialize.edge_table(spo))
        nodes = self.stage("nodes", lambda: materialize.node_table(spo))
        return {
            "extractions": extractions,
            "groups": linked,
            "spo": spo,
            "ops": ops,
            "edges": edges,
            "nodes": nodes,
        }
