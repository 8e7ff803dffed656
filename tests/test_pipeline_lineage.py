"""Pipeline manifest lineage: in-flight Observation counters must
agree with parquet-footer per-file counts (the integrity tripwire),
and resume must come from the manifest, not a recount."""

import json
import os

from openie_backend_spark.plans.pipeline import Pipeline
from openie_backend_spark.synth import ensure_corpus


def test_manifest_counters_match_footers(spark, tmp_path):
    work = str(tmp_path / "pipe")
    pages = spark.read.parquet(
        os.path.join(ensure_corpus(), "pages.parquet")
    ).limit(40)
    p = Pipeline(spark, work)
    p.run(pages)
    with open(os.path.join(work, "_manifest.json")) as fh:
        manifest = json.load(fh)
    for name, entry in manifest.items():
        per_file = entry["per_file_rows"]
        # footer sum == recorded rows == what a full read sees
        assert sum(per_file.values()) == entry["rows"]
        assert entry["partitions"] == len(per_file)
        assert entry["max_file_rows"] == max(per_file.values(), default=0)
        out = os.path.join(work, name)
        assert spark.read.parquet(out).count() == entry["rows"]
    # second driver resumes every stage from the manifest
    p2 = Pipeline(spark, work)
    p2.run(pages)
    assert all(r.resumed for r in p2.results)
    assert [r.rows for r in p2.results] == [r.rows for r in p.results]
