"""PySpark worker daemon with pre-forked warm imports.

Stock PySpark forks a fresh worker per task slot from a daemon that has
imported only ``pyspark.daemon``; every forked worker then pays the full
import chain (pandas, pyarrow, the Arrow serializers, this package's NLP
modules) plus the tagger/chunker model parse — ~0.7-1 s of CPU per
worker, ×32 workers on the local harness, charged to the first
Python-stage query of the session. Measured with
``scripts/cpu_attrib.py``: kg_spo cold 18.3 s wall / 132 python-CPU-s
vs 3.0 s / 14.5 CPU-s with warm workers — the import storm, not the
NLP, dominates the cold run.

Fix (guide §4.5, "heavyweight init once per task", applied one level
higher — once per process TREE): point ``spark.python.daemon.module``
at this module. It performs the heavy imports and model loads ONCE in
the daemon, calls ``gc.freeze()`` so the preloaded objects move to the
permanent generation (forked children's collections neither traverse
nor copy-on-write them — the CPython prefork idiom), and then hands
control to the stock ``pyspark.daemon.manager``.  Every forked worker
inherits warm modules and parsed models via fork copy-on-write.

The preload is best-effort: a failure (package not on the worker path,
models absent) must never take down the daemon, because non-Python
queries and foreign UDFs still need workers; stock behaviour is the
fallback.
"""

from __future__ import annotations

import gc


def _preload() -> None:
    try:
        import pyspark.worker  # noqa: F401  (drags serializers, sql.types)
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401
        from pyspark.sql.pandas.serializers import (  # noqa: F401
            ArrowStreamPandasUDFSerializer,
        )
    except Exception:
        return
    try:
        from openie_backend_spark.nlp import (  # noqa: F401
            chunker, confidence, perceptron, reverb, stemmer,
        )

        # parse the tagger/chunker models once; workers inherit the
        # module-level cache (perceptron._CACHED*) through fork
        perceptron.get_tagger()
        perceptron.get_chunker()
    except Exception:
        pass


if __name__ == "__main__":
    _preload()
    gc.freeze()
    # pyspark.daemon's top-level code reads sys.argv itself (worker
    # module selection), so plain import + manager() preserves stock
    # behaviour exactly
    import pyspark.daemon

    pyspark.daemon.manager()
