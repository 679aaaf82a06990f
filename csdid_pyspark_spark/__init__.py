"""csdid_pyspark_spark — a PySpark-native analytics engine.

Capabilities mirror the reference d2cml-ai/csdid-pyspark (Callaway &
Sant'Anna 2021 staggered difference-in-differences), re-expressed
Spark-first: all estimation math runs as distributed DataFrame
aggregations instead of driver-side NumPy (reference collects every
vector: /root/reference/csdids/ATTgt.py:346-351).

Beyond the reference surface, the engine ships the relational query
operators it relies on (scan/project/filter/join/agg/window) plus
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing, event sessionization) designed for 100 TB scale.

Layout:
    sources/    — table readers (parquet star schema; TESTDATA.md contract)
    functions/  — scalar/column helpers (formula parsing, text, vectors)
    operators/  — reusable distributed operators (dedup, similarity, ...)
    plans/      — (g,t) cell-spec planning for the DiD estimator
    did/        — the Callaway-Sant'Anna estimator, Spark-native
    queries/    — named, DuckDB-verifiable query surface over testdata
    streaming/  — structured-streaming operators over the events stream
"""

from csdid_pyspark_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
