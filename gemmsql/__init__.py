"""gemmsql — a PySpark-native analytics engine with the query surface of
joenaess/GeMMMapReduce, rebuilt Spark-first.

The reference (/root/reference) frames every operator as a monoidal
map-reduce fold: ``init`` (identity), ``chunker`` (tile enumerator),
``proj_fold`` (tile -> monoid value), ``binary_reduce`` (associative
merge) — see reference core.py:15-64.  Spark's partial+final hash
aggregation IS that contract, so here every operator is a declarative
DataFrame plan (Catalyst chooses the physical strategy), with NumPy-backed
``mapInPandas``/``applyInPandas`` kernels only for the dense block math
that built-in columnar expressions cannot express efficiently.

Public surface:

- :mod:`gemmsql.session` — SparkSession builder tuned for the engine.
- :mod:`gemmsql.datamodel` — COO / vector-row / block matrix DataFrames.
- :mod:`gemmsql.monoid` — ``make_monoid_op``: the ``mk_GeMMMapReduce``
  analog (reference core.py:15-64) over Spark aggregation.
- :mod:`gemmsql.ops` — matmul, relu_matmul, mlp, attention, xentropy,
  entropy, sampling (reference operator inventory, SURVEY.md §2).
- :mod:`gemmsql.pipeline` — LLM-data-pipeline operators: dedup,
  similarity search, text analysis, event analytics, multimodal.
- :mod:`gemmsql.streaming` — Structured Streaming variants.
"""

from gemmsql.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
