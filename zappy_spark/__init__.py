"""zappy_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities
of ``lasersonlab/zappy`` (a distributed chunked NumPy array library;
see SURVEY.md — the reference checkout was empty this round, so
citations are to the public repo's module layout, e.g.
``zappy/base.py::ZappyArray``), re-expressed Spark-first:

- zappy's dense-array ops (elementwise ufuncs, axis aggregations,
  boolean masking, broadcast arithmetic) become DataFrame column
  expressions over either named numeric columns or ``array<double>``
  columns — never RDDs, so Catalyst/AQE/whole-stage-codegen apply.
- Beyond the reference: relational operators, window functions,
  streaming (Structured Streaming), and LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing),
  each designed for 100 TB scale.
"""

from zappy_spark.session import get_session, configure
from zappy_spark.frame import ZappyFrame

__all__ = ["get_session", "configure", "ZappyFrame"]
__version__ = "0.1.0"
