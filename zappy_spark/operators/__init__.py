"""Reusable pipeline operators (beyond-reference, BASELINE.json north star).

Generic DataFrame-in/DataFrame-out operators; the declared-corpus
wrappers over the testdata tables live in
``zappy_spark.queries.pipeline_ops``.
"""
