"""Operator/query matrix exercised against the DuckDB oracle.

Each submodule exports ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name, str]`` (ANSI SQL DuckDB runs over the same parquet).
``registry.all_queries()/all_oracles()`` aggregate them for
``__spark_entry__``.
"""
