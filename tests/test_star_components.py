"""Large-star/small-star connected components: plan shape + convergence.

VERDICT r4 findings 1 and 5: the unrolled self-referencing CTE text made
qg11 the suite's slowest query (plan-bound — faster at sf0.1 than
sf0.01); the fix is DataFrame rounds with a lazy ``localCheckpoint`` per
star step (the qg04 pointer-doubling pattern), plus an
iterate-to-convergence mode with the monotone-sum stop. These tests pin
both: the final plan must read checkpointed edges (no base re-scan, no
exchange blowup), and ``star_components`` must converge to the exact
transitive closure computed by a DuckDB recursive CTE.
"""

import re

import duckdb
import pytest
from pyspark.sql import functions as F


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def _qg11_edges(spark, sf_dir):
    from pdf_spark.functions.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    return (
        docs.select(
            F.col("doc_id").alias("u"),
            (F.col("doc_id") % 3 + 1).cast("long").alias("d"),
        )
        .select("u", F.explode(F.expr("sequence(1, CAST(d AS INT))")).alias("k"))
        .select(
            "u", ((F.col("u") * 7 + F.col("k")) % n).cast("long").alias("v")
        )
    )


def test_qg11_plan_reads_checkpoints_not_base(spark, sf_dir):
    """Lineage must be truncated: the returned plan hangs off the last
    round's materialized edges (Scan ExistingRDD), never re-expanding
    the 4-star-step subtree back to the parquet scan."""
    from pdf_spark.functions.registry import all_queries

    df = all_queries()["qg11_star_components"](spark, sf_dir)
    plan = _plan(spark, df)
    assert "Scan ExistingRDD" in plan, "rounds must be checkpointed"
    assert "Scan parquet" not in plan, "base edges re-expanded into the plan"
    # final fragment = last small-star step off its checkpointed sym
    # (min groupBy + join + union-distinct) + final symmetrize + label
    # groupBy: a constant 7 exchanges regardless of round count, not
    # 2^rounds worth of re-expanded subtree
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchange <= 8, f"exchange blowup: {n_exchange}\n{plan}"


def test_qg11_round_plan_scans_checkpoint_once(spark, sf_dir):
    """One star step references its symmetrized edges twice (min-agg
    joins back); the checkpoint must make that ONE materialized scan,
    i.e. every ExistingRDD leaf in a single round's plan is the same
    RDD and the round never reaches parquet."""
    from pdf_spark.functions.graph import _star_round

    edges = _qg11_edges(spark, sf_dir).localCheckpoint()
    plan = _plan(spark, _star_round(edges))
    assert "Scan parquet" not in plan


def test_star_components_converges_to_recursive_cte_closure(spark, sf_dir):
    """Fixpoint labels == exact transitive closure (DuckDB recursive CTE
    over the identical edge list), with round count logged."""
    from pdf_spark.functions.graph import star_components

    edges = _qg11_edges(spark, sf_dir)
    labels, rounds = star_components(edges)
    assert 1 <= rounds <= 20
    got = {
        (r["node"], r["label"])
        for r in labels.collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM read_parquet(?)",
        [sf_dir + "/documents.parquet"],
    )
    oracle = con.execute(
        """
WITH RECURSIVE deg AS (
  SELECT doc_id AS u, CAST(doc_id % 3 + 1 AS BIGINT) AS d FROM documents
),
edges AS (
  SELECT u, CAST((u * 7 + k) % (SELECT COUNT(*) FROM documents) AS BIGINT)
         AS v
  FROM deg, LATERAL unnest(range(1, d + 1)) t(k)
),
und AS (
  SELECT u, v FROM edges WHERE u <> v
  UNION
  SELECT v, u FROM edges WHERE u <> v
),
reach(node, r) AS (
  SELECT u, u FROM und
  UNION
  SELECT und.u, reach.r FROM und JOIN reach ON und.v = reach.node
)
SELECT node, MIN(r) AS label FROM reach GROUP BY node
"""
    ).fetchall()
    assert got == set(oracle)


def test_star_components_monotone_sum_stop_idle_graph(spark):
    """A graph already at fixpoint (star edges to the minimum) stops
    after the confirming round, not max_rounds."""
    from pdf_spark.functions.graph import star_components

    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 8)], "u: long, v: long"
    )
    labels, rounds = star_components(edges, max_rounds=10)
    assert rounds <= 2
    assert {(r["node"], r["label"]) for r in labels.collect()} == {
        (i, 0) for i in range(8)
    }


def test_star_components_two_components_and_singleton_path(spark):
    """Two chains + an isolated pair: labels are per-component minima."""
    from pdf_spark.functions.graph import star_components

    chain = [(i, i + 1) for i in range(0, 6)]  # 0..6 one component
    pair = [(10, 11)]
    edges = spark.createDataFrame(chain + pair, "u: long, v: long")
    labels, _rounds = star_components(edges)
    got = {(r["node"], r["label"]) for r in labels.collect()}
    want = {(i, 0) for i in range(7)} | {(10, 10), (11, 10)}
    assert got == want
