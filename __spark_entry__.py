"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in metacheck_spark/ — this module only wires the
contract surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metacheck_spark.plans.quality import rule_counts
from metacheck_spark.rules.registry import DUCKDB_SAFE

SF0001 = "/root/testdata/sf0.001"


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


# ---------------------------------------------------------------------------
# Flagship: the quality-filter rule battery evaluated over the documents
# table in a single codegen'd pass, reduced to per-rule hit counts (the A1
# aggregate of SURVEY.md §2.4).

def entry(spark: SparkSession) -> DataFrame:
    return q_rule_counts(spark, SF0001)


# ---------------------------------------------------------------------------
# Deterministic trigger seeding: the documents corpus is generic vocabulary
# (no rule fires on it), so both sides decorate text with rule-trigger
# snippets keyed by doc_id % 12. Identical expressions in Spark and DuckDB —
# the comparison then exercises every predicate with varied outcomes instead
# of hashing an all-false table.

_TRIGGERS = [
    " see <year> placeholder",                       # P002
    " requires numpy",                               # W003
    " written in Python",                            # W010
    " deps: Numpy Pandas",                           # W012
    " visit https://proj.readthedocs.io/latest",     # P006
    " archived at zenodo.org/record/123",            # P007
    " tags [red, fox]",                              # W021
    " swh:1:rev:0123456789abcdef0123456789abcdef01234567 ok",  # P028
]


def _seeded_caption_col() -> F.Column:
    c = F.col("text")
    expr = F.when(F.col("doc_id") % 12 == 8, F.lit(""))          # W015
    expr = expr.when(F.col("doc_id") % 12 == 9, F.concat(c, F.lit("  end")))  # P018
    expr = expr.when(
        F.col("doc_id") % 12 == 10, F.lit("https://www.example.com/x")
    )  # P020
    for i, t in enumerate(_TRIGGERS):
        expr = expr.when(F.col("doc_id") % 12 == i, F.concat(c, F.lit(t)))
    return expr.otherwise(c)


def _seeded_caption_sql() -> str:
    cases = [
        "WHEN doc_id % 12 = 8 THEN ''",
        "WHEN doc_id % 12 = 9 THEN text || '  end'",
        "WHEN doc_id % 12 = 10 THEN 'https://www.example.com/x'",
    ] + [
        f"WHEN doc_id % 12 = {i} THEN text || '{t}'"
        for i, t in enumerate(_TRIGGERS)
    ]
    return "CASE " + " ".join(cases) + " ELSE text END"


def q_rule_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule hit counts over trigger-seeded captions — one aggregation
    pass, no explode/shuffle of per-hit rows (map-side partial agg)."""
    df = _documents(spark, sf_dir).withColumn("caption", _seeded_caption_col())
    return rule_counts(df, "caption", DUCKDB_SAFE)


def _rule_counts_sql() -> str:
    exprs = ",\n  ".join(
        f"count(CASE WHEN {r.duckdb.format(c='caption')} THEN 1 END) AS {r.code.lower()}"
        for r in DUCKDB_SAFE
    )
    return (
        f"SELECT\n  {exprs}\nFROM (SELECT {_seeded_caption_sql()} AS caption"
        " FROM documents)"
    )


def q_rule_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boolean flag per DuckDB-expressible rule — the row-level
    predicate surface itself, value-hash-checked against the oracle."""
    df = _documents(spark, sf_dir).withColumn("caption", _seeded_caption_col())
    c = F.col("caption")
    cols = [F.col("doc_id")] + [
        r.spark(c).alias(f"{r.code.lower()}_hit") for r in DUCKDB_SAFE
    ]
    return df.select(*cols)


def _rule_flags_sql() -> str:
    exprs = ",\n  ".join(
        f"{r.duckdb.format(c='caption')} AS {r.code.lower()}_hit" for r in DUCKDB_SAFE
    )
    return (
        f"SELECT doc_id,\n  {exprs}\nFROM (SELECT doc_id,"
        f" {_seeded_caption_sql()} AS caption FROM documents)"
    )


def q_agg_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregate (A1-A5 analog: grouped counts/sums/avgs)."""
    df = _lineitem(spark, sf_dir)
    return (
        df.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_AGG_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rule_counts": q_rule_counts,
        "rule_flags": q_rule_flags,
        "agg_pricing": q_agg_pricing,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "rule_counts": _rule_counts_sql(),
        "rule_flags": _rule_flags_sql(),
        "agg_pricing": _AGG_PRICING_SQL,
    }
