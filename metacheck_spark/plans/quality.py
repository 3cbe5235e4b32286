"""Declarative plan fragments for the quality-filter engine.

These return Columns / DataFrames built exclusively from native
pyspark.sql.functions so Catalyst can push down, prune, fold and
whole-stage-codegen them (no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metacheck_spark.rules.registry import TEXT_RULES, Rule


def text_rule_flag_cols(caption: Column, rules: list[Rule] | None = None) -> dict[str, Column]:
    """One boolean Column per text rule, keyed by rule code.

    Evaluated as a single projection — Catalyst folds the shared regex
    literals and codegen fuses all predicates into one pass over the
    caption (contrast: the reference visits each document 27 times in a
    Python loop, detect_pitfalls_main.py:306-311).
    """
    rules = rules if rules is not None else TEXT_RULES
    return {r.code: r.spark(caption) for r in rules}


def rule_hits_col(flag_cols: dict[str, Column]) -> Column:
    """array<string> of fired rule codes in registry order — the analog of
    the reference's ordered `checks` array (json_ld_utils.py:462-508).

    Built as filter(array(struct...)) so order is fixed by construction,
    not by any shuffle/sort.
    """
    pairs = [
        F.when(flag, F.lit(code)).otherwise(F.lit(None))
        for code, flag in flag_cols.items()
    ]
    arr = F.array(*pairs)
    return F.filter(arr, lambda x: x.isNotNull())


def with_text_rules(df: DataFrame, text_col: str = "caption",
                    rules: list[Rule] | None = None,
                    hits_col: str = "rule_hits") -> DataFrame:
    """Append an ordered rule_hits array computed from text rules only."""
    flags = text_rule_flag_cols(F.col(text_col), rules)
    return df.withColumn(hits_col, rule_hits_col(flags))


def rule_counts(df: DataFrame, text_col: str,
                rules: list[Rule] | None = None) -> DataFrame:
    """Per-rule hit counts in ONE aggregation pass (A1 analog,
    detect_pitfalls_main.py:317-318) — 27 conditional sums instead of an
    explode+groupBy, so there is no shuffle of exploded rows; the map-side
    partial aggregation reduces each partition to a single row.
    """
    rules = rules if rules is not None else TEXT_RULES
    c = F.col(text_col)
    aggs = [
        F.count(F.when(r.spark(c), 1)).alias(r.code.lower())
        for r in rules
    ]
    return df.agg(*aggs)
