from metacheck_spark.rules.registry import (
    REGISTRY,
    TEXT_RULES,
    Rule,
    rule_dim_rows,
)

__all__ = ["REGISTRY", "TEXT_RULES", "Rule", "rule_dim_rows"]
