"""metacheck_spark — a from-scratch PySpark-native quality-filter engine.

Recasts the query/data-processing capabilities of the reference rule engine
(Anas-Elhounsri/MetaCheck, see /root/reference) as an idiomatic Spark
pipeline: language-ID + quality-filter + PII/toxicity scrub over a table of
image + caption pairs, per BASELINE.json's north_rule.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

from metacheck_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
