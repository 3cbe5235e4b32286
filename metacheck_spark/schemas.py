"""Explicit schemas — the engine is schema-first (contrast with the
reference's fully dynamic per-document dict access, see
/root/reference .../detect_pitfalls_main.py:296-297 which json.loads whole
documents and probes keys defensively).

Primary input table per BASELINE.json input_hint:
images(image_id string, bytes binary, w int, h int, fmt string,
       caption string, phash bigint)
"""

from __future__ import annotations

from pyspark.sql import types as T

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

# Frozen URL-status dimension — replaces the reference's live HTTP GETs
# (p013.py:25-55, p025.py:17-48) for determinism; joined broadcast.
URL_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status_code", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

# One audit row per input row (the reference emits one JSON-LD document per
# flagged repo, json_ld_utils.py:462-508; we keep one row per *input* row so
# the audit table doubles as the resume ledger + lineage record).
AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("rule_hits", T.ArrayType(T.StringType()), False),
        T.StructField("n_pitfalls", T.IntegerType(), False),
        T.StructField("n_warnings", T.IntegerType(), False),
        T.StructField("keep", T.BooleanType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("lang_conf", T.DoubleType(), True),
        T.StructField("ppl", T.DoubleType(), True),
        T.StructField("scrubbed_caption", T.StringType(), True),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("run_ts", T.StringType(), False),
    ]
)

# Rule metadata dimension (code -> severity/description/category), the
# analog of the reference's registry + JSON-LD description tables
# (detect_pitfalls_main.py:262-290, json_ld_utils.py:54-88,318-353).
RULE_DIM_SCHEMA = T.StructType(
    [
        T.StructField("code", T.StringType(), False),
        T.StructField("severity", T.StringType(), False),
        T.StructField("category", T.StringType(), False),
        T.StructField("description", T.StringType(), False),
        T.StructField("rank", T.IntegerType(), False),
    ]
)
