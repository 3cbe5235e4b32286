"""Structured Streaming surface — incremental quality-filter runs.

The reference is strictly batch (SURVEY.md §2.10); the north_rule requires
batch + resumability, which pipeline.write_audit's bucket ledger provides.
This module adds the optional incremental path: new files landing in the
images table directory are processed exactly once via a file-source stream
with Trigger.AvailableNow + checkpointing — the idiomatic Spark way to run
"only the rows that arrived since the last run" without hand-rolled ledgers.

Everything downstream of readStream is the SAME declarative plan as batch
(text rules are pure Column expressions), so batch/stream parity is by
construction, not duplication. Stages that need a join or pandas UDF state
run fine in streams too (broadcast joins of static dims are supported);
windowed counts demonstrate watermarking for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metacheck_spark.plans.quality import with_text_rules
from metacheck_spark.schemas import IMAGES_SCHEMA


def read_images_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(IMAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def incremental_rule_flags(images_stream: DataFrame) -> DataFrame:
    """The text-rule battery over a stream — identical Column expressions
    as the batch plan (plans/quality.py), appended per micro-batch."""
    return with_text_rules(images_stream, "caption").select(
        "image_id",
        "caption",
        "rule_hits",
        (F.size(F.filter("rule_hits", lambda c: ~c.startswith("W"))) == 0).alias(
            "keep"
        ),
    )


def run_available_now(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
) -> None:
    """Process exactly the files not yet seen (per the checkpoint), then
    stop — the incremental batch pattern (Trigger.AvailableNow). Re-running
    after new files land processes only the delta."""
    flags = incremental_rule_flags(read_images_stream(spark, input_path))
    q = (
        flags.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def run_full_pipeline_available_now(
    spark: SparkSession,
    input_path: str,
    url_status: DataFrame,
    output_path: str,
    checkpoint_path: str,
) -> None:
    """The FULL quality-filter pipeline (binary sanity + decode + fused
    caption-model UDF + keep/drop + scrub) over the file stream — the same
    assemble_flags/with_labels plan as batch, which Structured Streaming
    accepts unchanged because every stage is narrow (no shuffle). Each
    AvailableNow run processes exactly the new files since the checkpoint:
    the streaming counterpart of the bucket-ledger resume."""
    from metacheck_spark.pipeline import assemble_flags, with_labels

    stream = read_images_stream(spark, input_path)
    labeled = with_labels(assemble_flags(stream, url_status, url_mode="udf"))
    out = labeled.select(
        "image_id",
        "rule_hits",
        "n_pitfalls",
        "n_warnings",
        "keep",
        "lang",
        "lang_conf",
        "ppl",
        "scrubbed_caption",
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()


def stateful_stream_dedup(flags_stream: DataFrame) -> DataFrame:
    """Custom stateful operator: exactly-once emission of each distinct
    caption fingerprint across micro-batches via applyInPandasWithState —
    a streaming exact-dedup (first arrival wins, later copies suppressed).

    State per key is one boolean; with GroupStateTimeout the state store
    stays bounded. This is the applyInPandasWithState pattern for operators
    Spark lacks natively (SURVEY.md §2.8 tier 3).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = flags_stream.withColumn(
        "fp", F.md5(F.trim(F.regexp_replace(F.lower("caption"), r"\s+", " ")))
    )

    out_schema = "fp string, image_id string, caption string"
    state_schema = "seen boolean"

    def dedup_fn(key, pdf_iter, state):
        if state.exists:
            return iter(())
        first = None
        for pdf in pdf_iter:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]][["fp", "image_id", "caption"]]
        state.update((True,))
        if first is None:
            return iter(())
        return iter([pd.DataFrame(first)])

    return keyed.groupBy("fp").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_hit_counts(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    window_len: str = "5 minutes",
) -> DataFrame:
    """Watermarked tumbling-window per-rule hit counts over a flag stream —
    the late-data-tolerant analog of the batch A1 aggregate. State is
    bounded by the watermark; works on any stream bearing (ts, rule_hits)."""
    return (
        events.withWatermark(ts_col, watermark)
        .select(ts_col, F.explode("rule_hits").alias("code"))
        .groupBy(F.window(ts_col, window_len).alias("win"), "code")
        .count()
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "code",
            "count",
        )
    )
