"""Skew evidence for the salted kept-output write (VERDICT round-2 ask
#8): the caption-language distribution is Zipfian by construction
(SURVEY §7.4 / fixtures/gen_images.py), so an unsalted repartition by
language produces a straggler partition holding the head language, while
the (lang, pmod(phash, salt)) salt spreads each hot language over `salt`
sub-keys and keeps per-partition row counts near the mean."""

from pyspark.sql import functions as F

from metacheck_spark.pipeline import kept_output

# rough Zipf over 12 languages in percent (head-heavy like the fixture)
_LANG_PCT = [
    ("en", 31), ("es", 16), ("fr", 11), ("de", 8), ("it", 7), ("pt", 6),
    ("nl", 5), ("sv", 5), ("pl", 4), ("ro", 3), ("da", 2), ("fi", 2),
]


def _zipf_labeled(spark, n=8000):
    pct = F.col("id") % 100
    lang = None
    acc = 0
    for code, share in _LANG_PCT:
        cond = pct < acc + share
        lang = F.when(cond, code) if lang is None else lang.when(cond, code)
        acc += share
    return spark.range(n).select(
        F.concat(F.lit("img_"), F.col("id")).alias("image_id"),
        lang.otherwise("en").alias("lang"),
        F.lit("caption").alias("scrubbed_caption"),
        F.xxhash64("id").alias("phash"),
        F.lit(True).alias("keep"),
    )


def _partition_sizes(df):
    return [
        r["count"]
        for r in df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    ]


def test_salted_write_balances_zipf_skew(spark):
    n = 8000
    df = _zipf_labeled(spark, n)
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    mean = n / nparts

    # AQE rightly coalesces this toy-sized shuffle into one partition;
    # disable coalescing here so the test observes the HASH distribution
    # the salt produces — which is what holds at production scale, where
    # partitions are far above the coalesce target.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        salted = _partition_sizes(kept_output(df, salt=8))
        assert max(salted) <= 2.0 * mean, (salted, mean)

        # control: WITHOUT the salt the head language is one partition —
        # the straggler the salt exists to break up
        unsalted = _partition_sizes(
            df.filter(F.col("keep"))
            .select("image_id", "lang", "scrubbed_caption", "phash")
            .repartition(F.col("lang"))
        )
        assert max(unsalted) > 2.0 * mean, (unsalted, mean)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
