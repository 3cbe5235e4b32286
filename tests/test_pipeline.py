"""Golden E2E (SURVEY.md §5.2): the Spark pipeline's labels vs the
pure-Python oracle, row by row — keep/drop F1 >= 0.99, exact rule_hits,
exact scrubbed captions, decoded-pixel PSNR >= 40 dB for lossy rows
(BASELINE.json metric / input_hint). Plus audit write + resume ledger."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from metacheck_spark.fixtures import codec
from metacheck_spark.fixtures.gen_images import gen_rows, source_pixels, url_status_map
from metacheck_spark.fixtures.oracle import label_rows
from metacheck_spark.pipeline import (
    completed_buckets,
    metrics_frame,
    per_language_rule_counts,
    resume_filter,
    run_pipeline,
    write_audit,
)

N = 600


@pytest.fixture(scope="module")
def audit_rows(spark, images_dir):
    images = spark.read.parquet(f"{images_dir}/images.parquet")
    us = spark.read.parquet(f"{images_dir}/url_status.parquet")
    audit = run_pipeline(spark, images, us)
    return {r["image_id"]: r for r in audit.collect()}


@pytest.fixture(scope="module")
def golden():
    return {l["image_id"]: l for l in label_rows(gen_rows(N), url_status_map())}


def test_keep_drop_f1(audit_rows, golden):
    tp = sum(1 for i in golden if golden[i]["keep"] and audit_rows[i]["keep"])
    fp = sum(1 for i in golden if not golden[i]["keep"] and audit_rows[i]["keep"])
    fn = sum(1 for i in golden if golden[i]["keep"] and not audit_rows[i]["keep"])
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"keep/drop F1 {f1:.4f} below target"


def test_rule_hits_exact(audit_rows, golden):
    for iid, e in golden.items():
        assert list(audit_rows[iid]["rule_hits"]) == e["rule_hits"], iid


def test_scrubbed_captions_exact(audit_rows, golden):
    for iid, e in golden.items():
        assert audit_rows[iid]["scrubbed_caption"] == e["scrubbed_caption"], iid


def test_counts_and_lang(audit_rows, golden):
    for iid, e in golden.items():
        g = audit_rows[iid]
        assert (g["n_pitfalls"], g["n_warnings"], g["lang"]) == (
            e["n_pitfalls"],
            e["n_warnings"],
            e["lang"],
        ), iid


def test_decoded_pixels_psnr(images_dir, spark):
    """Per-row pixel invariant vs the PRE-encode source array: exact
    (allclose) for PNG, PSNR >= 40 dB for the lossy format."""
    rows = spark.read.parquet(f"{images_dir}/images.parquet").limit(64).collect()
    checked = lossy = 0
    for r in rows:
        i = int(r["image_id"][4:])
        src = source_pixels(i)
        got = codec.decode(bytes(r["bytes"]))
        if got is None:  # intentionally corrupt rows
            continue
        if codec.sniff_format(bytes(r["bytes"])) == "png":
            assert np.array_equal(got, src)
        else:
            assert codec.psnr(src, got) >= 40.0
            lossy += 1
        checked += 1
    assert checked > 40 and lossy > 5


def test_metrics_frame(spark, images_dir, golden):
    images = spark.read.parquet(f"{images_dir}/images.parquet")
    us = spark.read.parquet(f"{images_dir}/url_status.parquet")
    m = metrics_frame(run_pipeline(spark, images, us)).collect()[0]
    assert m["total_rows"] == N
    assert m["kept_rows"] == sum(1 for e in golden.values() if e["keep"])
    assert m["p018"] == sum(1 for e in golden.values() if "P018" in e["rule_hits"])
    assert m["total_pitfalls"] == sum(e["n_pitfalls"] for e in golden.values())


def test_per_language_rule_counts(spark, images_dir, golden):
    images = spark.read.parquet(f"{images_dir}/images.parquet")
    us = spark.read.parquet(f"{images_dir}/url_status.parquet")
    got = {
        (r["code"], r["lang"]): r["count"]
        for r in per_language_rule_counts(run_pipeline(spark, images, us)).collect()
    }
    exp: dict = {}
    for e in golden.values():
        for c in e["rule_hits"]:
            exp[(c, e["lang"])] = exp.get((c, e["lang"]), 0) + 1
    assert got == exp


def test_salted_repartition_splits_skewed_langs(spark, images_dir):
    """The language distribution is Zipfian by construction ('en'
    dominates); the salted repartition must cap the largest partition far
    below the hot language's share, so no straggler task carries a whole
    language shard."""
    from pyspark.sql import functions as F2

    from metacheck_spark.pipeline import kept_output

    images = spark.read.parquet(f"{images_dir}/images.parquet")
    us = spark.read.parquet(f"{images_dir}/url_status.parquet")
    labeled = run_pipeline(spark, images, us).withColumnRenamed(
        "scrubbed_caption", "scrubbed_caption"
    )
    # run_pipeline returns the audit projection; rebuild labeled frame
    from metacheck_spark.pipeline import assemble_flags, with_labels

    lab = with_labels(assemble_flags(images, us))
    out = kept_output(lab, salt=4)
    # Assert on the shuffle KEY distribution (lang, pmod(phash, salt)) —
    # what determines task sizes at scale. (Physical partition counts are
    # meaningless at test scale: AQE rightly coalesces 600 rows into one
    # partition.)
    kept = lab.filter(F2.col("keep"))
    total = kept.count()
    hot_share = (
        kept.groupBy("lang").count().orderBy(F2.desc("count")).head()["count"]
        / total
    )
    key_sizes = (
        out.groupBy("lang", F2.pmod(F2.col("phash"), F2.lit(4)).alias("s"))
        .count()
        .collect()
    )
    biggest_key = max(r["count"] for r in key_sizes) / total
    # the hot language holds ~35-50% of kept rows; salt=4 splits it ~4x
    assert hot_share > 0.25
    assert biggest_key < hot_share * 0.6, (biggest_key, hot_share)


def test_url_modes_agree(spark, images_dir):
    """The broadcast-dict UDF path (scale default, zero shuffle) and the
    relational explode+join path produce identical labels."""
    images = spark.read.parquet(f"{images_dir}/images.parquet")
    us = spark.read.parquet(f"{images_dir}/url_status.parquet")
    a = {
        r["image_id"]: list(r["rule_hits"])
        for r in run_pipeline(spark, images, us, url_mode="udf")
        .select("image_id", "rule_hits").collect()
    }
    b = {
        r["image_id"]: list(r["rule_hits"])
        for r in run_pipeline(spark, images, us, url_mode="join")
        .select("image_id", "rule_hits").collect()
    }
    assert a == b
    assert any("P013" in h or "P025" in h for h in a.values())


def test_audit_write_and_resume(spark, images_dir, tmp_path):
    images = spark.read.parquet(f"{images_dir}/images.parquet")
    us = spark.read.parquet(f"{images_dir}/url_status.parquet")
    audit = run_pipeline(spark, images, us, buckets=8)
    out = str(tmp_path / "audit")

    # write only buckets 0-3, as if the run died mid-way
    write_audit(audit.filter(F.col("bucket") < 4), out, buckets=8)
    done = completed_buckets(spark, out)
    assert sorted(done) == [0, 1, 2, 3]

    # resume: only the remaining buckets get processed
    remaining = resume_filter(images, done, buckets=8)
    audit2 = run_pipeline(spark, remaining, us, buckets=8)
    write_audit(audit2, out, buckets=8)

    final = spark.read.parquet(out)
    assert final.count() == N
    assert final.select("image_id").distinct().count() == N
