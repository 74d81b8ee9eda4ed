"""Seeded corpus sampling (datapipe/sampling.py) + PII redaction
(datapipe/textstats.py:pii_redact).

Sampling invariants: rerun determinism (seeded md5 draws, no rand()),
partition-layout independence (the same keep set after repartition),
target-mix proportions for the stratified sampler. PII: hand-built
strings with known spans/counts, including the ordering guarantee
(emails redacted before their digits could re-match as numbers).
"""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_data_science_spark.datapipe.sampling import (  # noqa: E402
    stratified_sample_to_target,
    weighted_sample,
)
from graph_data_science_spark.datapipe.textstats import pii_redact  # noqa: E402


def _corpus(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
        (F.col("id") % 500 + 50).alias("n_chars"),
    )


def test_weighted_sample_deterministic_and_layout_independent(spark):
    d = _corpus(spark)
    rate = F.when(F.col("n_chars") >= 300, 0.8).otherwise(0.2)
    kept1 = sorted(r[0] for r in weighted_sample(d, rate, seed="s1").select("doc_id").collect())
    kept2 = sorted(r[0] for r in weighted_sample(d, rate, seed="s1").select("doc_id").collect())
    assert kept1 == kept2  # rerun identical
    kept3 = sorted(
        r[0]
        for r in weighted_sample(d.repartition(7, "source"), rate, seed="s1")
        .select("doc_id")
        .collect()
    )
    assert kept1 == kept3  # draw is a function of the row, not the layout
    # different seed → different sample
    kept4 = sorted(r[0] for r in weighted_sample(d, rate, seed="s2").select("doc_id").collect())
    assert kept1 != kept4
    # high-rate rows kept much more often than low-rate rows
    d1 = dict(
        weighted_sample(d, rate, seed="s1")
        .groupBy((F.col("n_chars") >= 300).alias("hi"))
        .count()
        .collect()
    )
    assert d1[True] > d1[False]


def test_stratified_sample_hits_target_mix(spark):
    d = _corpus(spark, n=4000)  # 1000 docs per source
    out = stratified_sample_to_target(
        d, "source", {"src0": 0.5, "src1": 0.3, "src2": 0.2}, seed="mix"
    )
    counts = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert set(counts) == {"src0", "src1", "src2"}  # src3 dropped
    total = sum(counts.values())
    # equal input shares → src0 keeps everything (rate 1.0), others scaled
    assert counts["src0"] == 1000
    assert abs(counts["src1"] / total - 0.3) < 0.05
    assert abs(counts["src2"] / total - 0.2) < 0.05


def test_pii_redact_counts_and_spans(spark):
    rows = [
        (0, "mail me at jo.doe+x@site.org today"),
        (1, "call 555-010-1234 or 555.010.9876"),
        (2, "host 192.168.0.1 and 10.0.0.7"),
        (3, "combo a@b.co 111-222-3333 1.2.3.4"),
        (4, "clean text with numbers 12345 and dots... end"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_redact(d).collect()}
    assert out[0]["n_email"] == 1 and out[0]["redacted"] == "mail me at [PII] today"
    assert out[1]["n_phone"] == 2 and out[1]["redacted"] == "call [PII] or [PII]"
    assert out[2]["n_ipv4"] == 2 and out[2]["redacted"] == "host [PII] and [PII]"
    assert (out[3]["n_email"], out[3]["n_phone"], out[3]["n_ipv4"]) == (1, 1, 1)
    assert out[3]["redacted"] == "combo [PII] [PII] [PII]"
    assert (out[4]["n_email"], out[4]["n_phone"], out[4]["n_ipv4"]) == (0, 0, 0)
    assert out[4]["redacted"] == rows[4][1]
