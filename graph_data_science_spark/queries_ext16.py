"""Round-3 driver-contract queries (batch 16): multimodal column plumbing,
oracle-gated.

The container ships no codec libraries, so the binary assets are derived
DETERMINISTICALLY from the documents table (payload = the 16 md5 bytes of
the text; geometry from portable md5 hashes) — both engines see identical
bytes, and the kernels' index math replays exactly in SQL:

- ``multimodal_resize_docs``: the nearest-neighbor resize gather
  (``datapipe/multimodal.py:resize_images`` — one broadcast fancy-index
  per Arrow batch) vs DuckDB hex-pair byte extraction at the same source
  indices. Pixels compared as exact ints (round(p·255) inverts the f32
  byte/255 normalization bit-for-bit).
- ``multimodal_frame_sample_docs``: the frame-sampling explode
  (``sample_frames``) vs a DuckDB range unnest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.queries import _t

TARGET_W, TARGET_H = 4, 3


def _doc_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("long").alias("asset_id"),
        F.lit("image").alias("kind"),
        F.unhex(F.md5("text")).alias("payload"),
        (
            F.pmod(
                F.conv(F.substring(F.md5(F.concat(F.lit("w:"), F.col("text"))), 1, 15), 16, 10).cast("long"),
                F.lit(61),
            )
            + 4
        ).cast("int").alias("width"),
        (
            F.pmod(
                F.conv(F.substring(F.md5(F.concat(F.lit("h:"), F.col("text"))), 1, 15), 16, 10).cast("long"),
                F.lit(37),
            )
            + 4
        ).cast("int").alias("height"),
        F.pmod(
            F.conv(F.substring(F.md5(F.concat(F.lit("d:"), F.col("text"))), 1, 15), 16, 10).cast("long"),
            F.lit(5000),
        ).cast("int").alias("duration_ms"),
        F.lit("application/octet-stream").alias("mime"),
    )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.datapipe.multimodal import resize_images

    out = resize_images(_doc_assets(spark, sf_dir), target_w=TARGET_W, target_h=TARGET_H)
    return out.select(
        "asset_id",
        "width",
        "height",
        F.transform("pixels", lambda p: F.round(p * 255).cast("int")).alias("pixel_bytes"),
    )


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graph_data_science_spark.datapipe.multimodal import sample_frames

    assets = _doc_assets(spark, sf_dir).withColumn("kind", F.lit("video"))
    return sample_frames(assets, every_ms=700).select("asset_id", "frame_ts_ms")


_GEOM = """
  SELECT doc_id AS asset_id,
         md5(text) AS hx,
         (('0x' || substr(md5('w:' || text), 1, 15))::BIGINT % 61 + 4) AS w,
         (('0x' || substr(md5('h:' || text), 1, 15))::BIGINT % 37 + 4) AS h,
         (('0x' || substr(md5('d:' || text), 1, 15))::BIGINT % 5000) AS d
  FROM documents
"""

Q_RESIZE_SQL = f"""
WITH assets AS ({_GEOM})
SELECT asset_id,
       {TARGET_W} AS width,
       {TARGET_H} AS height,
       list_transform(range(0, {TARGET_H * TARGET_W}), i ->
         CAST(('0x' || substr(hx,
             2 * ((((i // {TARGET_W}) * h) // {TARGET_H}) * w
                  + (((i % {TARGET_W}) * w) // {TARGET_W})) % 32 + 1,
             2)) AS INT)
       ) AS pixel_bytes
FROM assets
"""

Q_FRAMES_SQL = f"""
WITH assets AS ({_GEOM})
SELECT asset_id, unnest(range(0, greatest(d, 1), 700)) AS frame_ts_ms
FROM assets
"""

QUERIES_EXT16 = {
    "multimodal_resize_docs": q_multimodal_resize,
    "multimodal_frame_sample_docs": q_multimodal_frames,
}

ORACLES_EXT16 = {
    "multimodal_resize_docs": Q_RESIZE_SQL,
    "multimodal_frame_sample_docs": Q_FRAMES_SQL,
}
