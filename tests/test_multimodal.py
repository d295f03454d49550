"""Multimodal plumbing tests: binary struct columns, JVM-side stats,
Arrow-batched decode (stub kernel), frame-sample explode shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from logicash_etl_spark.operators.multimodal import (
    decode_image_meta,
    frame_sample_plan,
    media_stats,
    pack_media,
)
from logicash_etl_spark.sources.readers import read_table


def _media_df(spark, sf_smoke):
    """Synthesize binary media from document text (deterministic)."""
    docs = read_table(spark, sf_smoke, "documents").limit(50)
    raw = docs.select("doc_id", F.encode("text", "utf-8").alias("blob"))
    return pack_media(raw, "blob", "image/fake")


def test_pack_and_stats(spark, sf_smoke):
    m = media_stats(_media_df(spark, sf_smoke))
    rows = m.select("doc_id", "media_bytes", "media_sha256").collect()
    assert all(r.media_bytes > 0 for r in rows)
    assert all(len(r.media_sha256) == 64 for r in rows)
    # struct schema contract
    f = dict(m.dtypes)["media"]
    assert "data:binary" in f.replace(" ", "") and "meta:map<string,string>" in f.replace(" ", "")


def test_decode_image_meta_batched(spark, sf_smoke):
    m = _media_df(spark, sf_smoke)
    meta = decode_image_meta(m, id_col="doc_id")
    rows = meta.collect()
    assert len(rows) == 50
    for r in rows:
        assert 16 <= r.width < 80 and 16 <= r.height < 80
        assert r.format in ("png", "jpeg")
        assert r.media_bytes > 0
    # deterministic: re-run yields identical metadata
    again = {r.id: (r.width, r.height, r.format) for r in decode_image_meta(m, "doc_id").collect()}
    first = {r.id: (r.width, r.height, r.format) for r in rows}
    assert first == again


def test_frame_sample_plan(spark, sf_smoke):
    m = _media_df(spark, sf_smoke)
    plan = frame_sample_plan(m, id_col="doc_id", every_n=10)
    agg = plan.groupBy("id").agg(F.count("*").alias("n"), F.max("frame_idx").alias("mx"))
    for r in agg.collect():
        assert r.n >= 1
        assert r.mx % 10 == 0
