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


def test_kernel_selection_both_branches(monkeypatch):
    """Auto-selection: PIL kernel when importable, fake otherwise —
    the fake must be the FALLBACK, never the override."""
    import logicash_etl_spark.operators.multimodal as mm

    monkeypatch.setattr(mm, "_pil_available", lambda: False)
    assert mm._select_kernel() is mm._fake_image_decode
    monkeypatch.setattr(mm, "_pil_available", lambda: True)
    assert mm._select_kernel() is mm._pil_image_decode


def test_pil_kernel_with_synthetic_pil(monkeypatch):
    """Drive the real-codec kernel through a synthetic PIL module: the
    kernel's contract (open bytes -> width/height/format, lowercase
    format, context-managed) holds without the real library."""
    import sys
    import types

    import logicash_etl_spark.operators.multimodal as mm

    class _Img:
        def __init__(self, data):
            self.width, self.height = len(data) % 100 + 1, len(data) % 50 + 1
            self.format = "PNG"
        def __enter__(self):
            return self
        def __exit__(self, *a):
            return False

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = lambda buf: _Img(buf.read())
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    w, h, fmt = mm._pil_image_decode(b"0123456789abc")
    assert (w, h, fmt) == (14, 14, "png")
    assert mm._pil_available()
    assert mm._select_kernel() is mm._pil_image_decode


def test_decode_with_injected_kernel(spark, sf_smoke):
    """End-to-end plumbing with a CUSTOM kernel shipped to the workers:
    proves the mapInPandas path is codec-agnostic (same path a real
    PIL kernel takes on a cluster with codecs installed)."""
    def kernel(data: bytes):
        return len(data) % 7 + 1, len(data) % 11 + 1, "custom"

    m = _media_df(spark, sf_smoke)
    rows = decode_image_meta(m, id_col="doc_id", kernel=kernel).collect()
    assert len(rows) == 50
    for r in rows:
        assert r.format == "custom"
        assert r.width == r.media_bytes % 7 + 1
        assert r.height == r.media_bytes % 11 + 1


def test_phash_brightness_invariance_and_determinism(spark):
    """dHash contract: a global brightness shift flips no gradient, so
    the hash is identical; byte-identical media always hash equal."""
    from pyspark.sql import functions as F

    from logicash_etl_spark.operators.multimodal import (
        _dhash64,
        _fake_pixel_grid,
        pack_media,
        phash_image,
    )

    grid = _fake_pixel_grid(b"some-media-bytes")
    assert _dhash64(grid) == _dhash64([min(p + 10, 255 + 10) for p in grid])

    rows = [(1, b"alpha"), (2, b"beta"), (3, b"alpha")]
    df = pack_media(
        spark.createDataFrame(rows, "id long, blob binary"), "blob", "image/png"
    )
    got = {
        r.id: r.phash
        for r in phash_image(df, pixel_kernel=_fake_pixel_grid).collect()
    }
    assert got[1] == got[3] != got[2]


def test_audio_chunk_plan_boundaries(spark):
    """Chunk arithmetic edges: exact-multiple clips have a full tail
    chunk, one-sample clips emit a single 1-sample chunk, zero-byte
    clips emit nothing, and per-clip sample totals are conserved."""
    from pyspark.sql import functions as F

    from logicash_etl_spark.operators.multimodal import audio_chunk_plan, pack_media

    rows = [
        (1, b"\x00" * 640),   # exactly 2 chunks of 160 samples
        (2, b"\x00" * 2),     # 1 sample -> one 1-sample chunk
        (3, b""),             # empty -> no chunks
        (4, b"\x00" * 321),   # 160 samples (floor) + half byte dropped
    ]
    df = spark.createDataFrame(rows, "id long, blob binary")
    clips = pack_media(df, "blob", "audio/pcm")
    chunks = audio_chunk_plan(
        clips, id_col="id", sample_rate=16_000, chunk_seconds=0.01
    ).collect()
    by_id = {}
    for r in chunks:
        by_id.setdefault(r.id, []).append((r.chunk_idx, r.start_sample, r.n_samples))
    assert by_id[1] == [(0, 0, 160), (1, 160, 160)]
    assert by_id[2] == [(0, 0, 1)]
    assert 3 not in by_id
    assert by_id[4] == [(0, 0, 160)]
