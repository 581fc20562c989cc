"""Multimodal binary plumbing + streaming ingest + watermark F5."""

import os

import pytest
from pyspark.sql import functions as F

from insurance_pdf_extractor_spark import textops


class TestWatermark:
    def test_detects_common_lines(self):
        pages = ["CONFIDENTIAL\nbody one here", "CONFIDENTIAL\nbody two"]
        assert textops.detect_watermarks(pages) == ["CONFIDENTIAL"]

    def test_single_page_never(self):
        assert textops.detect_watermarks(["CONFIDENTIAL\nbody"]) == []

    def test_short_lines_ignored(self):
        pages = ["ok\nunique a", "ok\nunique b"]
        assert textops.detect_watermarks(pages) == []

    def test_filter_case_insensitive(self):
        out = textops.filter_watermark_text("x Confidential y", ["CONFIDENTIAL"])
        assert "onfidential" not in out

    def test_end_to_end(self):
        import random
        from insurance_pdf_extractor_spark.fixtures import make_watermark_pdf
        r = textops.extract_pdf_document(make_watermark_pdf(random.Random(9)))
        assert r["doc_kind"] == "pdf_digital"
        for wm in ("CONFIDENTIAL", "DRAFT COPY", "PROPERTY OF"):
            assert wm not in r["text"]
        assert "[TABLE 1]" in r["text"]  # content preserved


class TestMultimodal:
    def test_media_features(self, spark, web_pages):
        from insurance_pdf_extractor_spark.multimodal import (
            extract_media_features)
        feats = extract_media_features(web_pages).cache()
        assert feats.count() == web_pages.count()
        kinds = {r[0] for r in feats.select("media_kind").distinct().collect()}
        assert "pdf" in kinds and "html" in kinds
        row = feats.where(F.col("media_kind") == "pdf").first()
        assert row["decoded"] is True
        assert len(row["byte_histogram"]) == 16
        assert abs(sum(row["byte_histogram"]) - 1.0) < 1e-3
        assert 0.0 < row["entropy"] <= 4.0  # ≤ log2(16)
        assert row["sha256"] and len(row["sha256"]) == 64

    def test_decode_stub_raises(self, spark, web_pages):
        from insurance_pdf_extractor_spark.multimodal import (
            extract_media_features)
        feats = extract_media_features(web_pages.limit(8), use_fake=False)
        rows = feats.where(F.col("n_bytes") > 0).collect()
        assert rows
        for r in rows:
            assert r["decoded"] is False
            assert "not present" in (r["decode_error"] or "")

    def test_fake_features_deterministic(self):
        from insurance_pdf_extractor_spark.multimodal import fake_features
        a = fake_features(b"hello world" * 10)
        b = fake_features(b"hello world" * 10)
        assert a == b
        assert fake_features(b"") == (0.0, [0.0] * 16)


def _has(mod: str) -> bool:
    import importlib.util
    return importlib.util.find_spec(mod) is not None


class TestRealEngines:
    """Guarded real-engine paths (VERDICT r3 item 3): these light up
    when the cluster image ships the libraries; in this sandbox they
    are skipped and the NotImplementedError contract is asserted
    instead (the fakes carry tests/benchmarks)."""

    @pytest.mark.skipif(not _has("PIL"), reason="PIL not installed")
    def test_real_decode_png(self):
        from insurance_pdf_extractor_spark.multimodal import decode_media
        import io
        from PIL import Image
        buf = io.BytesIO()
        Image.new("RGB", (7, 5)).save(buf, format="PNG")
        meta = decode_media(buf.getvalue(), "png")
        assert meta["width"] == 7 and meta["height"] == 5

    @pytest.mark.skipif(not _has("PIL"), reason="PIL not installed")
    def test_real_resize(self):
        from insurance_pdf_extractor_spark.multimodal import resize_media
        import io
        from PIL import Image
        buf = io.BytesIO()
        Image.new("RGB", (32, 32)).save(buf, format="PNG")
        out = resize_media(buf.getvalue(), 4, 4)
        assert len(out) == 4 * 4 * 3  # raw RGB buffer

    @pytest.mark.skipif(not (_has("pytesseract") and _has("PIL")),
                        reason="pytesseract/PIL not installed")
    def test_real_ocr(self):
        from insurance_pdf_extractor_spark.textops import real_ocr_engine
        import io
        from PIL import Image
        buf = io.BytesIO()
        Image.new("RGB", (60, 20), "white").save(buf, format="PNG")
        assert isinstance(real_ocr_engine(buf.getvalue()), str)

    @pytest.mark.skipif(_has("PIL"), reason="PIL present: real path on")
    def test_sandbox_contract_raises(self):
        from insurance_pdf_extractor_spark.multimodal import (
            decode_media, resize_media, sample_frames)
        from insurance_pdf_extractor_spark.textops import real_ocr_engine
        for fn in (lambda: decode_media(b"x", "png"),
                   lambda: resize_media(b"x", 2, 2),
                   lambda: real_ocr_engine(b"x")):
            with pytest.raises(NotImplementedError):
                fn()
        if not _has("av"):
            with pytest.raises(NotImplementedError):
                sample_frames(b"x", 2)


class TestStreamingIngest:
    def test_available_now_resumable(self, spark, fixture_rows, tmp_path):
        from insurance_pdf_extractor_spark.schemas import WEB_PAGES
        from insurance_pdf_extractor_spark.streaming import (
            ingest_available_now)
        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        df = spark.createDataFrame(fixture_rows[:20], schema=WEB_PAGES)
        df.write.mode("append").parquet(landing)

        n1 = ingest_available_now(spark, landing, out)
        assert n1 >= 1
        docs = spark.read.parquet(os.path.join(out, "docs"))
        assert docs.count() == 20

        # new files land → only the delta is processed
        df2 = spark.createDataFrame(fixture_rows[20:30], schema=WEB_PAGES)
        df2.write.mode("append").parquet(landing)
        ingest_available_now(spark, landing, out)
        docs = spark.read.parquet(os.path.join(out, "docs"))
        assert docs.count() == 30
        assert docs.select("url").distinct().count() == 30

        # re-run with nothing new → zero growth
        ingest_available_now(spark, landing, out)
        assert spark.read.parquet(os.path.join(out, "docs")).count() == 30


class TestMediaDerivatives:
    """Resize + frame-sample plumbing (decode itself stubbed per brief):
    schema, batch shape, determinism, and the injection-point error
    path."""

    def test_schema_and_determinism(self, spark, web_pages):
        from insurance_pdf_extractor_spark.multimodal import (
            extract_media_derivatives)
        out = extract_media_derivatives(web_pages.limit(20),
                                        thumb_w=8, thumb_h=8,
                                        frame_stride=2)
        assert dict(out.dtypes)["frame_shas"] == "array<string>"
        rows1 = {r["url"]: r for r in out.collect()}
        rows2 = {r["url"]: r for r in out.collect()}
        assert len(rows1) == 20
        for url, r in rows1.items():
            assert r["thumb_w"] == 8 and r["thumb_h"] == 8
            assert rows2[url]["thumb_sha256"] == r["thumb_sha256"]
            assert rows2[url]["frame_shas"] == r["frame_shas"]
            if r["decoded"] and r["thumb_sha256"]:
                assert len(r["thumb_sha256"]) == 64

    def test_fake_thumbnail_and_frames_shapes(self):
        from insurance_pdf_extractor_spark.multimodal import (
            fake_frames, fake_thumbnail)
        data = bytes(range(256)) * 64  # 16 KiB
        assert len(fake_thumbnail(data, 16, 16)) == 256
        assert fake_thumbnail(b"", 16, 16) == b""
        frames = fake_frames(data, stride=2, frame_bytes=4096)
        assert len(frames) == 2  # 4 frames, every 2nd
        assert fake_frames(b"", 2) == []

    def test_real_engine_injection_error_path(self, spark, web_pages):
        from insurance_pdf_extractor_spark.multimodal import (
            extract_media_derivatives)
        out = extract_media_derivatives(web_pages.limit(4),
                                        use_fake=False).collect()
        assert all(not r["decoded"] for r in out)
        assert all(r["decode_error"] for r in out)
