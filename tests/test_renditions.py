"""Round-trip tests for the binary rendition loop: render → one-file-
per-row sink → binaryFile scan → extract → text equality. EML is fully
real (stdlib MIME); docx/pdf exercise the deterministic stub containers
with the real wrap logic and the real Spark plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from synthetic_data_pipeline_spark.sources.renditions import (
    add_renditions,
    extract_docx_udf,
    extract_eml_udf,
    extract_pdf_udf,
    read_binary_dir,
    wrap_lines,
    write_files_per_row,
)

DOCS = [
    (1, "email", "subject: hello | SSN 123-45-6789 inside this email body"),
    (2, "pdf", "a rather long line " * 20),
    (3, "document", "plain document body with a few words"),
    (4, "email_with_attachment", "body with attachment expectations"),
    (5, "chat", "chat text needs no rendition"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, format string, text string")


def test_wrap_lines_width():
    lines = wrap_lines("word " * 50, 20)
    assert all(len(ln) <= 20 for ln in lines)
    assert " ".join(" ".join(lines).split()) == ("word " * 50).strip()


def test_rendition_dispatch_and_roundtrip(spark, docs):
    r = add_renditions(docs).cache()
    rows = {x.doc_id: x for x in r.collect()}
    assert rows[1].eml is not None and rows[1].docx is None
    assert rows[2].pdf is not None and rows[2].docx is not None
    assert rows[3].docx is not None and rows[3].pdf is None
    assert rows[5].docx is None and rows[5].pdf is None and rows[5].eml is None

    back = (
        r.filter(F.col("eml").isNotNull())
        .select("doc_id", "text", extract_eml_udf("eml").alias("out"))
        .collect()
    )
    for x in back:
        assert x.out.strip() == x.text.strip()

    back_docx = (
        r.filter(F.col("docx").isNotNull())
        .select("text", extract_docx_udf("docx").alias("out"))
        .collect()
    )
    for x in back_docx:
        assert x.out == x.text

    # pdf round-trip modulo line-wrapping
    back_pdf = (
        r.filter(F.col("pdf").isNotNull())
        .select("text", extract_pdf_udf("pdf").alias("out"))
        .collect()
    )
    for x in back_pdf:
        assert " ".join(x.out.split()) == " ".join(x.text.split())


def test_file_sink_and_binary_scan(spark, docs, tmp_path):
    out = str(tmp_path / "files")
    named = add_renditions(docs).filter(F.col("eml").isNotNull()).select(
        F.format_string("doc_%05d.eml", F.col("doc_id")).alias("filename"),
        F.col("eml").alias("data"),
    )
    write_files_per_row(named, out)
    scanned = read_binary_dir(spark, out, "*.eml")
    assert scanned.count() == named.count()
    texts = scanned.select(extract_eml_udf("content").alias("t")).collect()
    assert any("SSN 123-45-6789" in x.t for x in texts)


def test_xlsx_roundtrip_stub_or_real():
    """render_xlsx_bytes → extract_xlsx_rows round trip — exercises
    whichever path the container has (stub without openpyxl, real
    workbook bytes with it)."""
    from synthetic_data_pipeline_spark.sources.renditions import (
        extract_xlsx_rows,
        render_xlsx_bytes,
    )

    rows = [("doc_id", "sit_ids"), ("7", "SIT_SSN;SIT_CCN"), ("9", "")]
    data = render_xlsx_bytes(rows)
    assert extract_xlsx_rows(data) == [list(r) for r in rows]


def test_xlsx_real_openpyxl_path():
    """Real workbook bytes (PK zip container) survive the round trip.
    Skip-marked: the driver container has no openpyxl; this runs
    wherever the real library exists."""
    import pytest

    pytest.importorskip("openpyxl")
    from synthetic_data_pipeline_spark.sources.renditions import (
        extract_xlsx_rows,
        render_xlsx_bytes,
    )

    data = render_xlsx_bytes([("a", "b"), ("1", "2")])
    assert data[:2] == b"PK", "expected a real zip-container workbook"
    assert extract_xlsx_rows(data) == [["a", "b"], ["1", "2"]]
