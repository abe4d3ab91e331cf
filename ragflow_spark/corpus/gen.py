"""Build the `pages` input table (BASELINE.json input_hint schema:
url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)
deterministically from the driver testdata ``documents`` table.

Every derivation is a *relational* expression over (doc_id, text, lang), so
the DuckDB oracle can reproduce both the construction and the expected
extraction output in ANSI SQL — which is what makes the end-to-end
extraction chain value-checkable (CORRECTNESS gate) without a second Python
implementation leaking into the oracle.

Document families (FIXTURES.md §2), keyed by ``doc_id % 5`` — each family
exercises a different readability/html-text rule set, and each family's
expected extracted text is a closed-form string function of (title, paras):

  0 clean      <article> of <p>s                  -> paras joined "\n\n"
  1 boiler     nav/sidebar/footer link-farm divs   -> boiler stripped,
               around <div class="article-content">   paras joined "\n\n"
  2 divs+br    one <div>, paragraphs split by      -> div->p transform,
               <br><br>                               paras joined "\n"
  3 table      1990s <table><tr><td> layout        -> paras joined "\n"
               (only when np>=3: with fewer rows the best candidate is a
               single <tr>, which would truncate the page — family falls
               back to 0)
  4 sections   <p>s prefixed "Section i "          -> paras joined "\n\n"
               (drives bullets_category group 3 / book hierarchical merge)

Titles: "文档 {doc_id}" for zh docs (exercises gb2312/gbk + utf-16 codec
paths), else "Document {doc_id}".

Encodings: zh & doc_id%2==0 -> gbk; doc_id%20==3 -> utf-16 (BOM); else
utf-8. latin-1 is deliberately absent: the reference find_codec cascade
(rag/nlp/__init__.py:53-71) mis-detects even-length latin-1 blobs as
gbk/utf_16 before reaching latin_1, so no latin-1 page can round-trip —
we mirror the cascade and therefore only feed it codecs it resolves.

Host skew (FIXTURES.md §1): doc_id % 5 == 0 collapses onto host0
(~20% of rows on one host), exercising the explicit salting path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")

# Families whose paragraphs render with a blank line between them.
DOUBLE_NEWLINE_FAMILIES = (0, 1, 4)

_BOILER_NAV = (
    '<div class="sidebar"><a href="/1">home page</a> <a href="/2">about us'
    '</a> <a href="/3">contact form</a> <a href="/4">site map</a></div>'
)
_BOILER_FOOTER = (
    '<div class="footer"><a href="/terms">terms of use</a> '
    '<a href="/privacy">privacy policy</a></div>'
)


def _with_derived(docs: DataFrame) -> DataFrame:
    """doc_id/text/lang -> url, title, k, np, family, paras."""
    words = F.split(F.col("text"), " ")
    k = (F.lit(8) + F.col("doc_id") % 13).cast("int")
    np = F.ceil(F.size(words) / k.cast("double")).cast("int")
    fam_raw = (F.col("doc_id") % 5).cast("int")
    host = F.when(F.col("doc_id") % 5 == 0, F.lit(0)).otherwise(
        F.col("doc_id") % 50
    )
    url = F.concat(
        F.lit("https://host"), host.cast("string"),
        F.lit(".example.com/doc/"), F.col("doc_id").cast("string"),
    )
    title = F.when(
        F.col("lang") == "zh",
        F.concat(F.lit("文档 "), F.col("doc_id").cast("string")),
    ).otherwise(F.concat(F.lit("Document "), F.col("doc_id").cast("string")))
    # i-th paragraph: words[i*k+1 .. i*k+k] joined by spaces; family 4
    # prefixes "Section {i+1} " (bullet group 3 heading)
    out = (
        docs.withColumn("k", k)
        .withColumn("np", np)
        .withColumn("fam_raw", fam_raw)
        .withColumn("url", url)
        .withColumn("title", title)
    )
    # raw paragraphs (no Section prefix yet) to decide the table guard
    out = out.withColumn(
        "paras0",
        F.expr(
            "transform(sequence(0, np - 1), i -> "
            "array_join(slice(split(text, ' '), i * k + 1, k), ' '))"
        ),
    )
    # A <table> page extracts whole only if readability's best candidate is
    # the table, not a single row: per-row score s_i = 2 + min(len/100, 3)
    # when len >= 25 (1 base + 1 comma-split + length bonus; no commas in
    # the corpus words, link density 0, tr/table tag base 0), table score =
    # sum(s_i)/2. Family 3 is assigned only when the table STRICTLY beats
    # every row (ties resolve to the first-inserted candidate, a row).
    out = out.withColumn(
        "tbl_wins",
        F.expr(
            "aggregate(transform(paras0, p -> CASE WHEN length(p) >= 25 "
            "THEN 2.0D + least(cast(length(p) as double) / 100.0D, 3.0D) "
            "ELSE 0.0D END), 0.0D, (a, x) -> a + x) / 2.0D > "
            "array_max(transform(paras0, p -> CASE WHEN length(p) >= 25 "
            "THEN 2.0D + least(cast(length(p) as double) / 100.0D, 3.0D) "
            "ELSE 0.0D END))"
        ),
    )
    out = out.withColumn(
        "family",
        F.expr("CASE WHEN fam_raw = 3 AND NOT tbl_wins THEN 0 "
               "ELSE fam_raw END").cast("int"),
    )
    paras = F.expr(
        "CASE WHEN family = 4 THEN transform(paras0, (p, i) -> "
        "concat('Section ', i + 1, ' ', p)) ELSE paras0 END"
    )
    return out.withColumn("paras", paras)


def _html_column() -> F.Column:
    """Assemble the html document string per family."""
    p_body = F.expr(
        "array_join(transform(paras, p -> concat('<p>', p, '</p>')), '')"
    )
    tr_body = F.expr(
        "array_join(transform(paras, p -> "
        "concat('<tr><td>', p, '</td></tr>')), '')"
    )
    br_body = F.expr("array_join(paras, '<br><br>')")
    body = (
        F.when(F.col("family") == 1,
               F.concat(F.lit(_BOILER_NAV),
                        F.lit('<div class="article-content">'), p_body,
                        F.lit("</div>"), F.lit(_BOILER_FOOTER)))
        .when(F.col("family") == 2,
              F.concat(F.lit("<div>"), br_body, F.lit("</div>")))
        .when(F.col("family") == 3,
              F.concat(F.lit("<table>"), tr_body, F.lit("</table>")))
        .otherwise(F.concat(F.lit("<article>"), p_body, F.lit("</article>")))
    )
    return F.concat(
        F.lit("<html><head><title>"), F.col("title"),
        F.lit("</title></head><body>"), body, F.lit("</body></html>"),
    )


def _encode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """html_str -> bytes in the per-row charset (gbk unavailable to Spark's
    ``encode()``, hence this vectorized pandas step)."""
    for pdf in it:
        def enc(row):
            return row["html_str"].encode(row["charset"])

        pdf["html"] = pdf.apply(enc, axis=1)
        yield pdf[["url", "warc_ts", "html", "text", "lang"]]


def build_pages(spark, sf_dir: str, replicate: int = 1,
                partitions: int | None = None) -> DataFrame:
    """documents.parquet -> pages DataFrame (input_hint schema).

    ``replicate`` > 1 multiplies rows for bench runs (doc_id offset by
    10**7 per copy so urls stay unique); correctness runs use 1.

    ``partitions``: explicit fan-out. The testdata parquet is a single
    small file -> one input split -> one task; a real CC-scale Iceberg
    table arrives pre-split, so for local runs we repartition to keep all
    cores busy (defaults to spark.default.parallelism when None).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n_parts = partitions or spark.sparkContext.defaultParallelism
    docs = docs.repartition(n_parts)
    if replicate > 1:
        reps = spark.range(replicate).select(F.col("id").alias("rep"))
        docs = (
            docs.crossJoin(F.broadcast(reps))
            .withColumn("doc_id",
                        F.col("doc_id") + F.col("rep") * F.lit(10_000_000))
            .drop("rep")
        )
    d = _with_derived(docs)
    d = d.withColumn("html_str", _html_column())
    charset = (
        F.when((F.col("lang") == "zh") & (F.col("doc_id") % 2 == 0),
               F.lit("gbk"))
        .when(F.col("doc_id") % 20 == 3, F.lit("utf-16"))
        .otherwise(F.lit("utf-8"))
    )
    warc_ts = F.to_timestamp(F.lit("2025-01-01 00:00:00")) + F.make_dt_interval(
        secs=(F.col("doc_id") * 37 % 2_592_000).cast("double")
    )
    # the CC-style pre-extracted `text` column: a deliberately *naive*
    # rendering (title + raw words + boiler text) the pipeline must not use
    naive_text = F.concat(F.col("title"), F.lit(" "), F.col("text"))
    d = (
        d.withColumn("charset", charset)
        .withColumn("warc_ts", warc_ts)
        .withColumn("text", naive_text)
        .select("url", "warc_ts", "html_str", "charset", "text", "lang")
    )
    return d.mapInPandas(
        _encode_batches,
        schema=PAGES_SCHEMA,
    )


def expected_extracted(spark, sf_dir: str) -> DataFrame:
    """Closed-form expected (url, title, extracted_text) — the golden the
    pipeline must reproduce byte-identically (Spark-side twin of the
    DuckDB oracle SQL in __spark_entry__.oracle_sql)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    d = _with_derived(docs)
    extracted = F.expr(
        "concat(title, '\\n', array_join(paras, "
        "CASE WHEN family IN (0, 1, 4) THEN '\\n\\n' ELSE '\\n' END))"
    )
    return d.select(
        "url", "title", extracted.alias("extracted_text")
    )


# --------------------------------------------------------------------------
# PDF corpora (paper-style documents; one builder per layout family)
# --------------------------------------------------------------------------

def _pdf_docs_frame(spark, sf_dir: str, path_seg: str, replicate: int,
                    partitions: int | None) -> DataFrame:
    """Shared derivation for every PDF family: documents.parquet ->
    (url at /{path_seg}/, warc_ts, title 'Paper {id}', doc_id, paras0,
    text, lang)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    n_parts = partitions or spark.sparkContext.defaultParallelism
    docs = docs.repartition(n_parts)
    if replicate > 1:
        reps = spark.range(replicate).select(F.col("id").alias("rep"))
        docs = (
            docs.crossJoin(F.broadcast(reps))
            .withColumn("doc_id",
                        F.col("doc_id") + F.col("rep") * F.lit(10_000_000))
            .drop("rep")
        )
    d = _with_derived(docs)
    host = F.when(F.col("doc_id") % 5 == 0, F.lit(0)).otherwise(
        F.col("doc_id") % 50)
    return (
        d.withColumn("title",
                     F.concat(F.lit("Paper "), F.col("doc_id")))
        .withColumn("url", F.concat(
            F.lit("https://host"), host.cast("string"),
            F.lit(f".example.com/{path_seg}/"),
            F.col("doc_id").cast("string")))
        .withColumn("warc_ts",
                    F.to_timestamp(F.lit("2025-01-01 00:00:00"))
                    + F.make_dt_interval(
                        secs=(F.col("doc_id") * 37 % 2_592_000)
                        .cast("double")))
        .select("url", "warc_ts", "title", "doc_id", "paras0", "text",
                "lang")
    )


def _pdf_encoder(build):
    """mapInPandas encoder over (doc_id, title, paras0): ``build(did,
    title, sections) -> bytes`` per document."""
    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            for did, title, paras in zip(pdf["doc_id"], pdf["title"],
                                         pdf["paras0"]):
                sections = [(f"{i + 1} Part {i + 1}", p)
                            for i, p in enumerate(paras)]
                blobs.append(build(int(did), title, sections))
            yield pd.DataFrame({
                "url": pdf["url"], "warc_ts": pdf["warc_ts"],
                "html": blobs, "text": pdf["text"], "lang": pdf["lang"],
            })
    return encode


def _build_pdf_family(spark, sf_dir: str, path_seg: str, build,
                      replicate: int, partitions: int | None) -> DataFrame:
    d = _pdf_docs_frame(spark, sf_dir, path_seg, replicate, partitions)
    return d.mapInPandas(_pdf_encoder(build), schema=PAGES_SCHEMA)


def build_pdf_pages(spark, sf_dir: str, replicate: int = 1,
                    partitions: int | None = None) -> DataFrame:
    """documents.parquet -> pages with PDF byte payloads (input_hint
    schema; `html` column carries the blob regardless of media type —
    dispatch is by magic bytes, mirroring naive.py's filename dispatch
    re-keyed to content sniffing per SURVEY.md §2.1)."""
    def build(did, title, sections):
        from ragflow_spark.extractlib.pdfgen import build_pdf
        return build_pdf(title, sections)
    return _build_pdf_family(spark, sf_dir, "pdf", build, replicate,
                             partitions)


def build_pdf2_pages(spark, sf_dir: str, replicate: int = 1,
                     partitions: int | None = None) -> DataFrame:
    """Two-column paper corpus (sections identical to build_pdf_pages;
    layout and stream order differ — the extractor must reconstruct
    reading order via the column sort)."""
    def build(did, title, sections):
        from ragflow_spark.extractlib.pdfgen import build_pdf_two_col
        return build_pdf_two_col(title, sections)
    return _build_pdf_family(spark, sf_dir, "pdf2", build, replicate,
                             partitions)


def build_pdf_frag_pages(spark, sf_dir: str, replicate: int = 1,
                         partitions: int | None = None) -> DataFrame:
    """Fragmented-line corpus: body lines longer than 4 words render as
    two abutting rects on one baseline (_text_merge must stitch them);
    extraction output is byte-identical to build_pdf_pages."""
    def build(did, title, sections):
        from ragflow_spark.extractlib.pdfgen import build_pdf
        return build_pdf(title, sections, fragment=True)
    return _build_pdf_family(spark, sf_dir, "pdff", build, replicate,
                             partitions)


def build_pdf_hidden_pages(spark, sf_dir: str, replicate: int = 1,
                           partitions: int | None = None) -> DataFrame:
    """Invisible-text corpus: each section carries a white-on-white
    DeviceGray line (_has_color must drop it); extraction output is
    byte-identical to build_pdf_pages."""
    def build(did, title, sections):
        from ragflow_spark.extractlib.pdfgen import build_pdf
        return build_pdf(title, sections, hidden=True)
    return _build_pdf_family(spark, sf_dir, "pdfh", build, replicate,
                             partitions)


def build_pdf_char_pages(spark, sf_dir: str, replicate: int = 1,
                         partitions: int | None = None) -> DataFrame:
    """Char-soup corpus: every glyph is its own show op at its own
    advance (the granularity a pdfplumber char dump / OCR char stream
    has); the __ocr char->line merge must reassemble lines, after which
    extraction output is byte-identical to build_pdf_pages."""
    def build(did, title, sections):
        from ragflow_spark.extractlib.pdfgen import build_pdf
        return build_pdf(title, sections, char_level=True)
    return _build_pdf_family(spark, sf_dir, "pdfc", build, replicate,
                             partitions)


def build_pdf_hf_pages(spark, sf_dir: str, replicate: int = 1,
                       partitions: int | None = None) -> DataFrame:
    """Running-header/footer corpus: every page carries a duplicated
    running head + per-page folio in the edge bands, and one copy of
    the head leaks into the body flow (layout_keep_rules must drop all
    of them); extraction output is byte-identical to build_pdf_pages."""
    def build(did, title, sections):
        from ragflow_spark.extractlib.pdfgen import build_pdf
        return build_pdf(title, sections, header_footer=True)
    return _build_pdf_family(spark, sf_dir, "pdfhf", build, replicate,
                             partitions)


def pdft_table_rows(did: int) -> list[list[str]]:
    """The data grid of the table corpus: 3 + did%4 rows of three
    numeric cells, each a closed-form function of (doc_id, row) — the
    DuckDB oracle recomputes desc-row / HTML renderings from these."""
    return [[str((did * 7 + i) % 1000), str((did * 13 + i * i) % 1000),
             str((did + i * 31) % 100)]
            for i in range(1, 4 + did % 4)]


def build_docx_pages(spark, sf_dir: str, replicate: int = 1,
                     partitions: int | None = None) -> DataFrame:
    """DOCX corpus: title (Heading1), per-paragraph heading (Heading2) +
    body (Normal), then one data table — 3 columns for even doc_ids
    (exercises the <=3-column single-chunk collapse) and 4 columns with
    a Ca-typed code column for odd ones (separate line per row)."""
    def build(did, title, sections):
        from ragflow_spark.extractlib.officegen import build_docx
        paras = [(title, "Heading1")]
        for head, body in sections:
            paras.append((head, "Heading2"))
            paras.append((body, None))
        rows = pdft_table_rows(did)
        if did % 2 == 1:
            headers = ["metric", "value", "delta", "code"]
            rows = [r + [f"A{i + 1}"] for i, r in enumerate(rows)]
        else:
            headers = ["metric", "value", "delta"]
        return build_docx(paras, [[headers] + rows])
    return _build_pdf_family(spark, sf_dir, "docx", build, replicate,
                             partitions)


def build_xlsx_pages(spark, sf_dir: str, replicate: int = 1,
                     partitions: int | None = None) -> DataFrame:
    """XLSX corpus: one sheet of numeric metric rows — named 'metrics'
    for even doc_ids (exercises the ' ——{sheet}' suffix) and default
    'Sheet1' for odd ones."""
    def build(did, title, sections):
        from ragflow_spark.extractlib.officegen import build_xlsx
        rows = [[int(c) for c in r] for r in pdft_table_rows(did)]
        name = "metrics" if did % 2 == 0 else "Sheet1"
        return build_xlsx(
            [(name, [["metric", "value", "delta"]] + rows)])
    return _build_pdf_family(spark, sf_dir, "xlsx", build, replicate,
                             partitions)


def build_pptx_pages(spark, sf_dir: str, replicate: int = 1,
                     partitions: int | None = None) -> DataFrame:
    """PPTX corpus: one slide per paragraph (title shape + bulleted
    body shape) plus a final table slide — the presentation template
    chunks one chunk per slide."""
    def build(did, title, sections):
        from ragflow_spark.extractlib.officegen import build_pptx
        slides = []
        for head, body in sections:
            slides.append([
                {"kind": "text", "top": 0, "left": 0,
                 "paras": [(head, False, 0)]},
                {"kind": "text", "top": 1000000, "left": 0,
                 "paras": [(body, True, 0)]},
            ])
        rows = [["metric", "value", "delta"]] + pdft_table_rows(did)
        slides.append([
            {"kind": "text", "top": 0, "left": 0,
             "paras": [("Data", False, 0)]},
            {"kind": "table", "top": 1000000, "left": 0, "rows": rows},
        ])
        return build_pptx(slides)
    return _build_pdf_family(spark, sf_dir, "pptx", build, replicate,
                             partitions)


def build_doc_pages(spark, sf_dir: str, replicate: int = 1,
                    partitions: int | None = None) -> DataFrame:
    """Legacy ``.doc`` corpus (from-scratch CFB + MS-DOC writer): title
    line, then per-paragraph heading + body lines.  Piece grouping
    varies per document and pieces are laid into the WordDocument
    stream in reverse order, so only a piece-table-following reader
    reproduces the text; zh bodies force UTF-16 pieces, ascii bodies
    compressed ones."""
    def build(did, title, sections):
        from ragflow_spark.extractlib.docparse import build_doc
        lines = [title]
        for head, body in sections:
            lines.append(head)
            lines.append(body)
        return build_doc(lines, piece_group=1 + did % 3)
    return _build_pdf_family(spark, sf_dir, "docleg", build, replicate,
                             partitions)


def build_ppt_pages(spark, sf_dir: str, replicate: int = 1,
                    partitions: int | None = None) -> DataFrame:
    """Legacy ``.ppt`` corpus: one slide per paragraph — a heading text
    block + a body text block (TextBytesAtom for ascii, TextCharsAtom
    for zh — both atom decoders exercised)."""
    def build(did, title, sections):
        from ragflow_spark.extractlib.pptparse import build_ppt
        return build_ppt([[head, body] for head, body in sections])
    return _build_pdf_family(spark, sf_dir, "pptleg", build, replicate,
                             partitions)


def build_scrap_pages(spark, sf_dir: str, replicate: int = 1,
                      partitions: int | None = None) -> DataFrame:
    """Scrap-filter corpus (``__filterout_scraps``): wide bullet lines
    on a one-page fixed grid plus trailing narrow numeric-junk lines;
    the filter's DFS grouping, keep decision and tag strings are all
    closed-form functions of the paragraph list."""
    def build(did, title, sections):
        from ragflow_spark.extractlib.pdfgen import build_pdf_scrap
        return build_pdf_scrap(sections, did)
    return _build_pdf_family(spark, sf_dir, "pdfs", build, replicate,
                             partitions)


def build_pdft_pages(spark, sf_dir: str, replicate: int = 1,
                     partitions: int | None = None) -> DataFrame:
    """Table-bearing corpus: body sections as build_pdf_pages, then a
    captioned data table (split across two pages when doc_id % 3 == 1 —
    exercises the cross-page continuation merge) and a captioned figure
    block. _extract_table_figure must pop them out of the text flow."""
    def build(did, title, sections):
        from ragflow_spark.extractlib.pdfgen import build_pdf_table
        return build_pdf_table(
            title, sections, ["metric", "value", "delta"],
            pdft_table_rows(did), f"Table 1 Paper {did}",
            f"[chart {did}]", f"Figure 1 Paper {did}",
            split=(did % 3 == 1))
    return _build_pdf_family(spark, sf_dir, "pdft", build, replicate,
                             partitions)
