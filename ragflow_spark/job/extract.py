"""Vectorized extraction operators: pages -> extracted / chunks.

The whole §2 operator chain (codec -> DOM -> readability -> html-text ->
template merge) runs *inside* Arrow-batched ``mapInPandas`` UDFs — one
Python invocation per batch of rows, no per-row Python UDFs, no driver-side
loops (BASELINE.json input_hint). A document is the atomicity unit, exactly
as in the reference where one task owns one page range
(rag/svr/task_executor.py:217-246).

Physical plan shape (SURVEY.md §4.2):

    Scan parquet/iceberg (url, html[, lang])   <- column pruning: only the
      -> [optional salted Repartition]            columns the UDF declares
      -> MapInPandas(extract_and_chunk)
      -> sink / compare

The extraction is embarrassingly parallel: no shuffle is required at all
unless the caller wants host-salted balancing (job/salting.py) — at 100 TB
the scan partitioning (Iceberg split planning) is already the right unit,
and AQE coalesces small post-shuffle partitions when a repartition is used.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

EXTRACTED_SCHEMA = ("url string, title string, extracted_text string, "
                    "n_sections int, parser string")

CHUNKS_SCHEMA = ("url string, chunk_seq int, chunk_text string, "
                 "chunk_id string, span_start long, span_end long, "
                 "page_nums array<int>")

BOOK_CHUNKS_SCHEMA = CHUNKS_SCHEMA + ", merge_mode string"


def _extract_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # imports inside the worker so the UDF pickles by reference cleanly
    from ragflow_spark.extractlib.codec import decode_blob
    from ragflow_spark.extractlib.htmlparse import parse_html_text
    from ragflow_spark.extractlib.templates import extract_pdf_text

    for pdf in it:
        urls, titles, texts, nsec, parsers = [], [], [], [], []
        for url, blob in zip(pdf["url"], pdf["html"]):
            blob = bytes(blob)
            # content sniffing replaces the reference's filename-regex
            # dispatch (rag/app/naive.py:335-464) — a CC-style table has
            # no filenames, only bytes
            if blob.startswith(b"%PDF-"):
                title, extracted, n = extract_pdf_text(blob)
                parser = "pdf"
            else:
                title, content = parse_html_text(decode_blob(blob))
                extracted = f"{title}\n{content}"
                n = len([s for s in extracted.split("\n") if s])
                parser = "html"
            urls.append(url)
            titles.append(title)
            texts.append(extracted)
            nsec.append(n)
            parsers.append(parser)
        yield pd.DataFrame({
            "url": urls, "title": titles, "extracted_text": texts,
            "n_sections": nsec,
            "parser": parsers,
        })


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> (url, title, extracted_text, n_sections,
    parser). The byte-identity invariant binds extracted_text per url."""
    return pages.select("url", "html").mapInPandas(
        _extract_batches, schema=EXTRACTED_SCHEMA
    )


TABLES_SCHEMA = "url string, kind string, seq int, content string"


def _table_batches_factory(html: bool):
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ragflow_spark.extractlib.pdftables import (
            pdf_to_sections_tables)

        for pdf in it:
            rows: dict[str, list] = {"url": [], "kind": [], "seq": [],
                                     "content": []}
            for url, blob in zip(pdf["url"], pdf["html"]):
                blob = bytes(blob)
                if not blob.startswith(b"%PDF-"):
                    continue
                _secs, tables, figures = pdf_to_sections_tables(
                    blob, return_html=html)
                if html:
                    for ti, tbl in enumerate(tables):
                        rows["url"].append(url)
                        rows["kind"].append("table_html")
                        rows["seq"].append(ti)
                        rows["content"].append(tbl)
                else:
                    for tbl in tables:
                        for ri, row in enumerate(tbl):
                            rows["url"].append(url)
                            rows["kind"].append("table")
                            rows["seq"].append(ri)
                            rows["content"].append(row)
                for fi, txt in enumerate(figures):
                    rows["url"].append(url)
                    rows["kind"].append("figure")
                    rows["seq"].append(fi)
                    rows["content"].append(txt)
            yield pd.DataFrame(rows)
    return gen


def extract_pdf_tables(pages: DataFrame, html: bool = False) -> DataFrame:
    """pages -> popped-out table/figure content rows: desc-row strings
    per table row (reference _render_desc) or one HTML string per table
    (``html=True``), plus caption+text per figure.  Same map-only plan
    shape as extract_pages — the whole table grid lives inside one
    document, so no shuffle ever carries cell boxes."""
    return pages.select("url", "html").mapInPandas(
        _table_batches_factory(html), schema=TABLES_SCHEMA
    )


OFFICE_SCHEMA = "url string, seq int, kind string, text string"


def _office_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ragflow_spark.extractlib.docxparse import docx_sections
    from ragflow_spark.extractlib.officegen import sniff_office
    from ragflow_spark.extractlib.xlsxparse import xlsx_rows

    for pdf in it:
        rows: dict[str, list] = {"url": [], "seq": [], "kind": [],
                                 "text": []}

        def emit(url, seq, kind, text):
            rows["url"].append(url)
            rows["seq"].append(seq)
            rows["kind"].append(kind)
            rows["text"].append(text)

        for url, blob in zip(pdf["url"], pdf["html"]):
            blob = bytes(blob)
            kind = sniff_office(blob)
            if kind == "docx":
                texts, lines = docx_sections(blob)
                for i, t in enumerate(texts):
                    emit(url, i, "para", t)
                for i, ln in enumerate(lines):
                    emit(url, i, "table", ln)
            elif kind == "xlsx":
                for i, ln in enumerate(xlsx_rows(blob)):
                    emit(url, i, "row", ln)
            elif kind == "pptx":
                from ragflow_spark.extractlib.pptxparse import parse_pptx
                # presentation template: one chunk per slide
                # (rag/app/presentation.py:96-128)
                for i, txt in enumerate(parse_pptx(blob)):
                    if txt.strip():
                        emit(url, i, "slide", txt)
            elif kind == "doc":
                from ragflow_spark.extractlib.docparse import (DocError,
                                                               doc_lines)
                # reference .doc branch (rag/app/naive.py:449-460):
                # tika content split to non-empty lines = sections; a
                # malformed FIB degrades to zero rows, never a crash
                try:
                    lines = doc_lines(blob)
                except DocError:
                    lines = []
                for i, ln in enumerate(lines):
                    emit(url, i, "para", ln)
            elif kind == "ppt":
                from ragflow_spark.extractlib.pptparse import (PptError,
                                                               parse_ppt)
                # beyond-reference: legacy deck through the same
                # one-chunk-per-slide presentation shape
                try:
                    slides = parse_ppt(blob)
                except PptError:
                    slides = []
                for i, txt in enumerate(slides):
                    if txt.strip():
                        emit(url, i, "slide", txt)
        yield pd.DataFrame(rows)


def chunk_office(pages: DataFrame) -> DataFrame:
    """pages with DOCX/XLSX byte payloads -> flat content rows
    (paragraphs + composed table lines / sheet row lines). Magic-byte
    dispatch replaces the reference's filename-extension dispatch
    (rag/app/naive.py:335-464), same map-only plan as extract_pages."""
    return pages.select("url", "html").mapInPandas(
        _office_batches, schema=OFFICE_SCHEMA
    )


def _chunk_batches_factory(template: str):
    def chunk_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ragflow_spark.extractlib import templates as T
        from ragflow_spark.extractlib.pdfrules import (parse_positions,
                                                       remove_tag)

        for pdf in it:
            rows: dict[str, list] = {
                "url": [], "chunk_seq": [], "chunk_text": [],
                "chunk_id": [], "span_start": [], "span_end": [],
                "page_nums": [],
            }
            modes: list[str] = []
            for url, blob in zip(pdf["url"], pdf["html"]):
                blob = bytes(blob)
                is_pdf = blob.startswith(b"%PDF-")
                # raw chunks keep @@..## tags where the path produces
                # them; positions parse out, tags strip for chunk_text
                if template == "paper":
                    # reference paper.chunk supports pdf only
                    # (rag/app/paper.py:160-162): non-pdf rows skipped
                    if not is_pdf:
                        continue
                    raw = T.chunk_paper_pdf(blob, keep_tags=True)
                    mode = "paper"
                elif template == "naive":
                    raw = (T.chunk_naive_pdf(blob, keep_tags=True)
                           if is_pdf else T.chunk_naive_html(blob))
                    mode = "naive"
                elif template == "book":
                    if is_pdf:
                        raw = T.chunk_naive_pdf(blob, 256, keep_tags=True)
                        mode = "naive"
                    else:
                        raw, mode = T.chunk_book_html(blob)
                elif template == "one":
                    raw = (T.chunk_one_pdf(blob) if is_pdf
                           else T.chunk_one_html(blob))
                    mode = "one"
                elif template == "laws":
                    raw = (T.chunk_laws_pdf(blob) if is_pdf
                           else T.chunk_laws_html(blob))
                    mode = "laws"
                else:  # pragma: no cover
                    raise ValueError(template)
                # chunk spans: character offsets into the concatenated
                # chunk stream of this url (the north rule's span
                # output); PDF chunks additionally carry page numbers
                # parsed from the position tags (rag/nlp/__init__.py:
                # 321-333 add_positions semantics)
                offset = 0
                for seq, tagged, _ in T.chunks_with_ids(raw, url):
                    text = remove_tag(tagged)
                    pages = sorted({p for pos in parse_positions(tagged)
                                    for p in pos[0]})
                    rows["url"].append(url)
                    rows["chunk_seq"].append(seq)
                    rows["chunk_text"].append(text)
                    rows["chunk_id"].append(T.chunk_id_of(text, url))
                    rows["span_start"].append(offset)
                    rows["span_end"].append(offset + len(text))
                    rows["page_nums"].append(pages)
                    modes.append(mode)
                    offset += len(text)
            out = pd.DataFrame(rows)
            if template == "book":
                out["merge_mode"] = modes
            yield out

    return chunk_batches


def chunk_pages(pages: DataFrame, template: str = "naive") -> DataFrame:
    """pages -> exploded chunk rows for one template chunker.

    chunk_seq is assigned inside the UDF (per-url order carried by the
    column, no window function / global sort needed — SURVEY.md §2.9)."""
    schema = BOOK_CHUNKS_SCHEMA if template == "book" else CHUNKS_SCHEMA
    return pages.select("url", "html").mapInPandas(
        _chunk_batches_factory(template), schema=schema
    )
