"""Email template: MIME walk, part decode, hostile input."""

from ragflow_spark.extractlib.email_parse import chunk_email, email_sections


def _eml(body_plain="hello world", body_html=None, extra_headers=""):
    html_part = ""
    if body_html:
        html_part = ("--BB\r\nContent-Type: text/html; "
                     f'charset="utf-8"\r\n\r\n{body_html}\r\n')
    return (
        "From: a@example.com\r\n"
        "To: b@example.com\r\n"
        "Subject: Test\r\n"
        f"{extra_headers}"
        'Content-Type: multipart/alternative; boundary="BB"\r\n\r\n'
        "--BB\r\nContent-Type: text/plain; "
        f'charset="utf-8"\r\n\r\n{body_plain}\r\n'
        f"{html_part}--BB--\r\n"
    ).encode()


def test_headers_and_plain_body_in_sections():
    secs = email_sections(_eml())
    joined = "".join(t for t, _ in secs)
    assert "From: a@example.com" in joined
    assert "hello world" in joined


def test_html_alternative_extracted():
    html = ("<html><head><title>T</title></head><body><article>"
            "<p>html body text here and more words</p></article>"
            "</body></html>")
    secs = email_sections(_eml(body_html=html))
    texts = [t for t, _ in secs]
    assert any("html body text" in t for t in texts)
    assert any(t == "T" for t in texts)  # html title is its own section


def test_single_part_plain_email():
    eml = (b"From: x@example.com\r\nSubject: S\r\n"
           b"Content-Type: text/plain\r\n\r\nplain only body\r\n")
    chunks = chunk_email(eml)
    assert len(chunks) == 1
    assert "plain only body" in chunks[0]


def test_hostile_email_inputs_never_raise():
    for blob in (b"", b"not an email", bytes(range(256)),
                 b"Content-Type: multipart/mixed\r\n\r\nbroken"):
        email_sections(blob)
        chunk_email(blob)


def test_semicolon_delimiter_quirk():
    # ';' in header values is removed by the txt delimiter set
    chunks = chunk_email(_eml())
    assert 'multipart/alternative boundary="BB"' in chunks[0]
    assert "alternative; boundary" not in chunks[0]


def test_email_undecodable_degrades_quietly():
    from ragflow_spark.extractlib.email_parse import email_sections

    # non-RFC822 bytes still produce a headerless section list (the
    # stdlib parser treats the blob as a body), never a raise
    out = email_sections(b"\xff\xfe\x00broken")
    assert isinstance(out, list)


def test_email_unknown_charset_part_skipped():
    # a declared-but-nonexistent charset raises LookupError inside the
    # part walk; the reference's try/except drops just that part
    eml = (b"From: a@b.c\r\n"
           b"Content-Type: multipart/mixed; boundary=B\r\n\r\n"
           b"--B\r\nContent-Type: text/plain; charset=x-no-such-cs\r\n"
           b"\r\nlost body\r\n"
           b"--B\r\nContent-Type: text/plain; charset=utf-8\r\n"
           b"\r\nkept body\r\n--B--\r\n")
    secs = email_sections(eml)
    joined = " ".join(s[0] for s in secs)
    assert "kept body" in joined and "lost body" not in joined
