"""minipdf codec: round-trips, compression, corruption."""

import pytest

from khl_pdf_ocr_spark.refkernel import minipdf

WORDS = [
    (40.0, 50.0, "Официальный", 10.0),
    (110.0, 50.0, "протокол", 10.0),
    (40.0, 70.5, "АВАНГАРД", 14.0),
    (320.0, 70.5, "МЕТАЛЛУРГ", 14.0),
    (40.0, 100.0, "15.09.2025", 10.0),
]


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip(compress):
    pdf = minipdf.build_game_sheet_pdf(WORDS, compress=compress)
    assert pdf.startswith(b"%PDF-")
    out = minipdf.extract_words(pdf)
    assert len(out) == len(WORDS)
    for (x, y, t, _s), w in zip(WORDS, out):
        x0, y0, x1, y1, text, *_ = w
        assert abs(x0 - x) < 1e-6
        assert abs(y0 - y) < 1e-6
        assert text == t
        assert x1 > x0 and y1 > y0


def test_padding_inflates_but_parses():
    small = minipdf.build_game_sheet_pdf(WORDS)
    big = minipdf.build_game_sheet_pdf(WORDS, pad_bytes=100_000)
    assert len(big) > len(small) + 90_000
    assert [w[4] for w in minipdf.extract_words(big)] == [t for _, _, t, _ in WORDS]


def test_corrupt_inputs():
    with pytest.raises(minipdf.MiniPdfError):
        minipdf.extract_words(b"not a pdf at all")
    with pytest.raises(minipdf.MiniPdfError):
        minipdf.extract_words(b"%PDF-1.4\ngarbage without streams")
    with pytest.raises(minipdf.MiniPdfError):
        minipdf.extract_words(b"")


def test_literal_string_escapes():
    # hand-built content stream exercising ( ) literal strings + escapes
    content = b"BT /F1 10 Tf 40 800 Td (hello \\(x\\) \\\\ world) Tj ET\n"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Page /MediaBox [0 0 595 842] >>\nendobj\n"
           b"2 0 obj\n<< /Length " + str(len(content)).encode() +
           b" >>\nstream\n" + content +
           b"endstream\nendobj\ntrailer\n<< >>\n%%EOF\n")
    out = minipdf.extract_words(pdf)
    assert len(out) == 1
    assert out[0][4] == "hello (x) \\ world"


def test_tm_and_tstar_operators():
    content = (b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (first) Tj "
               b"14 TL T* (second) Tj ET\n")
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /MediaBox [0 0 595 842] >>\nendobj\n"
           b"2 0 obj\n<< /Length " + str(len(content)).encode() +
           b" >>\nstream\n" + content +
           b"endstream\nendobj\n%%EOF\n")
    out = minipdf.extract_words(pdf)
    assert [w[4] for w in out] == ["first", "second"]
    assert out[1][1] > out[0][1]  # second line is lower on the page (top-down y)


def test_tj_array_and_quote_operators():
    content = (b"BT /F1 12 Tf 1 0 0 1 100 700 Tm "
               b"[(Hel) -120 (lo)] TJ "
               b"14 TL (world) ' ET\n")
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /MediaBox [0 0 595 842] >>\nendobj\n"
           b"2 0 obj\n<< /Length " + str(len(content)).encode() +
           b" >>\nstream\n" + content +
           b"endstream\nendobj\n%%EOF\n")
    out = minipdf.extract_words(pdf)
    assert [w[4] for w in out] == ["Hello", "world"]
    assert out[1][1] > out[0][1]  # ' moved to the next line


def test_multipage_reads_page_zero_only():
    # reference restriction: pno=0 at every call site (app.py:67,86)
    w = minipdf.PdfWriter()
    w.add_word(40.0, 50.0, "первая", 10.0)
    w.add_word(120.0, 50.0, "страница", 10.0)
    w.new_page()
    w.add_word(40.0, 50.0, "вторая", 10.0)
    out = minipdf.extract_words(w.tobytes())
    assert [x[4] for x in out] == ["первая", "страница"]


def test_multipage_compressed():
    w = minipdf.PdfWriter(compress=True)
    w.add_word(40.0, 50.0, "стр1", 10.0)
    w.new_page()
    w.add_word(40.0, 50.0, "стр2", 10.0)
    out = minipdf.extract_words(w.tobytes())
    assert [x[4] for x in out] == ["стр1"]


def test_textless_valid_pdf_returns_no_words_not_error():
    # MuPDF semantics: a structurally valid PDF without a text layer
    # yields zero words, not an open error (scanned-image PDFs)
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 595 842] >>\nendobj\n"
           b"%%EOF\n")
    assert minipdf.extract_words(pdf) == []


def test_literal_backslash_8_is_not_octal():
    # PDF spec: octal escapes are \0..\7 digits only; \8 is just '8'
    content = b"BT /F1 10 Tf 40 800 Td (a\\89b \\0101) Tj ET\n"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /MediaBox [0 0 595 842] >>\nendobj\n"
           b"2 0 obj\n<< /Length " + str(len(content)).encode() +
           b" >>\nstream\n" + content + b"endstream\nendobj\n%%EOF\n")
    out = minipdf.extract_words(pdf)
    assert out[0][4] == "a89b \x081"  # \010 = octal 8 = backspace, then '1'


def test_textless_first_page_does_not_leak_second_page():
    w = minipdf.PdfWriter()
    # page 0: no words at all
    w.new_page()
    w.add_word(40.0, 50.0, "скрытая", 10.0)
    w.add_word(120.0, 50.0, "страница", 10.0)
    assert minipdf.extract_words(w.tobytes()) == []


def test_contents_array_form():
    # /Contents [4 0 R] — array form of the first page's content refs
    content = b"BT /F1 10 Tf 40 800 Td (hello) Tj ET\n"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 595 842] "
           b"/Contents [4 0 R] >>\nendobj\n"
           b"4 0 obj\n<< /Length " + str(len(content)).encode() +
           b" >>\nstream\n" + content + b"endstream\nendobj\n%%EOF\n")
    assert [x[4] for x in minipdf.extract_words(pdf)] == ["hello"]


def test_backslash_newline_is_line_continuation():
    content = b"BT /F1 10 Tf 40 800 Td (Glav\\\nny) Tj ET\n"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /MediaBox [0 0 595 842] >>\nendobj\n"
           b"2 0 obj\n<< /Length " + str(len(content)).encode() +
           b" >>\nstream\n" + content + b"endstream\nendobj\n%%EOF\n")
    out = minipdf.extract_words(pdf)
    assert out[0][4] == "Glavny"


def _obj(num, body):
    return f"{num} 0 obj ".encode() + body + b" endobj\n"


def _stream_obj(num, content):
    return (f"{num} 0 obj << /Length {len(content)} >> stream\n".encode()
            + content + b"\nendstream endobj\n")


def test_page0_resolved_via_kids_not_file_order():
    """A wild PDF serialized out of page order: the /Type /Page object
    that appears FIRST in the file is page 2; Kids[0] is page 1.  'Page
    0' must follow the tree (ADVICE: minipdf page-0 resolution)."""
    parts = [b"%PDF-1.4\n"]
    parts.append(_obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    parts.append(_obj(2, b"<< /Type /Pages /Kids [4 0 R 3 0 R] /Count 2 >>"))
    # object 3 (the SECOND page) serialized before object 4 (the FIRST)
    parts.append(_obj(3, b"<< /Type /Page /Parent 2 0 R "
                         b"/MediaBox [0 0 612 792] /Contents 5 0 R >>"))
    parts.append(_obj(4, b"<< /Type /Page /Parent 2 0 R "
                         b"/MediaBox [0 0 612 792] /Contents 6 0 R >>"))
    parts.append(_stream_obj(5, b"BT /F1 10 Tf 72 700 Td (WRONGPAGE) Tj ET"))
    parts.append(_stream_obj(6, b"BT /F1 10 Tf 72 700 Td (RIGHTPAGE) Tj ET"))
    parts.append(b"trailer << /Size 7 /Root 1 0 R >>\n%%EOF\n")
    data = b"".join(parts)

    words = minipdf.extract_words(data)
    texts = {w[4] for w in words}
    assert "RIGHTPAGE" in texts
    assert "WRONGPAGE" not in texts


def test_page0_file_order_fallback_without_tree():
    """No /Root catalog → fall back to the first /Type /Page in file
    order (best-effort for malformed PDFs)."""
    parts = [b"%PDF-1.4\n"]
    parts.append(_obj(3, b"<< /Type /Page /MediaBox [0 0 612 792] "
                         b"/Contents 5 0 R >>"))
    parts.append(_stream_obj(5, b"BT /F1 10 Tf 72 700 Td (ONLYPAGE) Tj ET"))
    parts.append(b"%%EOF\n")
    words = minipdf.extract_words(b"".join(parts))
    assert {w[4] for w in words} == {"ONLYPAGE"}


def test_page_tree_inside_objstm():
    """Modern wild PDFs pack catalog/page dicts in compressed object
    streams; page-0 resolution must follow the tree through them."""
    import zlib

    # objects 1 (catalog), 2 (pages), 3+4 (page dicts) packed in one ObjStm;
    # page dict 4 (Kids[0]) appears AFTER 3 inside the stream
    bodies = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [4 0 R 3 0 R] /Count 2 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 6 0 R >>"),
        (4, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 7 0 R >>"),
    ]
    offsets, blob = [], b""
    for num, b in bodies:
        offsets.append((num, len(blob)))
        blob += b + b" "
    header = b" ".join(b"%d %d" % p for p in offsets) + b" "
    payload = zlib.compress(header + blob)
    parts = [b"%PDF-1.6\n"]
    parts.append(b"5 0 obj << /Type /ObjStm /N 4 /First %d /Length %d "
                 b"/Filter /FlateDecode >> stream\n" % (len(header), len(payload))
                 + payload + b"\nendstream endobj\n")
    parts.append(_stream_obj(6, b"BT /F1 10 Tf 72 700 Td (WRONGPAGE) Tj ET"))
    parts.append(_stream_obj(7, b"BT /F1 10 Tf 72 700 Td (RIGHTPAGE) Tj ET"))
    parts.append(b"trailer << /Size 8 /Root 1 0 R >>\n%%EOF\n")
    words = minipdf.extract_words(b"".join(parts))
    texts = {w[4] for w in words}
    assert "RIGHTPAGE" in texts
    assert "WRONGPAGE" not in texts


def test_tree_resolved_blank_page0_is_authoritative_empty():
    """A tree-resolved first page with NO /Contents (legal blank cover)
    must yield zero words — never fall through to the all-streams scan,
    which would leak page 1's text into page 0."""
    parts = [b"%PDF-1.4\n"]
    parts.append(_obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    parts.append(_obj(2, b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>"))
    parts.append(_obj(3, b"<< /Type /Page /Parent 2 0 R "
                         b"/MediaBox [0 0 612 792] >>"))  # blank cover
    parts.append(_obj(4, b"<< /Type /Page /Parent 2 0 R "
                         b"/MediaBox [0 0 612 792] /Contents 5 0 R >>"))
    parts.append(_stream_obj(5, b"BT /F1 10 Tf 72 700 Td (PAGETWO) Tj ET"))
    parts.append(b"trailer << /Size 6 /Root 1 0 R >>\n%%EOF\n")
    assert minipdf.extract_words(b"".join(parts)) == []


def test_generation_nonzero_contents_ref():
    """Incrementally-updated PDFs use generation != 0 refs — the tree
    walk must still resolve them (review finding)."""
    parts = [b"%PDF-1.4\n"]
    parts.append(_obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    parts.append(_obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"))
    parts.append(_obj(3, b"<< /Type /Page /Parent 2 0 R "
                         b"/MediaBox [0 0 612 792] /Contents 5 1 R >>"))
    parts.append(b"5 1 obj << /Length 40 >> stream\n"
                 b"BT /F1 10 Tf 72 700 Td (GENONE) Tj ET\nendstream endobj\n")
    parts.append(b"trailer << /Size 6 /Root 1 0 R >>\n%%EOF\n")
    words = minipdf.extract_words(b"".join(parts))
    assert {w[4] for w in words} == {"GENONE"}


def test_inflate_survives_trailing_newline_ambiguity():
    """A Flate stream whose compressed bytes END in 0x0A, written with
    no EOL before endstream: decompressobj must still inflate it."""
    import zlib

    # craft a payload whose compressed form ends with 0x0A
    content = None
    for i in range(5000):
        cand = b"BT /F1 10 Tf 72 700 Td (X%d word%d) Tj ET" % (i, i * 7)
        if zlib.compress(cand, 6).endswith(b"\n"):
            content = cand
            break
    assert content is not None, "no 0x0A-tailed compressed sample found"
    comp = zlib.compress(content, 6)
    parts = [b"%PDF-1.4\n"]
    parts.append(_obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    parts.append(_obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"))
    parts.append(_obj(3, b"<< /Type /Page /Parent 2 0 R "
                         b"/MediaBox [0 0 612 792] /Contents 5 0 R >>"))
    # NO EOL between the compressed bytes and 'endstream' — legal PDF
    parts.append(b"5 0 obj << /Length %d /Filter /FlateDecode >> stream\n" % len(comp)
                 + comp + b"endstream endobj\n")
    parts.append(b"trailer << /Size 6 /Root 1 0 R >>\n%%EOF\n")
    words = minipdf.extract_words(b"".join(parts))
    assert len(words) >= 1 and words[0][4].startswith("X")


def test_contents_ref_not_matched_by_suffix_object():
    """Resolving /Contents '5 0 R' must not match object 15's stream
    (review finding: missing number anchor in the stream template)."""
    parts = [b"%PDF-1.4\n"]
    parts.append(_obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    parts.append(_obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"))
    # decoy object 15 appears BEFORE object 5 in the file
    parts.append(_stream_obj(15, b"BT /F1 10 Tf 72 700 Td (DECOY) Tj ET"))
    parts.append(_obj(3, b"<< /Type /Page /Parent 2 0 R "
                         b"/MediaBox [0 0 612 792] /Contents 5 0 R >>"))
    parts.append(_stream_obj(5, b"BT /F1 10 Tf 72 700 Td (TARGET) Tj ET"))
    parts.append(b"trailer << /Size 16 /Root 1 0 R >>\n%%EOF\n")
    words = minipdf.extract_words(b"".join(parts))
    texts = {w[4] for w in words}
    assert texts == {"TARGET"}
