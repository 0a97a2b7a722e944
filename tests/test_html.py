"""HTML boilerplate stripper: content kept, chrome dropped."""

from khl_pdf_ocr_spark.refkernel.html import extract_html_text, strip_boilerplate

PAGE = """<!DOCTYPE html>
<html><head><title>Заголовок статьи</title>
<style>.x { color: red }</style>
<script>var t = 1; function f() { return "dropped"; }</script>
</head><body>
<header><nav><a href="/a">Главная</a> <a href="/b">Новости</a> <a href="/c">Матчи</a></nav></header>
<div id="main">
<h1>Большой матч сезона</h1>
<p>Это основное содержание страницы с достаточно длинным текстом, чтобы
пройти порог плотности и быть сохранённым экстрактором без ссылок.</p>
<p>Второй абзац основного текста тоже достаточно длинный и плотный, он
должен сохраниться в выводе после фильтрации шаблонного мусора.</p>
</div>
<aside><ul>
<li><a href="/t/1">ссылка один</a></li>
<li><a href="/t/2">ссылка два</a></li>
<li><a href="/t/3">ссылка три</a></li>
</ul></aside>
<footer><p>© 2025 — <a href="/about">о сайте</a> <a href="/tos">условия</a></p></footer>
</body></html>"""


def test_keeps_main_content_and_heading():
    out = strip_boilerplate(PAGE)
    assert "Большой матч сезона" in out
    assert "основное содержание страницы" in out
    assert "Второй абзац" in out


def test_drops_nav_sidebar_footer_script_style():
    out = strip_boilerplate(PAGE)
    assert "Главная" not in out
    assert "ссылка один" not in out
    assert "© 2025" not in out
    assert "dropped" not in out
    assert "color: red" not in out


def test_title_kept_when_low_link():
    assert "Заголовок статьи" in strip_boilerplate(PAGE)


def test_blocks_joined_with_newlines():
    out = strip_boilerplate(PAGE)
    lines = out.split("\n")
    assert len(lines) >= 3
    assert all(ln == ln.strip() and "  " not in ln for ln in lines)


def test_deterministic():
    assert strip_boilerplate(PAGE) == strip_boilerplate(PAGE)


def test_bytes_entry_decodes_utf8_with_replacement():
    payload = PAGE.encode("utf-8") + b"\xff\xfe"
    out = extract_html_text(payload)
    assert "Большой матч сезона" in out


def test_short_linky_block_dropped():
    html = '<div><a href="/x">много ссылок тут совсем</a> и чуть текста</div>'
    assert strip_boilerplate(html) == ""


def test_charset_detection_cp1251():
    from khl_pdf_ocr_spark.refkernel.html import detect_charset

    body = ("<html><head><meta charset=windows-1251></head><body><p>"
            + "очень длинный русский текст страницы про матчи " * 4
            + "</p></body></html>")
    payload = body.encode("cp1251")
    assert detect_charset(payload) == "windows-1251"
    out = extract_html_text(payload)
    assert "русский текст" in out


def test_charset_unknown_falls_back_utf8():
    from khl_pdf_ocr_spark.refkernel.html import detect_charset

    assert detect_charset(b'<meta charset="no-such-enc">') == "utf-8"
    assert detect_charset(b"plain") == "utf-8"


def test_charset_utf8_bom():
    from khl_pdf_ocr_spark.refkernel.html import detect_charset

    assert detect_charset(b"\xef\xbb\xbf<html>") == "utf-8"


def test_unclosed_option_does_not_swallow_document():
    html = ('<select><option>A<option>B</select>'
            '<p>длинный основной текст статьи который обязан сохраниться '
            'после невалидной разметки селекта в начале страницы</p>')
    out = strip_boilerplate(html)
    assert "основной текст статьи" in out
    assert "A" not in out.split()


def test_void_embed_does_not_swallow_document():
    html = ('<embed src="x.swf">'
            '<p>ещё один достаточно длинный основной текст статьи который '
            'обязан пережить встречу с войд-элементом перед ним</p>')
    assert "основной текст статьи" in strip_boilerplate(html)


def test_unclosed_nav_does_not_swallow_article():
    html = ('<header><nav><a href="/a">меню</a>'  # missing </nav></header>
            '<main><p>длинный основной текст статьи который обязан выжить '
            'после незакрытого нав-контейнера в начале документа страницы</p></main>')
    assert "основной текст статьи" in strip_boilerplate(html)


def test_unclosed_anchor_does_not_poison_following_blocks():
    html = ('<p><a href="/x">ссылка без закрытия'  # missing </a>
            '</p><p>совершенно обычный длинный абзац основного текста который '
            'не должен считаться ссылочным мусором из-за чужой ошибки</p>')
    assert "обычный длинный абзац" in strip_boilerplate(html)


def test_block_level_link_counts_as_link_text():
    """HTML5 block-in-anchor (<a><div>…</div></a>, link-farm cards) must
    score with full link ratio — NOT pass the density cut as content
    (ADVICE: anchor depth was zeroed at every block open)."""
    card = ("<a href='/promo'><div>"
            "amazing promotional card text with plenty of words to pass "
            "the density and length thresholds easily here today friends"
            "</div></a>")
    body = ("<p>genuine article paragraph with plenty of ordinary prose "
            "words to keep it well above every density threshold used</p>")
    out = strip_boilerplate(f"<html><body>{card}{body}</body></html>")
    assert "genuine article paragraph" in out
    assert "promotional card" not in out


def test_stale_unclosed_anchor_does_not_swallow_following_blocks():
    """An anchor left unclosed inside a closed block must not mark the
    next sibling block as link text."""
    html = ("<div><a href='/x'>home link"  # no </a>
            "</div>"
            "<p>real article text with plenty of ordinary prose words to "
            "stay above the density threshold in this paragraph today</p>")
    out = strip_boilerplate(f"<html><body>{html}</body></html>")
    assert "real article text" in out
