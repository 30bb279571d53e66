"""Analyzer + extraction golden tests (SURVEY.md §5.3)."""

from sparkfts.analysis import extract_text, tokenize, tokenize_query


def test_tokenize_goldens():
    assert tokenize("Hello, World!") == ["hello", "world"]
    assert tokenize("") == []
    assert tokenize("  a  b\tc\nd ") == ["a", "b", "c", "d"]
    assert tokenize("x86-64 and C3PO") == ["x86", "64", "and", "c3po"]
    assert tokenize("CAFÉ naïve") == ["caf", "na", "ve"]  # ascii-pinned analyzer
    assert tokenize("123abc") == ["123abc"]


def test_tokenize_query_dedup_sorted():
    assert tokenize_query("The THE the quick") == ["quick", "the"]
    assert tokenize_query("") == []
    assert tokenize_query("b a b a") == ["a", "b"]


def test_extract_basic():
    html = b"<html><head><title>T</title></head><body><p>a b</p><p>c</p></body></html>"
    assert extract_text(html) == "T a b c"


def test_extract_drops_script_style_comments():
    html = (
        b"<body>keep<script>var x='GONE';</script>"
        b"<style>.x{color:GONE}</style><!-- GONE -->also</body>"
    )
    assert extract_text(html) == "keep also"


def test_extract_entities():
    assert extract_text(b"fish &amp; chips &lt;b&gt;") == "fish & chips <b>"
    assert extract_text(b"&#65;&#x42;") == "AB"
    assert extract_text(b"&nbsp;x&quot;") == 'x"'
    assert extract_text(b"&unknown; stays") == "&unknown; stays"


def test_extract_whitespace_canonical():
    assert extract_text(b"<p>a</p>\n\n  <p> b   c </p>") == "a b c"


def test_extract_accepts_str_and_bad_utf8():
    assert extract_text("<b>x</b>") == "x"
    assert extract_text(b"\xff\xfe<p>ok</p>") == "�� ok"


def test_extract_deterministic_idempotent_on_plain_text():
    s = extract_text(b"plain words only")
    assert s == "plain words only"
    assert extract_text(s) == s
