"""Unit coverage for the HTML block extractor beyond the registered
fixture query: nesting, skip tags, entity refs, link density, and the
Spark mapInPandas plumbing (schema + batch shape)."""

from __future__ import annotations

from azurestorage_blueprints_spark.operators.html_text import (
    MIN_TOKENS,
    extract_blocks,
    extract_html_text,
    _fold,
)


def test_script_style_title_content_is_dropped():
    html = (
        "<html><head><title>t</title><style>p{x:1}</style></head>"
        "<body><script>var kept = 'no tokens from here please';</script>"
        "<p>alpha beta gamma delta epsilon zeta</p></body></html>"
    )
    blocks = extract_blocks(html)
    assert [b["text"] for b in blocks] == ["alpha beta gamma delta epsilon zeta"]
    assert blocks[0]["kept"]


def test_nested_blocks_segment_at_boundaries():
    html = (
        "<div>outer one two three four five"
        "<p>inner alpha beta gamma delta epsilon</p>"
        "trailing six seven eight nine ten</div>"
    )
    blocks = extract_blocks(html)
    texts = [b["text"] for b in blocks]
    assert "outer one two three four five" in texts
    assert "inner alpha beta gamma delta epsilon" in texts
    assert "trailing six seven eight nine ten" in texts
    # inner <p> attributed to its own tag, outer fragments to div
    tags = {b["text"]: b["tag"] for b in blocks}
    assert tags["inner alpha beta gamma delta epsilon"] == "p"
    assert tags["outer one two three four five"] == "div"


def test_link_dense_block_is_boilerplate():
    nav = "<nav>" + " ".join(f'<a href="/{i}">link{i}</a>' for i in range(8)) + "</nav>"
    blocks = extract_blocks(nav + "<p>real content with six tokens here</p>")
    by_tag = {b["tag"]: b for b in blocks}
    assert by_tag["nav"]["n_tokens"] >= MIN_TOKENS  # long enough...
    assert not by_tag["nav"]["kept"]  # ...but link-dominated
    assert by_tag["p"]["kept"]


def test_short_block_is_boilerplate():
    blocks = extract_blocks("<footer>very few words</footer>")
    assert len(blocks) == 1 and not blocks[0]["kept"]


def test_charrefs_roundtrip_exactly():
    blocks = extract_blocks("<p>a &amp; b &lt; c &gt; d plus more tokens</p>")
    assert blocks[0]["text"] == "a & b < c > d plus more tokens"


def test_unclosed_tags_do_not_crash_or_leak_skip_state():
    # malformed: unclosed script then real content — parser must not
    # swallow the rest of the page
    blocks = extract_blocks(
        "<script>var x=1;</script><p>alpha beta gamma delta epsilon</p><div>tail"
    )
    texts = [b["text"] for b in blocks]
    assert "alpha beta gamma delta epsilon" in texts


def test_fold_is_the_portable_polynomial():
    assert _fold("") == 0
    assert _fold("a") == 97
    assert _fold("ab") == 97 * 31 + 98


def test_spark_plumbing_schema_and_values(spark):
    rows = [
        (1, "<p>one two three four five six</p>"),
        (2, "<nav><a href='/'>home</a></nav>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = extract_html_text(df).orderBy("doc_id").collect()
    assert [f.name for f in extract_html_text(df).schema] == [
        "doc_id",
        "n_blocks",
        "n_kept",
        "kept_tokens",
        "kept_chars",
        "checksum",
    ]
    assert out[0]["n_kept"] == 1 and out[0]["kept_tokens"] == 6
    assert out[0]["checksum"] == _fold("one two three four five six")
    assert out[1]["n_kept"] == 0 and out[1]["checksum"] == 0
