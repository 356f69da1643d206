import pytest
from pyspark.sql import functions as F

from govgis_nov2023_slim_spatial_server_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint_str,
    fingerprint_udf,
    html_to_markdown_str,
    lang_id,
    quality_score,
    token_count,
    tokens,
)


def test_tokens_edges(spark):
    df = spark.createDataFrame(
        [(1, "a b  c"), (2, ""), (3, "   "), (4, "one")], "id: long, t: string"
    )
    got = {r["id"]: (r["toks"], r["n"]) for r in df.select(
        "id", tokens("t").alias("toks"), token_count("t").alias("n")
    ).collect()}
    assert got[1] == (["a", "b", "c"], 3)
    assert got[2] == ([], 0)
    assert got[3] == ([], 0)
    assert got[4] == (["one"], 1)


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([(1, "hello, world! x=1")], "id: long, t: string")
    n = df.select(bpe_ish_token_count("t").alias("n")).first()["n"]
    # hello , world ! x = 1  → 7 non-space pieces
    assert n == 7


def test_html_to_markdown_cases():
    assert html_to_markdown_str("<p><b>Hi</b> there</p>") == "**Hi** there"
    assert html_to_markdown_str("<i>em</i>") == "*em*"
    assert (
        html_to_markdown_str('<a href="http://x.test">link</a>') == "[link](http://x.test)"
    )
    assert html_to_markdown_str("<ul><li>one</li><li>two</li></ul>") == "* one\n* two"
    assert html_to_markdown_str("a &amp; b &lt;c&gt;") == "a & b <c>"
    assert html_to_markdown_str(None) is None
    assert html_to_markdown_str("plain text") == "plain text"


def test_html_to_markdown_markdownify_parity():
    """Goldens pinned to `markdownify.markdownify` DEFAULT-option outputs
    (the reference's exact call, backend/mcp.py:3,12-20), modulo the
    documented outer strip()."""
    # heading_style='underlined' for h1/h2, ATX for h3+
    assert html_to_markdown_str("<h1>Top</h1>") == "Top\n==="
    assert html_to_markdown_str("<h2>Title</h2>rest") == "Title\n-----\n\nrest"
    assert html_to_markdown_str("<h3>Sub</h3>") == "### Sub"
    # chomp: inline-marker spaces move outside the markers
    assert html_to_markdown_str("a<b> bold </b>b") == "a **bold** b"
    assert html_to_markdown_str("<b></b>x") == "x"
    # autolink when anchor text IS the href
    assert (
        html_to_markdown_str('<a href="http://x.test">http://x.test</a>')
        == "<http://x.test>"
    )
    assert (
        html_to_markdown_str('<a href="http://x.test" title="T">link</a>')
        == '[link](http://x.test "T")'
    )
    # newline_style='spaces': <br> is a two-space markdown line break
    assert html_to_markdown_str("line1<br>line2") == "line1  \nline2"
    # ordered lists number; nested unordered lists cycle bullet and indent
    assert html_to_markdown_str("<ol><li>one</li><li>two</li></ol>") == "1. one\n2. two"
    assert (
        html_to_markdown_str("<ul><li>a<ul><li>b</li></ul></li><li>c</li></ul>")
        == "* a\n\t+ b\n* c"
    )
    # * and _ escape in text; entities decode first
    assert html_to_markdown_str("2 * 3 _x_") == "2 \\* 3 \\_x\\_"
    assert html_to_markdown_str("<code>x = 1*2</code>") == "`x = 1*2`"
    assert html_to_markdown_str('<img src="u.png" alt="pic">') == "![pic](u.png)"
    assert html_to_markdown_str("<blockquote>quoted</blockquote>") == "> quoted"
    assert html_to_markdown_str("<b><i>both</i></b>") == "***both***"
    # malformed html never raises
    assert html_to_markdown_str("<b>unclosed") == "**unclosed**"
    assert html_to_markdown_str("<p>stray</i> tags</p>") == "stray tags"


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [(1, "good clean alphabetic words here"), (2, "1234567890 000 111"), (3, "")],
        "id: long, t: string",
    )
    got = {r["id"]: r["q"] for r in df.select("id", quality_score("t").alias("q")).collect()}
    assert 0.0 <= got[2] < got[1] <= 1.0
    assert got[3] == pytest.approx(0.2)  # empty: alpha=0, len-ok=0, digit=0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of to in"),
            (2, "el perro de la casa que los"),
            (3, "der hund und die katze das nicht"),
            (4, "xyz qqq zzz"),
        ],
        "id: long, t: string",
    )
    got = {r["id"]: r["l"] for r in df.select("id", lang_id("t").alias("l")).collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "de"
    assert got[4] == "und"


def test_fingerprint_normalization(spark):
    assert fingerprint_str("Hello  World") == fingerprint_str("hello world")
    assert fingerprint_str("hello world") != fingerprint_str("hello worlds")
    assert fingerprint_str(None) is None
    df = spark.createDataFrame([(1, "Some Text"), (2, "some  text")], "id: long, t: string")
    vals = [r["fp"] for r in df.select(fingerprint_udf()(F.col("t")).alias("fp")).collect()]
    assert vals[0] == vals[1] == fingerprint_str("some text")


def test_html_to_markdown_never_raises_on_pathological_input():
    """The converter's contract is best-effort-never-raises (it runs in a
    pandas UDF): deep nesting (recursion unwinds into the tag-strip
    fallback), unclosed/mismatched tag soup, and random byte-soup strings
    must all return a string."""
    import numpy as np

    from govgis_nov2023_slim_spatial_server_spark.functions.text import (
        html_to_markdown_str,
    )

    deep = "<div>" * 5000 + "x" + "</div>" * 5000
    out = html_to_markdown_str(deep)
    assert isinstance(out, str) and "x" in out and "<div>" not in out

    rng = np.random.RandomState(7)
    frags = ["<b>", "</i>", "<li>", "<pre>", "&amp;", "<", ">", '"', "a ", "\n"]
    for _ in range(200):
        s = "".join(
            frags[int(rng.randint(0, len(frags)))]
            for _ in range(int(rng.randint(0, 60)))
        )
        assert html_to_markdown_str(s) is not None
