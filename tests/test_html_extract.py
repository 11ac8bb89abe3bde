"""HTML main-text extraction (operators/html.py) — boilerplate rules
and tag-soup robustness the driver's fixture page can't exercise:
nested elements, unclosed tags, attribute noise, scripts containing
markup, and case-insensitive closers."""

from __future__ import annotations

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.operators.html import extract_main_text

BODY = ("This paragraph is the real content of the page and easily "
        "long enough to clear the minimum length rule.")


def _extract(spark, html, **kw):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(extract_main_text("html", **kw).alias("r")) \
        .select("r.*").collect()[0]


def test_boilerplate_drops_content_survives(spark):
    html = (
        '<html><head><style>.m{c:red}</style>'
        '<script>var x = "<div>markup inside script</div>";</script>'
        '</head><body>'
        '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        f'<p>{BODY}</p>'
        '<div><a href="/x">read more</a> <a href="/y">subscribe</a></div>'
        f'<P>{BODY}</P>'  # uppercase closer must still segment
        '<footer><a href="/p">Privacy</a><a href="/t">Terms</a></footer>'
        '</body></html>')
    r = _extract(spark, html)
    assert r["extracted_text"] == f"{BODY} {BODY}"
    assert r["n_kept"] == 2
    # nav + read-more + footer had text but were boilerplate
    assert r["n_dropped"] == 3
    # the <div> INSIDE the script string must not leak a segment
    assert "markup inside script" not in r["extracted_text"]


def test_unclosed_and_nested_tags_are_salvaged(spark):
    # No closing </p>/<div> pairs at all: the whole soup is one
    # segment; tags strip, text survives.
    html = f'<div><p>{BODY}<div>nested <b>bold</b><i>ital'
    r = _extract(spark, html)
    assert r["n_kept"] == 1
    assert r["extracted_text"].startswith(BODY)
    assert r["extracted_text"].endswith("nested bold ital")
    assert "<" not in r["extracted_text"]


def test_attribute_noise_and_self_closing_tags(spark):
    html = (f'<p class="a b" data-x="1 > 0 is fine-ish">{BODY}</p>'
            '<img src="x.png"/><br/>'
            f'<li style="color: red;">{BODY}</li>')
    r = _extract(spark, html)
    # regex tag-soup caveat: a '>' inside an attribute MAY split the
    # tag early (documented limitation) — but content never vanishes
    assert r["n_kept"] == 2
    assert BODY in r["extracted_text"]


def test_link_density_boundary_is_exact(spark):
    # Tag-strip turns the anchor tags into spaces, so the plain text is
    # "llll... yyyy..." with ONE joining space: link 12 + space + 27 y's
    # = plain_len 40, density 12/40 = 0.3 EXACTLY -> KEPT (<=, not <)
    html = f'<p><a href="/z">{"l" * 12}</a>{"y" * 27}</p>'
    r = _extract(spark, html, min_len=10)
    assert r["n_kept"] == 1, r
    # one more link char at the same plain_len: 13/40 > 0.3 -> dropped
    html2 = f'<p><a href="/z">{"l" * 13}</a>{"y" * 26}</p>'
    r2 = _extract(spark, html2, min_len=10)
    assert r2["n_kept"] == 0 and r2["n_dropped"] == 1


def test_link_density_threshold_is_exact_rational(spark):
    """Round-9 review fix: non-tenth thresholds must be honored
    exactly — 0.25 used to quantize to 0.2, and 0.05 to ZERO (dropping
    every segment containing any anchor text)."""
    # link 1 + space + 19 y's = plain_len 21, density 1/21 ≈ 0.048
    html = f'<p><a href="/z">l</a>{"y" * 19}</p>'
    r = _extract(spark, html, min_len=10, max_link_density=0.05)
    assert r["n_kept"] == 1, "density 1/21 < 0.05 must be kept"
    # density 12/48 = 0.25 exactly: kept at threshold 0.25...
    html2 = f'<p><a href="/z">{"l" * 12}</a>{"y" * 35}</p>'
    r2 = _extract(spark, html2, min_len=10, max_link_density=0.25)
    assert r2["n_kept"] == 1
    # ...and 13/48 > 0.25 dropped (0.2-quantization would need > 0.3
    # worth of links to drop, so this pins the exact threshold)
    html3 = f'<p><a href="/z">{"l" * 13}</a>{"y" * 34}</p>'
    r3 = _extract(spark, html3, min_len=10, max_link_density=0.25)
    assert r3["n_kept"] == 0 and r3["n_dropped"] == 1


def test_comments_and_noscript_never_surface(spark):
    html = (f'<!-- hidden {"c" * 50} --><noscript>enable js enable js '
            f'enable js enable js</noscript><p>{BODY}</p>')
    r = _extract(spark, html)
    assert r["extracted_text"] == BODY
    assert r["n_kept"] == 1


def test_whitespace_collapses_and_empty_segments_dont_count(spark):
    html = f'<p>  {BODY.replace(" ", "   ")}  </p><div></div><td> </td>'
    r = _extract(spark, html)
    assert r["extracted_text"] == BODY
    assert r["n_dropped"] == 0  # empty segments are residue, not drops


def test_composes_with_quality_stage(spark):
    # funnel: extract first, THEN score length on the extracted text —
    # the html wrapper must not inflate the quality signal
    docs = spark.createDataFrame(
        [(1, f'<nav><a href="/">Home</a></nav><p>{BODY}</p>'),
         (2, '<nav><a href="/">Home</a></nav><p>tiny</p>')],
        "doc_id long, html string")
    out = (
        docs.select("doc_id", extract_main_text("html").alias("r"))
        .select("doc_id", F.col("r.extracted_chars").alias("n"))
    )
    got = {r["doc_id"]: r["n"] for r in out.collect()}
    assert got[1] == len(BODY)
    assert got[2] == 0  # 'tiny' fails min_len -> nothing extracted
