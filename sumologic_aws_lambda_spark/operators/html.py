"""HTML boilerplate removal / main-text extraction — the step between
a raw web crawl and the plain-text curation funnel.

jusText (Pomikálek 2011) and trafilatura classify BLOCK-LEVEL segments
by text length and link density: navigation bars, footers, and
read-more rows are short and link-saturated, body paragraphs are long
and link-sparse.  This module implements that rule as PURE COLUMN
EXPRESSIONS — regexp strips + higher-order array functions, zero UDFs
— so at 100 TB extraction runs inside whole-stage codegen on the scan
projection, exactly like :mod:`..functions.urls`.  (A full DOM parser
is deliberately out of scope: the density heuristic is what the C4 /
RefinedWeb-class pipelines actually keep at scale, and a tag-soup
regex segmenter is robust to the malformed HTML a real crawl is full
of — see ``tests/test_html_extract.py`` for nested/unclosed cases.)

Pipeline (each step mirrored verbatim by the DuckDB oracle in
``queries/curation.py::html_text_extraction``):

1. drop ``<script>``/``<style>``/``<noscript>`` ELEMENTS (tag + body;
   their text is never content) and HTML comments,
2. segment on closing BLOCK tags (``</p> </div> </nav> …``,
   case-insensitive) — a sentinel ``\\x01`` then one split,
3. per segment: ``plain`` = tag-stripped whitespace-collapsed text;
   ``link_len`` = tag-stripped length of text inside ``<a>`` elements,
4. keep segments with ``plain_len >= min_len`` AND link density
   ``link_len / plain_len <= 0.3`` (compared as exact integer
   cross-products — no float round-off at the boundary),
5. join kept segments in document order.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column
from pyspark.sql import functions as F

# Inline-flag regexes shared verbatim with the DuckDB oracle (RE2-safe:
# non-greedy + (?is) flags, no backreferences).  Script/style/noscript
# strip one element-kind per pass — RE2 has no backreferences to pair
# `<script>` with its own closer, and a combined alternation would let
# `<script>...</style>` match across kinds.
ELEMENT_STRIP_RES = (
    "(?is)<script[^>]*>.*?</script>",
    "(?is)<style[^>]*>.*?</style>",
    "(?is)<noscript[^>]*>.*?</noscript>",
    "(?s)<!--.*?-->",
)
BLOCK_CLOSE_RE = ("(?i)</(p|div|nav|footer|header|li|h[1-6]|section"
                  "|article|aside|ul|ol|table|tr|td|blockquote)>")
TAG_RE = "<[^>]*>"
LINK_RE = "(?is)<a[^>]*>(.*?)</a>"
_SENTINEL = "\x01"


def _plain(seg: Column) -> Column:
    """Tag-stripped, whitespace-collapsed, trimmed text of a segment."""
    return F.trim(F.regexp_replace(
        F.regexp_replace(seg, TAG_RE, " "), r"\s+", " "))


def _link_len(seg: Column) -> Column:
    """Character count of the (tag-stripped) text inside <a> elements."""
    anchor_text = F.array_join(
        F.regexp_extract_all(seg, F.lit(LINK_RE), 1), "")
    # coalesce mirrors the DuckDB oracle, whose regexp_extract_all
    # yields NULL (not an empty list) on zero matches — a NULL link_len
    # would null out the keep predicate and silently drop the segment.
    return F.coalesce(
        F.length(F.regexp_replace(anchor_text, TAG_RE, "")), F.lit(0))


def html_segments(html: Column | str) -> Column:
    """``array<struct<plain,plain_len,link_len>>`` of block segments."""
    c = F.col(html) if isinstance(html, str) else html
    for pat in ELEMENT_STRIP_RES:
        c = F.regexp_replace(c, pat, "")
    c = F.regexp_replace(c, BLOCK_CLOSE_RE, _SENTINEL)
    # Two nested transforms so the regex-heavy _plain runs ONCE per
    # segment: higher-order lambdas get no common-subexpression
    # elimination, and plain feeds both the text and its length —
    # inlining it twice would double the dominant regex cost of the
    # scan-projection hot path (round-9 review finding).
    raw = F.transform(
        F.split(c, _SENTINEL),
        lambda s: F.struct(
            _plain(s).alias("plain"),
            _link_len(s).alias("link_len"),
        ),
    )
    return F.transform(
        raw,
        lambda p: F.struct(
            p["plain"].alias("plain"),
            F.length(p["plain"]).alias("plain_len"),
            p["link_len"].alias("link_len"),
        ),
    )


def extract_main_text(html: Column | str, min_len: int = 30,
                      max_link_density: float = 0.3) -> Column:
    """``struct<extracted_text,n_kept,n_dropped,extracted_chars>``.

    ``n_dropped`` counts only segments that HAD text (empty splits are
    markup residue, not dropped content).  The density threshold is
    evaluated as ``link_len * den <= plain_len * num`` with num/den the
    exact rational form of ``max_link_density`` — exact integer
    arithmetic both engines at ANY decimal threshold (round-9 review
    finding: the previous tenths quantization turned 0.25 into 0.2 and
    0.05 into 0, the latter dropping every segment containing a link).
    """
    frac = Fraction(str(max_link_density)).limit_denominator(10_000)
    num, den = frac.numerator, frac.denominator
    segs = html_segments(html)
    nonempty = F.filter(segs, lambda p: p["plain_len"] > 0)
    kept = F.filter(
        nonempty,
        lambda p: (p["plain_len"] >= F.lit(min_len))
        & (p["link_len"] * den <= p["plain_len"] * num),
    )
    text = F.array_join(F.transform(kept, lambda p: p["plain"]), " ")
    return F.struct(
        text.alias("extracted_text"),
        F.size(kept).alias("n_kept"),
        (F.size(nonempty) - F.size(kept)).alias("n_dropped"),
        F.length(text).alias("extracted_chars"),
    )
