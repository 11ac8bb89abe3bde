"""URL canonicalization (functions/urls.py) — edge semantics the
driver's value-hash compare can't isolate: each rule gets a hand-built
case, plus the funnel composition (URL dedup as the pre-quality stage
of the curation pipeline)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sumologic_aws_lambda_spark.functions.urls import canonicalize_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in
            df.select(canonicalize_url("url").alias("c")).collect()]


def test_variant_class_collapses_to_one_key(spark):
    variants = [
        "HTTPS://WWW.Example.COM:443/articles/7/?utm_source=feed"
        "&utm_campaign=x&id=3#section-2",
        "https://example.com/articles/7?id=3&gclid=abc123",
        "https://crawler@example.com:443/articles/7/?fbclid=zzz&id=3",
        "https://EXAMPLE.com:443/articles/7?ref=tw&id=3",
        "https://www.example.com/articles/7/?id=3&utm_medium=email",
    ]
    got = set(_canon(spark, variants))
    assert got == {"https://example.com/articles/7?id=3"}


@pytest.mark.parametrize("url,expect", [
    # default ports strip per scheme; non-default ports are KEPT
    ("http://example.com:80/x", "http://example.com/x"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("http://example.com:8080/x/", "http://example.com:8080/x"),
    ("https://example.com:80/x", "https://example.com:80/x"),
    # empty path -> '/', root slash survives
    ("https://Example.com", "https://example.com/"),
    ("https://example.com/", "https://example.com/"),
    # '?' inside a fragment is NOT a query
    ("https://example.com/#?fake=1", "https://example.com/"),
    # params sort; empty and valueless-tracking tokens drop
    ("https://example.com/a?b=2&a=1&utm_x&", "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?utm_source=x", "https://example.com/a"),
    # 'ref' is tracking; 'referrer_id' is NOT (prefix must not over-match)
    ("https://example.com/a?ref=tw&referrer_id=9",
     "https://example.com/a?referrer_id=9"),
    # scheme stays distinct; case folds
    ("HTTP://EXAMPLE.COM/A", "http://example.com/A"),
    # percent-encoding untouched
    ("https://example.com/a%2Fb?x=%20", "https://example.com/a%2Fb?x=%20"),
])
def test_canonical_rules(spark, url, expect):
    assert _canon(spark, [url]) == [expect]


def test_malformed_urls_canonicalize_to_null(spark):
    got = _canon(spark, ["not a url", "", "   ", "www.example.com/x",
                         "://missing-scheme"])
    assert got == [None] * 5


def test_url_dedup_is_pre_quality_funnel_stage(spark):
    """Funnel composition: canonical-URL dedup runs BEFORE any content
    pass — the kept set must be one doc per canonical key (keeper =
    min doc_id), and the quality stage sees only keepers."""
    docs = spark.createDataFrame(
        [(i,
          f"https://WWW.site.com:443/p/{i // 3}/?utm_source=x&v={i % 2}",
          "word " * (10 + i))
         for i in range(12)],
        "doc_id long, url string, text string")
    canon = docs.withColumn("canonical_url", canonicalize_url("url"))
    keepers = (
        canon.groupBy("canonical_url")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    kept = canon.join(keepers, ["canonical_url", "doc_id"])
    # 4 gid groups x 2 v-values = 8 canonical keys (v is a CONTENT
    # param and must survive canonicalization)
    assert kept.count() == 8
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert ids == [0, 1, 3, 4, 6, 7, 9, 10]
    # downstream quality stage consumes only keepers
    scored = kept.select(F.length("text").alias("n"))
    assert scored.count() == 8


def test_registered_domain_folds_subdomains_to_publisher(spark):
    """cdn/www subdomain sharding folds to one publisher key; known
    multi-label public suffixes keep three labels; bare or short hosts
    pass through; NULL stays NULL."""
    from sumologic_aws_lambda_spark.functions.urls import registered_domain

    cases = [
        ("cdn1.example.com", "example.com"),
        ("www.example.com", "example.com"),
        ("example.com", "example.com"),
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("bbc.co.uk", "bbc.co.uk"),
        ("co.uk", "co.uk"),              # suffix alone: pass-through
        ("deep.a.b.example.org", "example.org"),
        ("localhost", "localhost"),
        (None, None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [r["d"] for r in
           df.select(registered_domain("host").alias("d")).collect()]
    assert got == [e for _, e in cases]


def test_registered_domain_composes_with_canonicalizer(spark):
    """Domain caps keyed on registered_domain(canonical host) see one
    key per publisher across subdomain shards."""
    from pyspark.sql import functions as F

    from sumologic_aws_lambda_spark.functions.urls import (
        canonicalize_url,
        registered_domain,
    )

    urls = [f"https://cdn{i}.pub.co.uk/a/{i}" for i in range(4)] + \
           ["https://www.other.com/x"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    host = F.regexp_extract(canonicalize_url("url"),
                            "^https?://([^/:?#]+)", 1)
    got = (df.select(registered_domain(host).alias("dom"))
           .groupBy("dom").count().collect())
    assert {(r["dom"], r["count"]) for r in got} == {
        ("pub.co.uk", 4), ("other.com", 1)}


def test_registered_domain_normalizes_and_handles_ip_literals(spark):
    """Round-9 third-pass fixes: uppercase hosts fold correctly (the
    suffix test is on the normalized form), trailing FQDN dots strip,
    and IPv4-literal hosts return unchanged instead of merging under
    their last two octets."""
    from sumologic_aws_lambda_spark.functions.urls import registered_domain

    cases = [
        ("News.BBC.CO.UK", "bbc.co.uk"),
        ("CDN1.EXAMPLE.COM", "example.com"),
        ("example.com.", "example.com"),       # trailing FQDN dot
        ("example.com..", "example.com"),      # doubled trailing dots
        ("192.168.7.9", "192.168.7.9"),        # IPv4 literal: unchanged
        ("10.0.7.9", "10.0.7.9"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [r["d"] for r in
           df.select(registered_domain("host").alias("d")).collect()]
    assert got == [e for _, e in cases]


_TRICKY_HOSTS = [
    "news.bbc.co.uk", "WWW.Example.COM", "example.com..",
    "192.168.7.9", "localhost", "co.uk", "a.b.c.pub.com.au",
    None, "CDN0.Pub7.ORG.", "cdn1.example.com", "x.co.kr",
]


def test_registered_domain_sql_mirror_matches_spark(spark):
    """The DuckDB oracle expression (registered_domain_sql) and the
    Spark column expression agree host-for-host — the contract every
    registered-domain-keyed oracle pair depends on."""
    import duckdb

    from sumologic_aws_lambda_spark.functions.urls import (
        registered_domain,
        registered_domain_sql,
    )

    df = spark.createDataFrame([(h,) for h in _TRICKY_HOSTS],
                               "host string")
    got_spark = [r["d"] for r in df.select(
        registered_domain("host").alias("d")).collect()]
    vals = ", ".join("(NULL)" if h is None else f"('{h}')"
                     for h in _TRICKY_HOSTS)
    got_duck = [r[0] for r in duckdb.sql(
        f"SELECT {registered_domain_sql('host')} FROM "
        f"(VALUES {vals}) t(host)").fetchall()]
    assert got_spark == got_duck


def test_registered_domain_psl_lookup_agrees_with_literal(spark):
    """The broadcast-PSL production path and the literal-tuple fixture
    path compute identical registered domains (round-9 verdict item 7:
    the production swap is code, not a comment)."""
    from sumologic_aws_lambda_spark.functions.urls import (
        registered_domain,
        with_registered_domain_psl,
    )

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(_TRICKY_HOSTS)],
        "i int, host string")
    lit_rows = df.select(
        "i", registered_domain("host").alias("d")).collect()
    psl_rows = with_registered_domain_psl(df, "host", out_col="d") \
        .select("i", "d").collect()
    lit = {r["i"]: r["d"] for r in lit_rows}
    psl = {r["i"]: r["d"] for r in psl_rows}
    assert lit == psl
    # the lookup path must not drop or duplicate rows on the left join
    assert len(psl_rows) == len(_TRICKY_HOSTS)


def test_psl_lookup_multi_tier_rules_longest_match_wins(spark):
    """Round-10 review fix: the PSL path supports exact rules of 1-4
    labels with longest-match-wins, so real PSL rules like
    'schools.nsw.edu.au' key correctly instead of silently folding to
    the 2-label tier."""
    from sumologic_aws_lambda_spark.functions.urls import (
        with_registered_domain_psl,
    )

    rules = ["com", "co.uk", "nsw.edu.au", "schools.nsw.edu.au"]
    cases = [
        ("x.schools.nsw.edu.au", "x.schools.nsw.edu.au"),
        ("a.b.schools.nsw.edu.au", "b.schools.nsw.edu.au"),
        ("y.nsw.edu.au", "y.nsw.edu.au"),
        ("nsw.edu.au", "nsw.edu.au"),       # host IS a suffix
        ("schools.nsw.edu.au", "schools.nsw.edu.au"),
        ("cdn.example.co.uk", "example.co.uk"),
        ("www.example.com", "example.com"),  # 1-label rule == default
        ("plain.org", "plain.org"),          # unlisted TLD default
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)],
        "i int, host string")
    got = {r["i"]: r["d"] for r in with_registered_domain_psl(
        df, "host", out_col="d", suffix_rows=rules)
        .select("i", "d").collect()}
    assert got == {i: e for i, (_, e) in enumerate(cases)}


def test_psl_lookup_validates_rule_set(spark):
    """Empty or out-of-grammar rule sets raise instead of silently
    mis-keying (round-10 review findings); a duplicated rule must not
    fan out fact rows through the join."""
    from sumologic_aws_lambda_spark.functions.urls import (
        with_registered_domain_psl,
    )

    df = spark.createDataFrame([(1, "a.b.co.uk")], "i int, host string")
    with pytest.raises(ValueError, match="empty"):
        with_registered_domain_psl(df, "host", suffix_rows=[])
    with pytest.raises(ValueError, match="grammar"):
        with_registered_domain_psl(df, "host", suffix_rows=["*"])
    with pytest.raises(ValueError, match="grammar"):
        with_registered_domain_psl(df, "host", suffix_rows=["a.*.b"])
    with pytest.raises(ValueError, match="grammar"):
        with_registered_domain_psl(df, "host", suffix_rows=["*ck"])
    with pytest.raises(ValueError, match="depth"):
        with_registered_domain_psl(
            df, "host", suffix_rows=["a.b.c.d.e.f.g"])
    with pytest.raises(ValueError, match="depth"):
        with_registered_domain_psl(df, "host", suffix_rows=["!ck"])
    dup = with_registered_domain_psl(
        df, "host", out_col="d", suffix_rows=["co.uk", "co.uk"])
    rows = dup.collect()
    assert len(rows) == 1 and rows[0]["d"] == "b.co.uk"


def test_psl_lookup_wildcard_and_exception_rules(spark):
    """Full PSL §Algorithm semantics: wildcard rules widen the public
    suffix by one starred label; an exception rule prevails over the
    covering wildcard and makes its name registrable — the real PSL's
    canonical ck example."""
    from sumologic_aws_lambda_spark.functions.urls import (
        with_registered_domain_psl,
    )

    rules = ["com", "co.uk", "*.ck", "!www.ck", "*.compute.example"]
    cases = [
        # wildcard: b.ck is a public suffix, a.b.ck registrable
        ("a.b.ck", "a.b.ck"),
        ("x.a.b.ck", "a.b.ck"),
        ("b.ck", "b.ck"),              # IS a public suffix: pass-through
        ("ck", "ck"),                   # above the wildcard zone
        # exception prevails: www.ck registrable despite *.ck
        ("www.ck", "www.ck"),
        ("foo.www.ck", "www.ck"),
        ("a.foo.www.ck", "www.ck"),
        # 2-label wildcard body: z.compute.example is a public suffix
        ("bucket.z.compute.example", "bucket.z.compute.example"),
        ("x.bucket.z.compute.example", "bucket.z.compute.example"),
        ("z.compute.example", "z.compute.example"),  # pass-through
        # exact rules unaffected by the wildcard machinery
        ("cdn.example.co.uk", "example.co.uk"),
        ("www.example.com", "example.com"),
    ]
    df = spark.createDataFrame(
        [(i, hst) for i, (hst, _) in enumerate(cases)],
        "i int, host string")
    got = {r["i"]: r["d"] for r in with_registered_domain_psl(
        df, "host", out_col="d", suffix_rows=rules)
        .select("i", "d").collect()}
    assert got == {i: e for i, (_, e) in enumerate(cases)}


def test_psl_lookup_internal_names_do_not_shadow_user_columns(spark):
    """Round-10 third-pass fix: a user column named _psl_h / _psl_s2
    survives with_registered_domain_psl untouched."""
    from sumologic_aws_lambda_spark.functions.urls import (
        with_registered_domain_psl,
    )

    df = spark.createDataFrame(
        [("cdn.example.co.uk", "keepme", "metoo")],
        "host string, _psl_h string, _psl_s2 string")
    got = with_registered_domain_psl(df, "host", out_col="d")
    row = got.collect()[0]
    assert row["d"] == "example.co.uk"
    assert row["_psl_h"] == "keepme" and row["_psl_s2"] == "metoo"


def test_psl_lookup_out_col_may_use_internal_prefix(spark):
    """Round-10 fourth-pass fix: out_col equal to an internal staged
    name must not be dropped by the cleanup."""
    from sumologic_aws_lambda_spark.functions.urls import (
        with_registered_domain_psl,
    )

    df = spark.createDataFrame([("cdn.example.co.uk",)], "host string")
    got = with_registered_domain_psl(df, "host", out_col="_psl_h")
    assert got.columns == ["host", "_psl_h"]
    assert got.collect()[0]["_psl_h"] == "example.co.uk"


def test_psl_wildcard_requires_occupied_star_and_dot_rules_normalize(
        spark):
    """Round-10 fifth-pass fixes: a wildcard rule only matches when a
    label occupies the starred position (a host EQUAL to the body gets
    the implicit default), and FQDN-style dotted rules normalize
    instead of silently never matching."""
    from sumologic_aws_lambda_spark.functions.urls import (
        with_registered_domain_psl,
    )

    rules = ["*.edge.cdn.net", "co.uk."]  # trailing-dot rule
    cases = [
        ("edge.cdn.net", "cdn.net"),       # star NOT occupied: default
        ("x.edge.cdn.net", "x.edge.cdn.net"),  # IS a public suffix
        # registered = one label past the (occupied) wildcard suffix
        ("y.x.edge.cdn.net", "y.x.edge.cdn.net"),
        ("z.y.x.edge.cdn.net", "y.x.edge.cdn.net"),
        ("a.b.co.uk", "b.co.uk"),          # dotted rule still matches
    ]
    df = spark.createDataFrame(
        [(i, hst) for i, (hst, _) in enumerate(cases)],
        "i int, host string")
    got = {r["i"]: r["d"] for r in with_registered_domain_psl(
        df, "host", out_col="d", suffix_rows=rules)
        .select("i", "d").collect()}
    assert got == {i: e for i, (_, e) in enumerate(cases)}


def test_psl_file_format_lines_load_as_is(spark):
    """Round-10 seventh-pass fixes: raw publicsuffix.org file lines
    (comments, blanks, trailing annotations) load directly; rules with
    empty labels raise instead of silently never matching."""
    from sumologic_aws_lambda_spark.functions.urls import (
        with_registered_domain_psl,
    )

    raw_lines = [
        "// ===BEGIN ICANN DOMAINS===",
        "",
        "   ",
        "// see https://en.wikipedia.org/wiki/.uk for details",
        "co.uk",
        "*.ck   // annotated line reads to first whitespace",
        "!www.ck",
    ]
    df = spark.createDataFrame(
        [(0, "a.b.co.uk"), (1, "foo.www.ck")], "i int, host string")
    got = {r["i"]: r["d"] for r in with_registered_domain_psl(
        df, "host", out_col="d", suffix_rows=raw_lines)
        .select("i", "d").collect()}
    assert got == {0: "b.co.uk", 1: "www.ck"}
    with pytest.raises(ValueError, match="empty labels"):
        with_registered_domain_psl(df, "host", suffix_rows=["co..uk"])
    with pytest.raises(ValueError, match="empty labels"):
        with_registered_domain_psl(df, "host", suffix_rows=["*..ck"])


def test_psl_deep_exact_rules_and_dot_exception_validation(spark):
    """Round-10 eighth-pass fixes: real-PSL-depth exact rules (5-label
    private-section entries) load and key correctly, and an exception
    rule whose body has a leading dot raises instead of silently
    loading a never-matching rule."""
    from sumologic_aws_lambda_spark.functions.urls import (
        with_registered_domain_psl,
    )

    rules = ["com", "s3.dualstack.ap-northeast-1.amazonaws.com"]
    cases = [
        ("bucket.s3.dualstack.ap-northeast-1.amazonaws.com",
         "bucket.s3.dualstack.ap-northeast-1.amazonaws.com"),
        ("x.bucket.s3.dualstack.ap-northeast-1.amazonaws.com",
         "bucket.s3.dualstack.ap-northeast-1.amazonaws.com"),
        ("s3.dualstack.ap-northeast-1.amazonaws.com",
         "s3.dualstack.ap-northeast-1.amazonaws.com"),  # IS a suffix
        ("www.amazonaws.com", "amazonaws.com"),
    ]
    df = spark.createDataFrame(
        [(i, hst) for i, (hst, _) in enumerate(cases)],
        "i int, host string")
    got = {r["i"]: r["d"] for r in with_registered_domain_psl(
        df, "host", out_col="d", suffix_rows=rules)
        .select("i", "d").collect()}
    assert got == {i: e for i, (_, e) in enumerate(cases)}
    with pytest.raises(ValueError, match="empty labels"):
        with_registered_domain_psl(df, "host",
                                   suffix_rows=["!.ck", "*.ck"])


def test_psl_metacharacter_typo_in_body_raises(spark):
    """Round-10 ninth-pass fix: a typo'd double-bang exception
    ('!!www.ck') must raise instead of loading as a never-matching
    rule that silently loses the exception."""
    from sumologic_aws_lambda_spark.functions.urls import (
        with_registered_domain_psl,
    )

    df = spark.createDataFrame([(1, "foo.www.ck")], "i int, host string")
    with pytest.raises(ValueError, match="invalid characters"):
        with_registered_domain_psl(
            df, "host", suffix_rows=["*.ck", "!!www.ck"])


def test_psl_unicode_rules_idna_encode_on_load(spark):
    """Round-10 tenth-pass fix: the published list writes IDN rules in
    unicode; they must IDNA-encode on load so punycode crawl hosts
    match."""
    from sumologic_aws_lambda_spark.functions.urls import (
        with_registered_domain_psl,
    )

    df = spark.createDataFrame(
        [(0, "a.pub1.xn--55qx5d.cn"), (1, "b.pub2.xn--55qx5d.cn")],
        "i int, host string")
    got = {r["i"]: r["d"] for r in with_registered_domain_psl(
        df, "host", out_col="d", suffix_rows=["公司.cn"])
        .select("i", "d").collect()}
    # distinct publishers under the IDN suffix stay distinct
    assert got == {0: "pub1.xn--55qx5d.cn", 1: "pub2.xn--55qx5d.cn"}


def test_canonicalize_url_is_idempotent(spark):
    """canon(canon(u)) == canon(u) over a seeded 400-URL sweep of
    scheme/case/userinfo/port/path/tracking-param/fragment combinations
    — a canonical form that moves under its own rules would make the
    URL-dedup key unstable between a raw crawl and a re-crawl of
    already-canonical URLs."""
    import random

    random.seed(7)
    schemes = ["http", "https", "HTTPS", "ftp"]
    hostparts = ["WWW.Example.COM", "example.com", "a.b.co.uk",
                 "192.168.0.1", "x.org."]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a/b", "/a/b/", "/a%2Fb"]
    queries = ["", "?id=3", "?utm_source=x&id=3", "?b=2&a=1&ref=tw",
               "?utm_only"]
    frags = ["", "#sec", "#a=b"]
    urls = sorted({
        random.choice(schemes) + "://" + random.choice(["user@", ""])
        + random.choice(hostparts) + random.choice(ports)
        + random.choice(paths) + random.choice(queries)
        + random.choice(frags)
        for _ in range(400)})
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select("url", canonicalize_url("url").alias("c1"))
    twice = once.withColumn("c2", canonicalize_url(F.col("c1")))
    bad = twice.filter("c1 IS DISTINCT FROM c2").collect()
    assert bad == [], [(r.url, r.c1, r.c2) for r in bad[:5]]


def test_with_canonical_url_matches_column_form(spark):
    """The staged-projection form (round-14 optimization) must produce
    byte-identical canonicals to the single-Column form over the same
    combinatorial URL sweep — including malformed/NULL rows — and
    ``drop_malformed`` must drop exactly the NULL-canonical rows."""
    import random

    from sumologic_aws_lambda_spark.functions.urls import (
        with_canonical_url,
    )

    random.seed(11)
    schemes = ["http", "https", "HTTPS", "ftp", ""]
    hostparts = ["WWW.Example.COM", "example.com", "a.b.co.uk",
                 "192.168.0.1", "x.org.", ""]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a/b", "/a/b/", "/a%2Fb"]
    queries = ["", "?id=3", "?utm_source=x&id=3", "?b=2&a=1&ref=tw",
               "?utm_only"]
    frags = ["", "#sec", "#a=b"]
    urls = sorted({
        (random.choice(schemes) + "://" if random.choice([0, 1]) else "")
        + random.choice(["user@", ""]) + random.choice(hostparts)
        + random.choice(ports) + random.choice(paths)
        + random.choice(queries) + random.choice(frags)
        for _ in range(400)}) + ["", "no-scheme/path", None]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i int, url string")
    col_form = {r["i"]: r["c"] for r in df.select(
        "i", canonicalize_url("url").alias("c")).collect()}
    staged = {r["i"]: r["c"] for r in with_canonical_url(
        df, "url", out_col="c").collect()}
    assert staged == col_form
    dropped = with_canonical_url(df, "url", out_col="c",
                                 drop_malformed=True).collect()
    assert {r["i"] for r in dropped} == {
        i for i, c in col_form.items() if c is not None}
    assert all(r["c"] == col_form[r["i"]] for r in dropped)
