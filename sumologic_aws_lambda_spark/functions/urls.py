"""URL canonicalization — the stage-0 of web-crawl curation pipelines.

C4 / RefinedWeb / FineWeb all dedup by CANONICAL URL before any content
pass (Raffel et al. 2020 §2.2; Penedo et al. 2023 §3.1): two fetches of
``HTTPS://WWW.Example.com:443/a/?utm_source=x`` and
``https://example.com/a`` are the same page, and collapsing them first
removes the cheapest duplicate class without touching document text.
The reference's own URL handling stops at percent-decoding S3 keys
(``s3/node.js/s3.js:83`` — implemented as P15 ``url_decode_keys``);
this module adds the normalization layer above it.

Everything here is a PURE COLUMN EXPRESSION — no UDFs, no Python in the
hot path: at 100 TB the canonicalizer runs inside whole-stage codegen on
the scan projection, and the subsequent URL-key dedup is one partial-agg
shuffle on the canonical string (see ``queries/curation.py::
url_canonical_dedup``).

Canonical form (each rule deterministic and order-independent):

1. scheme and host lowercase; userinfo (``user@``) stripped,
2. leading ``www.`` stripped from the host,
3. default ports dropped (``:80`` for http, ``:443`` for https); any
   other explicit port is KEPT (a different port is a different origin),
4. fragment dropped (never sent to the server),
5. tracking parameters dropped — ``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid``, ``mc_cid``, ``mc_eid``, ``igshid``, ``ref`` — the
   standard click-attribution set none of which select content,
6. surviving query parameters sorted lexicographically (param order is
   semantically irrelevant; sorting makes the key stable),
7. empty path normalized to ``/``; a single trailing slash stripped
   from non-root paths.

Scheme is NOT merged (http:// and https:// stay distinct keys — they
can serve different content) and percent-encoding is left untouched
(decoding can only merge keys unsafely, e.g. ``%2F`` vs ``/``).
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..colnames import fresh_prefix

# One alternation shared verbatim by the Spark expression and the DuckDB
# oracles (RE2-safe: no backreferences, no lookaround).  Matches a whole
# `key=value` token whose key is a tracking parameter; `(=|$)` also
# drops a bare valueless `utm_source`.
TRACKING_PARAM_RE = (
    "^(utm_[^=&]*|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid|ref)(=|$)"
)

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_PORT_RE = ":([0-9]+)$"


def canonicalize_url(url: Column | str) -> Column:
    """Canonical URL as a single whole-stage-codegen column expression.

    Input must be an absolute URL (``scheme://...``); anything that
    does not parse a scheme canonicalizes to NULL so malformed rows are
    filterable rather than silently self-keyed.
    """
    raw = F.col(url) if isinstance(url, str) else url
    # fragment first: '#...' never reaches the server, and stripping it
    # up front keeps a '?' inside a fragment from reading as a query
    # (Spark substring_index == DuckDB split_part, both "whole string
    # when separator absent").
    u = F.substring_index(F.trim(raw), "#", 1)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    authority = F.regexp_extract(u, _AUTHORITY_RE, 1)
    # strip userinfo: everything up to the LAST '@' in the authority
    hostport = F.element_at(F.split(authority, "@"), -1)
    port = F.regexp_extract(hostport, _PORT_RE, 1)
    # host = hostport minus ':port' suffix (substring arithmetic, no
    # regexp_replace: Spark's `$1` vs DuckDB's `\1` replacement syntax
    # diverge, so the oracles mirror this same substring form).
    host = F.lower(
        F.when(port != "",
               hostport.substr(
                   F.lit(1),
                   F.length(hostport) - F.length(port) - 1))
        .otherwise(hostport))
    host = F.when(host.startswith("www."),
                  host.substr(F.lit(5), F.length(host))) \
        .otherwise(host)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (path != "/") & path.endswith("/"),
        path.substr(F.lit(1), F.length(path) - 1)
    ).otherwise(path)
    query = F.regexp_extract(u, _QUERY_RE, 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    qpart = F.array_join(F.sort_array(params), "&")
    canonical = F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qpart != "", F.concat(F.lit("?"), qpart))
        .otherwise(F.lit("")),
    )
    return F.when(scheme != "", canonical)


def with_canonical_url(df, url: Column | str,
                       out_col: str = "canonical_url",
                       keep: tuple[str, ...] | None = None,
                       drop_malformed: bool = False):
    """Staged-projection form of :func:`canonicalize_url` for DataFrame
    pipelines — same canonical output, evaluated ONCE per row.

    The single-Column form inlines its whole parse tree into every
    reference: the fragment-stripped url feeds five component extracts,
    each re-inlining the (possibly expensive) source expression, and a
    downstream ``filter(isNotNull)`` duplicates the entire tree again
    via predicate pushdown — the funnel front end measured a 114 KB
    physical plan with the same ``regexp_extract`` repeated 105 times
    (round-14 optimization, guide §4.4's duplication problem applied to
    plain expressions).  Staging each layer as its own projection binds
    the pieces to attributes: Catalyst's CollapseProject declines to
    merge because every staged alias is non-cheap and multiply
    referenced (the ``with_word_ngrams`` mechanism), so the fixture/url
    expression, the fragment strip, and each component regex run
    exactly once per row and the codegen stays small.

    ``keep`` — columns to carry through (default: all of ``df``'s).
    Returns ``keep + [out_col]``; NULL semantics identical to
    :func:`canonicalize_url` (no scheme → NULL).

    ``drop_malformed=True`` filters NULL-canonical rows HERE, on the
    staged scheme column, instead of the caller's
    ``filter(out.isNotNull())`` — which predicate pushdown would
    rewrite by substituting the ENTIRE canonical tree back into a
    scan-level Filter (measured: a 63 KB filter condition evaluating
    the full parse a second time per row).  Equivalent by
    construction: the output is NULL iff the scheme extract is ''
    (every other component coalesces to a non-NULL string for
    non-NULL input, and NULL input yields a NULL scheme which also
    fails ``!= ''``).
    """
    src = F.col(url) if isinstance(url, str) else url
    cols = list(keep) if keep is not None else list(df.columns)
    p = fresh_prefix(df.columns, "_cu", out_col)
    c_u, c_sch = f"{p}_u", f"{p}_scheme"
    c_hp, c_po = f"{p}_hostport", f"{p}_port"
    c_pa, c_q = f"{p}_path", f"{p}_query"
    staged = (
        df.select(*cols, F.substring_index(F.trim(src), "#", 1).alias(c_u))
        .select(
            *cols,
            F.lower(F.regexp_extract(c_u, _SCHEME_RE, 1)).alias(c_sch),
            # strip userinfo: everything up to the LAST '@'
            F.element_at(
                F.split(F.regexp_extract(c_u, _AUTHORITY_RE, 1), "@"), -1
            ).alias(c_hp),
            F.regexp_extract(c_u, _PATH_RE, 1).alias(c_pa),
            F.regexp_extract(c_u, _QUERY_RE, 1).alias(c_q),
        )
        .select(
            *cols, c_sch, c_hp, c_pa, c_q,
            F.regexp_extract(c_hp, _PORT_RE, 1).alias(c_po),
        )
    )
    scheme, hostport = F.col(c_sch), F.col(c_hp)
    port, path, query = F.col(c_po), F.col(c_pa), F.col(c_q)
    if drop_malformed:
        # pushdown now carries only the scheme-extract chain (one
        # regexp over the staged url) down to the scan, not the whole
        # canonical expression
        staged = staged.filter(scheme != "")
    host = F.lower(
        F.when(port != "",
               hostport.substr(
                   F.lit(1),
                   F.length(hostport) - F.length(port) - 1))
        .otherwise(hostport))
    host = F.when(host.startswith("www."),
                  host.substr(F.lit(5), F.length(host))) \
        .otherwise(host)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (path != "/") & path.endswith("/"),
        path.substr(F.lit(1), F.length(path) - 1)
    ).otherwise(path)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    qpart = F.array_join(F.sort_array(params), "&")
    canonical = F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qpart != "", F.concat(F.lit("?"), qpart))
        .otherwise(F.lit("")),
    )
    return staged.select(
        *cols, F.when(scheme != "", canonical).alias(out_col))


# Compact public-suffix approximation: two-label suffixes under which
# the REGISTERED domain needs three labels (news.bbc.co.uk → bbc.co.uk,
# not co.uk).  The full Public Suffix List is ~9k rules and changes
# monthly — production swaps this tuple for a broadcast lookup of the
# real PSL; the expression shape below (suffix test + label slice) is
# unchanged.  This subset covers the high-volume crawl ccTLDs.
MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br",
    "co.in", "net.in", "org.in",
    "co.nz", "com.cn", "net.cn", "org.cn",
    "com.mx", "com.ar", "com.tr", "co.za", "co.kr",
)


# Deepest EXACT/exception rule the PSL path supports (labels).  The
# published list's deepest current rules are 5-label private-section
# entries; 6 leaves headroom, and deeper rules still raise loudly.
_MAX_EXACT = 6


def registered_domain(host: Column | str) -> Column:
    """Registered (a.k.a. pay-level) domain of a hostname — the key
    web-curation pipelines actually cap and dedup on (RefinedWeb §3.1
    caps per REGISTERED domain: ``cdn1.example.co.uk`` and
    ``www.example.co.uk`` are one publisher, ``example.co.uk``; a raw
    host key would let one publisher dominate through subdomain
    sharding).

    Pure column expression: normalize (lowercase, strip ALL trailing
    FQDN dots), then split the host on dots and keep the last two
    labels — or three when the two-label tail is a known multi-label
    public suffix.  IPv4-literal hosts return unchanged (octets are
    not labels: folding 192.168.7.9 to "7.9" would merge unrelated
    IP-hosted sites under one publisher key).  Hosts with fewer labels
    than needed pass through unchanged; NULL stays NULL.
    """
    raw = F.col(host) if isinstance(host, str) else host
    h, labels, n, tails, is_ipv4 = _host_label_parts(raw)
    is_multi = tails[2].isin(*MULTI_LABEL_SUFFIXES)
    return (
        F.when(h.isNull(), F.lit(None).cast("string"))
        .when(is_ipv4, h)
        .when(is_multi & (n >= 3), tails[3])
        .when(~is_multi & (n >= 2), tails[2])
        .otherwise(h)
    )


def _host_label_parts(raw: Column):
    """Shared normalize/label-slice block of the registered-domain
    paths (literal tuple AND broadcast PSL) — ONE place, so a
    normalization fix can never land in one path and not the other
    (the round-9 trailing-dot and lowercase fixes both lived here).

    Returns ``(h, labels, n, tails, is_ipv4)`` where ``tails[k]`` is
    the last-``k``-labels string for k = 1..7.  Normalization: lower
    (an uppercase .CO.UK host would miss the suffix set — round-9
    third-pass review) and strip ALL trailing FQDN dots (a doubled
    'example.com..' kept one dot after a single strip and folded every
    such malformed host into one per-TLD key — round-9 fourth-pass
    review; the replacement is a plain '', no backreference
    portability concern).  ``try_element_at``, not ``element_at``:
    ANSI mode throws on out-of-range negative indexes and when()
    evaluates every branch (repo rule 7) — a single-label host would
    otherwise kill the task; ``concat_ws`` skips the NULLs, so a
    ``tails[k]`` with fewer than k labels collapses to the full host
    (and can never equal a k-label rule, which carries k-1 dots).
    """
    h = F.regexp_replace(F.lower(raw), r"\.+$", "")
    labels = F.split(h, r"\.")
    n = F.size(labels)
    tails = {
        k: F.concat_ws(".", *[F.try_element_at(labels, F.lit(-i))
                              for i in range(k, 0, -1)])
        for k in range(1, 8)
    }
    is_ipv4 = h.rlike(r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$")
    return h, labels, n, tails, is_ipv4


def registered_domain_sql(host: str) -> str:
    """DuckDB scalar expression computing the SAME registered domain as
    :func:`registered_domain`, for oracle twins.  Inline (repeats the
    normalized-host subexpression) so it composes anywhere a scalar
    does; the suffix tuple interpolates from ``MULTI_LABEL_SUFFIXES``
    exactly like ``TRACKING_PARAM_RE`` does for the canonicalizer
    oracles.  ``host`` is a SQL expression string, evaluated once per
    occurrence — pass a column name, not a subquery.
    """
    h = f"regexp_replace(lower({host}), '\\.+$', '', 'g')"
    labels = f"string_split({h}, '.')"
    n = f"len({labels})"
    tail2 = (f"array_to_string(list_slice({labels}, "
             f"greatest({n} - 1, 1), {n}), '.')")
    tail3 = (f"array_to_string(list_slice({labels}, "
             f"greatest({n} - 2, 1), {n}), '.')")
    suffixes = ", ".join(f"'{s}'" for s in MULTI_LABEL_SUFFIXES)
    ipv4 = (f"regexp_matches({h}, "
            f"'^[0-9]{{1,3}}(\\.[0-9]{{1,3}}){{3}}$')")
    return (
        f"CASE WHEN {host} IS NULL THEN NULL "
        f"WHEN {ipv4} THEN {h} "
        f"WHEN {tail2} IN ({suffixes}) AND {n} >= 3 THEN {tail3} "
        f"WHEN NOT ({tail2} IN ({suffixes})) AND {n} >= 2 THEN {tail2} "
        f"ELSE {h} END"
    )


# Publication date of the VENDORED snapshot (the Debian `publicsuffix`
# 20230209 packaging of the upstream list) — update alongside the .dat
# file on refresh.  The upstream list changes roughly monthly; the
# loader warns when this date is older than _PSL_STALE_AFTER_DAYS so a
# deployment pinned to an aging snapshot finds out at load time, not
# from mis-keyed registered domains.  REFRESH PROCEDURE: download
# https://publicsuffix.org/list/public_suffix_list.dat verbatim (the
# loader accepts the published file format as-is — comments, section
# markers, IDN rules), replace data/public_suffix_list.dat, update this
# constant, and re-run tests/test_psl_snapshot.py (its rule-population
# pins will need the new counts).
PSL_SNAPSHOT_DATE = "2023-02-09"
_PSL_STALE_AFTER_DAYS = 365
_psl_stale_warned = False


def _warn_if_snapshot_stale() -> None:
    """One warning per process when the vendored snapshot is older
    than ``_PSL_STALE_AFTER_DAYS`` — only for the DEFAULT path (a
    caller supplying its own file owns its own freshness)."""
    global _psl_stale_warned
    if _psl_stale_warned:
        return
    _psl_stale_warned = True
    import datetime
    import warnings

    age = (datetime.date.today()
           - datetime.date.fromisoformat(PSL_SNAPSHOT_DATE)).days
    if age > _PSL_STALE_AFTER_DAYS:
        warnings.warn(
            f"vendored Public Suffix List snapshot is {age} days old "
            f"(published {PSL_SNAPSHOT_DATE}); the upstream list "
            f"changes monthly — refresh data/public_suffix_list.dat "
            f"(see functions/urls.py::PSL_SNAPSHOT_DATE for the "
            f"procedure) or registered-domain keying may drift from "
            f"current suffix rules",
            stacklevel=3)


def load_psl_file(path: str | None = None) -> tuple[str, ...]:
    """Raw lines of a Public Suffix List snapshot in the published file
    format (publicsuffix.org/list) — comments, blanks, section markers
    and all; :func:`psl_rule_tiers` does the normalization.  The default
    is the VENDORED full snapshot at ``data/public_suffix_list.dat``
    (the Debian ``publicsuffix`` 20230209 packaging of the upstream
    list — public data, MPL 2.0, license header kept in the file):
    9,506 rules — 1,480 bare TLDs, 5,473/2,302/70/66 exact rules of
    2/3/4/5 labels, 107 wildcards, 8 exceptions, 466 IDN rules — so
    the broadcast tier-join path is exercised at REAL rule counts, not
    fixture ones (tests/test_psl_snapshot.py pins these populations).
    Cached per (path, mtime, size): the streaming cap sinks resolve
    the default key per micro-batch, and re-reading + re-hashing the
    9.5k-line file every trigger was measurable fixed cost (round-12
    ADVICE); keying the cache on the stat signature (not the path
    alone) keeps a rewritten file from serving stale rules.  The
    default-path load warns once per process when the vendored
    snapshot is stale (see ``PSL_SNAPSHOT_DATE`` for the refresh
    procedure).
    """
    if path is None:
        _warn_if_snapshot_stale()
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data", "public_suffix_list.dat")
    st = os.stat(path)
    return _load_psl_cached(path, st.st_mtime_ns, st.st_size)


@lru_cache(maxsize=8)
def _load_psl_cached(path: str, _mtime_ns: int,
                     _size: int) -> tuple[str, ...]:
    """Cache body of :func:`load_psl_file` (see its docstring)."""
    with open(path, encoding="utf-8") as fh:
        return tuple(fh.read().splitlines())


def psl_rule_tiers(suffix_rows=None):
    """Normalize, validate and tier a public-suffix rule set — the ONE
    rule-loading path shared by the Spark broadcast-join form
    (:func:`with_registered_domain_psl`) and the DuckDB oracle
    generator (:func:`registered_domain_psl_sql`), so the two sides of
    the hash gate provably load the same rules.

    Returns ``(tiers, wtiers, etiers)``: exact rules keyed by label
    count (2..6 — 1-label exacts are accepted and dropped, identical
    to the implicit default), wildcard BODIES keyed by body label count
    (1..5), exception NAMES keyed by label count (2..6); every key
    present, possibly empty, values sorted.  The bounds are
    ``_MAX_EXACT`` = 6 (a plain literal docstring, so ``__doc__``
    survives — round-11 ADVICE: the old ``'...' % (...)`` form was an
    expression statement, not a docstring).  Grammar, file-format
    normalization (comments, whitespace, case, FQDN dots, IDNA) and the
    raise-on-malformed rules are documented on
    :func:`with_registered_domain_psl`.

    Results are cached per distinct rule tuple (the full vendored
    snapshot normalizes ~9.5k rules — per-micro-batch callers like the
    streaming cap sinks must not re-parse it every trigger).  Treat the
    returned dicts as immutable: they are shared across callers.
    """
    if suffix_rows is None:
        rows = MULTI_LABEL_SUFFIXES
    elif isinstance(suffix_rows, tuple) and all(
            isinstance(r, str) for r in suffix_rows):
        rows = suffix_rows  # already the canonical hashable form
    else:
        # Normalize ANY other iterable — including a tuple holding
        # non-str (possibly unhashable) elements — so malformed rules
        # hit this function's own validation, not functools' opaque
        # "unhashable type" TypeError (round-13 ADVICE residue).
        rows = tuple(str(r) for r in suffix_rows)
    return _psl_rule_tiers_cached(rows)


@lru_cache(maxsize=8)
def _psl_rule_tiers_cached(suffix_rows: tuple):
    """Cache body of :func:`psl_rule_tiers` (see its docstring)."""

    def _to_ascii(s: str) -> str:
        # the published list writes IDN rules in UNICODE (U-label)
        # form while crawl hosts carry punycode — an un-encoded rule
        # would silently never match (round-10 tenth-pass review).
        # The stdlib codec is IDNA2003; the handful of rules where
        # IDNA2008 differs must be pre-encoded by the caller.
        if s.isascii():
            return s
        prefix, body = "", s
        if s.startswith("!"):
            prefix, body = "!", s[1:]
        elif s.startswith("*."):
            prefix, body = "*.", s[2:]
        try:
            return prefix + ".".join(
                lab if lab.isascii()
                else lab.encode("idna").decode("ascii")
                for lab in body.split("."))
        except UnicodeError as e:
            raise ValueError(
                f"cannot IDNA-encode PSL rule {s!r}: {e}") from e

    norm = set()
    for r in suffix_rows:
        s = str(r).strip()
        if not s or s.startswith("//"):
            continue
        s = s.split()[0].lower().strip(".")
        if s:
            norm.add(_to_ascii(s))
    rules = sorted(norm)
    if not rules:
        raise ValueError(
            "empty public-suffix rule set — refusing to fall back to "
            "the fixture tuple; pass suffix_rows=None for the default")
    exceptions = [r[1:] for r in rules if r.startswith("!")]
    wildcards = [r[2:] for r in rules
                 if r.startswith("*.") and not r.startswith("!")]
    exact = [r for r in rules
             if not r.startswith("!") and not r.startswith("*")]
    bad = (
        [r for r in rules if r == "*" or
         (r.startswith("*") and not r.startswith("*."))]
        + ["*." + x for x in wildcards if "*" in x]
        + ["!" + y for y in exceptions if "*" in y]
        + [r for r in exact if "*" in r]
    )
    if bad:
        raise ValueError(
            f"PSL rules outside the supported grammar (got "
            f"{bad[:3]}...): wildcards only as a leading '*.' label, "
            f"exceptions only as '!' + an exact name")

    # a rule BODY with an empty label ('co..uk', and '!.ck'/'*..ck',
    # whose '!'/'*.' prefix shields a leading dot from the outer
    # strip) or URL-ish characters can never equal any dot-split host
    # tail — silently loading it would mis-key every host under the
    # intended suffix, the exact failure these checks exist to raise on
    def _bad_labels(s: str) -> bool:
        # '!' and '*' in a BODY are typo'd metacharacters ('!!www.ck')
        # that would otherwise load as never-matching rules
        return (not s or s.startswith(".") or s.endswith(".")
                or ".." in s or any(ch in s for ch in ":/@?#!*'\""))

    broken = (
        [r for r in exact if _bad_labels(r)]
        + ["*." + x for x in wildcards if _bad_labels(x)]
        + ["!" + y for y in exceptions if _bad_labels(y)]
    )
    if broken:
        raise ValueError(
            f"PSL rules with empty labels or invalid characters (got "
            f"{broken[:3]}...) can never match a host — fix the rule "
            f"source")
    deep = (
        [r for r in exact if r.count(".") > _MAX_EXACT - 1]
        + ["*." + x for x in wildcards
           if x.count(".") > _MAX_EXACT - 2]
        + ["!" + y for y in exceptions
           if y.count(".") > _MAX_EXACT - 1 or y.count(".") < 1]
    )
    if deep:
        raise ValueError(
            f"PSL rules outside the supported label depths (got "
            f"{deep[:3]}...): exact 1-{_MAX_EXACT} labels, wildcard "
            f"bodies 1-{_MAX_EXACT - 1}, exceptions 2-{_MAX_EXACT}")
    tiers = {k: [r for r in exact if r.count(".") == k - 1]
             for k in range(2, _MAX_EXACT + 1)}
    wtiers = {j: [x for x in wildcards if x.count(".") == j - 1]
              for j in range(1, _MAX_EXACT)}
    etiers = {k: [y for y in exceptions if y.count(".") == k - 1]
              for k in range(2, _MAX_EXACT + 1)}
    return tiers, wtiers, etiers


def registered_domain_psl_sql(host: str, suffix_rows=None) -> str:
    """DuckDB scalar expression computing the SAME registered domain as
    :func:`with_registered_domain_psl` over the SAME rule set — the
    FULL-grammar oracle twin (exact rules of any loaded depth,
    wildcards with occupancy, exception precedence, implicit default,
    IPv4/short-host passthrough), where :func:`registered_domain_sql`
    twins only the fixture-tuple form.  The per-tier membership tests
    interpolate as IN-lists from :func:`psl_rule_tiers`, so both sides
    of the hash gate provably load one rule set; at the full vendored
    snapshot the expression carries ~9k quoted rules (~130 KB of SQL) —
    DuckDB parses it fine, and the size is the point: the gate runs at
    real rule counts.  ``host`` is a SQL expression string, evaluated
    once per occurrence — pass a column name, not a subquery.
    """
    tiers, wtiers, etiers = psl_rule_tiers(suffix_rows)
    h = f"regexp_replace(lower({host}), '\\.+$', '', 'g')"
    labels = f"string_split({h}, '.')"
    n = f"len({labels})"

    def tail(k: int) -> str:
        # last k labels; fewer than k collapses to the full host,
        # which can never equal a k-label rule (k-1 dots) — the same
        # contract as _host_label_parts' concat_ws(try_element_at)
        return (f"array_to_string(list_slice({labels}, "
                f"greatest({n} - {k - 1}, 1), {n}), '.')")

    def inlist(rs) -> str:
        return ", ".join(f"'{r}'" for r in rs)

    ipv4 = (f"regexp_matches({h}, "
            f"'^[0-9]{{1,3}}(\\.[0-9]{{1,3}}){{3}}$')")
    parts = [
        f"CASE WHEN {host} IS NULL THEN NULL",
        f"WHEN {ipv4} THEN {h}",
    ]
    # exception rules PREVAIL over every other match (PSL §Algorithm)
    for k in range(_MAX_EXACT, 1, -1):
        if etiers[k]:
            parts.append(
                f"WHEN {tail(k)} IN ({inlist(etiers[k])}) "
                f"THEN {tail(k)}")
    # then the LONGEST effective suffix wins; a k-label exact rule and
    # a (k-1)-label wildcard body both make the suffix k labels deep.
    # Wildcards additionally need the starred position OCCUPIED
    # (n >= k); the bare 'WHEN match THEN h' arm is the host-IS-suffix
    # passthrough (n = k exactly, see the Spark chain)
    for k in range(_MAX_EXACT, 1, -1):
        conds = []
        if tiers[k]:
            conds.append(f"{tail(k)} IN ({inlist(tiers[k])})")
        if wtiers[k - 1]:
            conds.append(
                f"({tail(k - 1)} IN ({inlist(wtiers[k - 1])}) "
                f"AND {n} >= {k})")
        if not conds:
            continue
        m = "(" + " OR ".join(conds) + ")"
        parts.append(f"WHEN {m} AND {n} >= {k + 1} THEN {tail(k + 1)}")
        parts.append(f"WHEN {m} THEN {h}")
    parts.append(f"WHEN {n} >= 2 THEN {tail(2)}")
    parts.append(f"ELSE {h} END")
    return " ".join(parts)


def with_registered_domain_psl(df, host_col: str,
                               out_col: str = "registered_domain",
                               suffix_rows=None,
                               max_inline_rules: int = 128):
    """Production-path registered domain: the public-suffix set as
    BROADCAST-joined lookup tables instead of the literal ``isin``
    tuple — the real Public Suffix List is ~9k rules and changes
    monthly, which belongs in data, not code.  The normalize /
    label-slice block is SHARED with :func:`registered_domain`
    (``_host_label_parts``); the membership test is per-tier: tiers
    bigger than ``max_inline_rules`` (the full snapshot's 5,473
    2-label and 2,302 3-label exact tiers) probe broadcast hash joins
    (build side = the rules of that depth, zero shuffles of the fact
    side), while small tiers stay codegen'd set membership — a
    broadcast exchange has ~0.2 s fixed build latency per tier, which
    dominates when the tier holds a handful of rules (round-12
    funnel-bench measurement).

    Rule support — the FULL PSL rule grammar (PSL §Algorithm):
    - exact rules of 1–6 labels: a matching k-label rule makes the
      registered domain the last k+1 labels (1-label rules are
      accepted and dropped — identical to the implicit default);
    - wildcard rules ``*.X`` (X of 1–5 labels): any label in the
      starred position is part of the public suffix, so the
      registered domain is the last len(X)+2 labels;
    - exception rules ``!Y`` (Y of 2–6 labels): Y is NOT a public
      suffix despite a covering wildcard — the registered domain of
      any host under Y is Y itself.  An exception rule PREVAILS over
      every other matching rule; otherwise the longest effective
      suffix wins.  Unlisted TLDs get the implicit 1-label default
      (registered = last 2 labels); a host that IS a public suffix
      passes through unchanged.
    Rules outside that grammar (deeper labels, inner ``*``, bare
    ``*``, 1-label exceptions) raise — a silent skip would mis-key
    every host under them.  Duplicate rules are collapsed (a doubled
    rule must not fan out fact rows through the joins).

    ``suffix_rows`` defaults to ``MULTI_LABEL_SUFFIXES`` so the two
    forms are provably interchangeable (tests/test_urls.py pins the
    agreement); an explicitly passed EMPTY rule set raises rather than
    silently falling back to the fixture tuple (an empty-parse PSL
    file must not fake production keys).

    Normalization per the PSL FILE FORMAT (publicsuffix.org/list) —
    skip comment ('//') and blank lines, read each line up to the
    first whitespace, lowercase, strip leading/trailing dots
    (an FQDN-style 'co.uk.' would classify as a 3-label rule and
    silently never match the dot-stripped hosts), IDNA-encode unicode
    rules — lives in :func:`psl_rule_tiers`, SHARED with the DuckDB
    oracle generator :func:`registered_domain_psl_sql` (round-10
    second/fifth/seventh/tenth-pass reviews; one loader, so a
    normalization fix can never fork the two sides of the hash gate).
    """
    tiers, wtiers, etiers = psl_rule_tiers(suffix_rows)
    spark = df.sparkSession
    # collision-proof internal names: a user column literally named
    # _psl_h / _psl_s2 / ... must survive untouched (round-10
    # third-pass review — same reserved-name class as the sink's
    # 'key' fix), so extend the prefix until it shadows nothing
    # out_col participates in the scan too: an out_col equal to an
    # internal staged name would be dropped by the final drop(),
    # silently returning a frame with no result column (round-10
    # fourth-pass review)
    u = fresh_prefix(df.columns, "_psl", out_col)
    raw = F.col(host_col)
    h, labels, n, tails, is_ipv4 = _host_label_parts(raw)
    # STAGE the normalized host pieces as materialized columns before
    # the tier joins: join-condition expressions are re-evaluated per
    # operator (Catalyst CSE does not cross operator boundaries), so
    # joining on the raw expressions would recompute the regex-heavy
    # normalization once per tier per fact row — the with_word_ngrams
    # staging lesson applied here (round-10 third-pass review)
    # ... and stage ONLY the tails the loaded rule set can reference
    # (the default 2-label tuple needs t2/t3 — computing all seven
    # per fact row would waste per-row work on the hot path; round-10
    # tenth-pass review): each populated tier probes tails[k] and can
    # emit tails[k+1] (exact/exception k; wildcard body j acts at
    # k = j+1), and the implicit default always needs tails[2].
    need = {2}
    for k, rs in tiers.items():
        if rs:
            need |= {k, k + 1}
    for j, rs in wtiers.items():
        if rs:
            need |= {j, j + 2}
    for k, rs in etiers.items():
        if rs:
            need.add(k)
    staged_cols = {f"{u}_h": h, f"{u}_n": n, f"{u}_ip": is_ipv4}
    for k in sorted(need):
        staged_cols[f"{u}_t{k}"] = tails[k]
    joined = df.select(
        "*", *[c.alias(name) for name, c in staged_cols.items()])
    sh = F.col(f"{u}_h")
    sn = F.col(f"{u}_n")
    st = {k: F.col(f"{u}_t{k}") for k in need}

    def _tier_join(frame, tier_map, name):
        out = {}
        for k, tier_rules in tier_map.items():
            if not tier_rules:
                out[k] = F.lit(False)
                continue
            if len(tier_rules) <= max_inline_rules:
                # small tier → codegen'd set membership, no join: a
                # broadcast exchange costs ~0.2-0.3 s of fixed build
                # latency PER TIER regardless of size, and 8 of the
                # full snapshot's 10 tiers hold ≤ 70 rules — paying
                # ten exchange latencies to probe a handful of
                # literals tripled the crawl funnels' bench time
                # (round-12 measurement).  The two data-scale tiers
                # (5,473 and 2,302 exact rules) stay broadcast joins —
                # rule data belongs in tables, not plans.  Tails are
                # never NULL (concat_ws is total), so isin can't
                # NULL-poison the when() chain.
                out[k] = st[k].isin(*tier_rules)
                continue
            col = f"{u}_{name}{k}"
            # per-session tier-DataFrame cache: converting the 5.5k
            # 2-label rules from Python per CALL dominates per-micro-
            # batch cost once the streaming sinks key on the full
            # snapshot (round-12).  The cached frame has a fixed
            # column name; the per-call collision-proof name is a
            # zero-cost alias on top.
            cache = spark.__dict__.setdefault("_psl_tier_df_cache", {})
            key = tuple(tier_rules)
            tier_df = cache.get(key)
            if tier_df is None:
                tier_df = spark.createDataFrame(
                    [(r,) for r in tier_rules], "_psl_rule string")
            cache[key] = tier_df
            frame = frame.join(
                F.broadcast(tier_df.select(
                    F.col("_psl_rule").alias(col))),
                st[k] == F.col(col), "left")
            out[k] = F.col(col).isNotNull()
        return frame, out

    # exact k-label rules probe tails[k]; wildcard bodies of j labels
    # probe tails[j] (the starred label is the j+1-th); exception
    # names of k labels probe tails[k]
    joined, matched = _tier_join(joined, tiers, "s")
    joined, wmatched = _tier_join(joined, wtiers, "w")
    joined, ematched = _tier_join(joined, etiers, "e")
    # PSL §Algorithm: a wildcard rule only matches when a label
    # OCCUPIES the starred position — a host EQUAL to the wildcard
    # body must fall through to the other rules / the implicit
    # default, not read as being inside the wildcard zone (round-10
    # fifth-pass review: '*.compute.example' must not make the bare
    # host 'compute.example' its own registered domain)
    wmatched = {j: m & (sn >= j + 1) for j, m in wmatched.items()}
    reg = (
        F.when(sh.isNull(), F.lit(None).cast("string"))
        .when(F.col(f"{u}_ip"), sh)
    )
    # an exception rule PREVAILS over every other match: Y is
    # registrable despite the covering wildcard, so the registered
    # domain of anything at-or-under Y is Y itself.  Empty tiers are
    # skipped entirely — their match flags are literal False and their
    # tails were never staged.
    for k in range(_MAX_EXACT, 1, -1):
        if etiers[k]:
            reg = reg.when(ematched[k], st[k])
    # otherwise the LONGEST effective suffix wins: exact k-label rules
    # and wildcards with (k-1)-label bodies both make the public
    # suffix k labels deep → registered = last k+1 (a host no deeper
    # than the suffix passes through unchanged)
    for k in range(_MAX_EXACT, 1, -1):
        has_exact = bool(tiers[k])
        has_wild = bool(wtiers[k - 1])
        if not has_exact and not has_wild:
            continue
        m = matched[k] | wmatched[k - 1]
        reg = reg.when(m & (sn >= k + 1), st[k + 1]).when(m, sh)
    reg = reg.when(sn >= 2, st[2]).otherwise(sh)
    return joined.withColumn(out_col, reg).drop(
        *staged_cols,
        *[f"{u}_s{k}" for k in tiers],
        *[f"{u}_w{j}" for j in wtiers],
        *[f"{u}_e{k}" for k in etiers])
