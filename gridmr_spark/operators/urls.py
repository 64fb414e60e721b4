"""URL canonicalization — the crawl-frontier stage between link
extraction (``operators/html.extract_links``) and fetch scheduling: messy
raw URLs in, one canonical form per resource out, so URL-level dedup and
per-host politeness keys are stable.

The reference has no crawl plane (text-only data plane,
cpp/worker/src/common/fs.cc:42-53); this operator exists for the repo's
north star — a Common-Crawl-shaped 100 TB pipeline, where URL dedup is
the FIRST dedup gate (cheaper than any content hash: it prunes refetches
before the bytes exist).

Same design rules as ``operators/html.py``:

1. **One shared spec, two renderers.** Every rule is rendered into both a
   Spark ``Column`` fold and the equivalent DuckDB SQL, so the hash
   oracle replays canonicalization bit-for-bit. Patterns stay inside the
   Java-and-RE2-common subset (no backreferences, no lookaround) and no
   replacement ever uses a capture group (Java ``$1`` vs RE2 ``\\1``
   would silently drift).
2. **Scale-shaped.** The canonicalizer is a per-row expression fold in
   whole-stage codegen: no UDF, no shuffle. The only shuffle a frontier
   needs is the group-by on the canonical key itself.

Rules (the conservative, loss-free subset every crawler agrees on):

- lowercase scheme and host; strip a trailing dot on the host
- drop the fragment
- drop the default port (http:80 / https:443); keep explicit others
- collapse duplicate slashes in the path; drop a trailing
  ``/index.html`` / ``/index.htm``; drop the trailing slash (root stays
  ``/``; an empty path becomes ``/``)
- drop tracking params (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``,
  ``ref``), sort the survivors, re-join

Deliberately NOT done (lossy, site-dependent): case-folding the path,
percent-decoding, www-stripping, scheme upgrades.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- shared patterns (Java + RE2 common subset) ---------------------------

_FRAGMENT = r"#.*"
_SCHEME = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOST = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)"
_PORT = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#:]*:([0-9]+)"
# greedy authority eats up to the first /?#; the group is the raw path
_PATH = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY = r"\?(.*)$"
_HOST_TRAILING_DOT = r"\.$"
_DUP_SLASHES = r"/{2,}"
_INDEX_FILE = r"/index\.html?$"
_TRACKING_PARAM = r"^(utm_[a-zA-Z0-9_]*|gclid|fbclid|msclkid|ref)="

_DEFAULT_PORTS = (("http", "80"), ("https", "443"))


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------

def _scheme(nofrag: Column) -> Column:
    return F.lower(F.regexp_extract(nofrag, _SCHEME, 1))


def url_host(url: Column) -> Column:
    """Lowercased host without port — the politeness / frontier key."""
    h = F.lower(F.regexp_extract(url, _HOST, 1))
    return F.regexp_replace(h, _HOST_TRAILING_DOT, "")


def _canon_port(nofrag: Column, scheme: Column) -> Column:
    port = F.regexp_extract(nofrag, _PORT, 1)
    is_default = F.lit(False)
    for s, p in _DEFAULT_PORTS:
        is_default = is_default | ((scheme == s) & (port == p))
    return F.when(
        (port == "") | is_default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))


def _canon_path(nofrag: Column) -> Column:
    p = F.regexp_extract(nofrag, _PATH, 1)
    p = F.regexp_replace(p, _DUP_SLASHES, "/")
    p = F.regexp_replace(p, _INDEX_FILE, "/")
    # trim both ends ('/' only ever leads AND trails), then restore the
    # lead — avoids a capture-group replacement; '' and '/' both → root
    stripped = F.btrim(p, F.lit("/"))
    return F.when(stripped == "", F.lit("/")).otherwise(
        F.concat(F.lit("/"), stripped)
    )


def _canon_query(nofrag: Column) -> Column:
    q = F.regexp_extract(nofrag, _QUERY, 1)
    params = F.filter(
        F.split(q, "&"),
        lambda x: (x != "") & ~x.rlike(_TRACKING_PARAM),
    )
    joined = F.array_join(F.array_sort(params), "&")
    return F.when(joined == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), joined)
    )


def canonical_url(url: Column) -> Column:
    """The canonical form of ``url`` per the module rules. Pure codegen'd
    expression fold — no UDF, no shuffle."""
    nofrag = F.regexp_replace(url, _FRAGMENT, "")
    scheme = _scheme(nofrag)
    return F.concat(
        scheme,
        F.lit("://"),
        url_host(nofrag),
        _canon_port(nofrag, scheme),
        _canon_path(nofrag),
        _canon_query(nofrag),
    )


# ---------------------------------------------------------------------------
# DuckDB side (oracle replay) — generated from the SAME spec
# ---------------------------------------------------------------------------

def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _nofrag_sql(expr: str) -> str:
    return f"regexp_replace({expr}, {_sq(_FRAGMENT)}, '', 'g')"


def _scheme_sql(nofrag: str) -> str:
    return f"lower(regexp_extract({nofrag}, {_sq(_SCHEME)}, 1))"


def url_host_sql(expr: str) -> str:
    h = f"lower(regexp_extract({expr}, {_sq(_HOST)}, 1))"
    return f"regexp_replace({h}, {_sq(_HOST_TRAILING_DOT)}, '', 'g')"


def _canon_port_sql(nofrag: str, scheme: str) -> str:
    port = f"regexp_extract({nofrag}, {_sq(_PORT)}, 1)"
    defaults = " OR ".join(
        f"({scheme} = '{s}' AND {port} = '{p}')" for s, p in _DEFAULT_PORTS
    )
    return (
        f"CASE WHEN {port} = '' OR {defaults} THEN '' "
        f"ELSE ':' || {port} END"
    )


def _canon_path_sql(nofrag: str) -> str:
    p = f"regexp_extract({nofrag}, {_sq(_PATH)}, 1)"
    p = f"regexp_replace({p}, {_sq(_DUP_SLASHES)}, '/', 'g')"
    p = f"regexp_replace({p}, {_sq(_INDEX_FILE)}, '/', 'g')"
    stripped = f"trim({p}, '/')"
    return f"CASE WHEN {stripped} = '' THEN '/' ELSE '/' || {stripped} END"


def _canon_query_sql(nofrag: str) -> str:
    q = f"regexp_extract({nofrag}, {_sq(_QUERY)}, 1)"
    params = (
        f"list_filter(string_split({q}, '&'), "
        f"x -> x <> '' AND NOT regexp_matches(x, {_sq(_TRACKING_PARAM)}))"
    )
    # array_to_string([]) is NULL in DuckDB (same trap as html.main_text_sql)
    joined = f"coalesce(array_to_string(list_sort({params}), '&'), '')"
    return f"CASE WHEN {joined} = '' THEN '' ELSE '?' || {joined} END"


def canonical_url_sql(expr: str) -> str:
    """DuckDB SQL applying exactly ``canonical_url`` to ``expr``."""
    nofrag = _nofrag_sql(expr)
    scheme = _scheme_sql(nofrag)
    return (
        f"{scheme} || '://' || {url_host_sql(nofrag)} || "
        f"{_canon_port_sql(nofrag, scheme)} || {_canon_path_sql(nofrag)} || "
        f"{_canon_query_sql(nofrag)}"
    )


# ---------------------------------------------------------------------------
# Deterministic messy-URL fixture (test/oracle), one spec, two renderers
# ---------------------------------------------------------------------------
# page identity p = doc_id % 97 decides WHICH resource a row points at
# (scheme class, host, port class, path id, real query params), so ~5 rows
# per page at sf0.01; the messiness m = doc_id decides HOW the URL is
# written (host casing, default port spelled out, duplicate slashes,
# index.html, tracking params, param order, fragment). Canonicalization
# must collapse each page group to ONE canonical URL regardless of m.

_P_MOD = 97

# indexed by (p%2)*2 + m%2 — scheme class is page identity, casing is mess
_SCHEMES = ("http", "HTTP", "https", "HTTPS")
# indexed by (p%3)*2 + m%2 — host is page identity, casing/trailing-dot mess
_HOSTS = (
    "example.com", "EXAMPLE.com.",
    "blog.example.com", "Blog.Example.COM.",
    "cdn.example.net", "CDN.example.NET",
)
# indexed by p%5 — page identity only (a port is part of the resource);
# ':80' with p%2==0 (http) and ':443' with p%2==1 (https) strip, ':8080'
# and scheme-mismatched defaults survive
_PORTS = (":80", "", ":443", "", ":8080")
# indexed by m%3 — pure mess between /articles and the page id
_SLASHES = ("/", "//", "///")
# indexed by m%4 — pure mess after the page id
_SUFFIXES = ("", "/", "/index.html", "/index.htm")
# indexed by (p%3)*3 + m%3 — real params are page identity, tracking
# params / ordering / bare '?' are mess
_QUERIES = (
    "", "?utm_campaign=x", "?",
    "?a=1&b=2", "?b=2&a=1", "?b=2&utm_source=feed&a=1",
    "?q=spark+sql", "?q=spark+sql&gclid=abc123", "?fbclid=zzz&q=spark+sql",
)
# indexed by m%2 — pure mess
_FRAGMENTS = ("", "#section-2")


def synth_url(doc_id: Column) -> Column:
    """Spark Column rendering the messy-URL fixture for a bigint id."""
    p = doc_id % _P_MOD
    m = doc_id

    def pick(choices: tuple[str, ...], idx: Column) -> Column:
        return F.element_at(
            F.array(*[F.lit(c) for c in choices]), (idx + 1).cast("int")
        )

    return F.concat(
        pick(_SCHEMES, (p % 2) * 2 + m % 2),
        F.lit("://"),
        pick(_HOSTS, (p % 3) * 2 + m % 2),
        pick(_PORTS, p % 5),
        F.lit("/articles"),
        pick(_SLASHES, m % 3),
        p.cast("string"),
        pick(_SUFFIXES, m % 4),
        pick(_QUERIES, (p % 3) * 3 + m % 3),
        pick(_FRAGMENTS, m % 2),
    )


def synth_url_sql(doc_id: str) -> str:
    """DuckDB expression rendering the SAME fixture."""
    p = f"({doc_id} % {_P_MOD})"
    m = doc_id

    def pick(choices: tuple[str, ...], idx: str) -> str:
        lst = "[" + ", ".join(_sq(c) for c in choices) + "]"
        return f"({lst})[CAST({idx} AS BIGINT) + 1]"

    return " || ".join(
        [
            pick(_SCHEMES, f"({p} % 2) * 2 + {m} % 2"),
            "'://'",
            pick(_HOSTS, f"({p} % 3) * 2 + {m} % 2"),
            pick(_PORTS, f"{p} % 5"),
            "'/articles'",
            pick(_SLASHES, f"{m} % 3"),
            f"CAST({p} AS VARCHAR)",
            pick(_SUFFIXES, f"{m} % 4"),
            pick(_QUERIES, f"({p} % 3) * 3 + {m} % 3"),
            pick(_FRAGMENTS, f"{m} % 2"),
        ]
    )
