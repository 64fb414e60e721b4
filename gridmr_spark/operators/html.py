"""HTML main-text extraction (boilerplate removal) — the missing
Common-Crawl stage between WARC payloads (sources/warc.py) and the
``text_*`` quality/dedup filters: raw HTML in, clean document text out.

The reference has no HTML stage at all (its data plane is plain text,
cpp/worker/src/common/fs.cc:42-53); this operator exists because the
repo's north star — an LLM training-data pipeline at 100 TB — ingests
crawl HTML, and every downstream operator (dedup, lang-id, quality,
tokenize) wants the MAIN text, not nav bars and script bodies.

Design constraints, in priority order:

1. **Deterministic and engine-replayable.** The whole pipeline is a fold
   of regex replaces + literal entity decodes + a block-level word-count
   filter, generated from ONE shared spec (``_TAG_STRIP_STEPS`` /
   ``_ENTITIES`` below) into both a Spark ``Column`` expression and the
   equivalent DuckDB SQL — so the correctness oracle replays extraction
   bit-for-bit and the two sides cannot drift. Patterns use only the
   regex subset Java and RE2 agree on: inline ``(?is)`` flags, lazy
   ``.*?``, alternation, char classes — NO backreferences (RE2 has
   none), which is why script/style/noscript/template each get their own
   strip step instead of one ``<(x)>.*?</\\1>``.
2. **Scale-shaped.** Every step is a per-row JVM-native ``regexp_replace``
   inside whole-stage codegen: no Python boundary, no shuffle, no state.
   At 100 TB this runs as a pure map over the scan — the cheapest shape
   Spark has.
3. **Honest boilerplate model.** Block segmentation (block-level tags →
   newlines) + a per-block minimum word count is the classic
   density-style heuristic (jusText/boilerpipe family, simplified to the
   regex-expressible core): nav items, headings, footers and button
   labels are short blocks and drop; running prose survives. The
   threshold (``MIN_BLOCK_WORDS``) is the documented knob.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Blocks shorter than this many space-separated words are boilerplate.
MIN_BLOCK_WORDS = 5

# Tags whose open/close marks a block boundary (→ newline, not space).
_BLOCK_TAGS = (
    "p|div|br|hr|h1|h2|h3|h4|h5|h6|li|ul|ol|dl|dt|dd|tr|td|th|table|thead"
    "|tbody|section|article|aside|header|footer|nav|main|blockquote|pre"
    "|form|fieldset|figure|figcaption|title"
)

# (pattern, replacement) folds, applied in order. Replacement "\n" marks a
# block boundary; " " erases inline content. Java-and-RE2-common syntax only.
_TAG_STRIP_STEPS: list[tuple[str, str]] = [
    # container elements whose CONTENT is never text: drop entirely
    (r"(?is)<script\b[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", " "),
    (r"(?is)<noscript\b[^>]*>.*?</noscript\s*>", " "),
    (r"(?is)<template\b[^>]*>.*?</template\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    # block-level tags segment the text
    (rf"(?is)</?(?:{_BLOCK_TAGS})\b[^>]*>", "\n"),
    # every remaining (inline) tag erases to a space
    (r"(?s)<[^>]*>", " "),
]

# Literal entity decodes, applied after tag stripping. &amp; LAST so
# double-escaped text ("&amp;lt;") decodes one level per pass, same as a
# single-pass HTML tokenizer.
_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

_WS_PATTERN = r"[ \t\r]+"
_TITLE_PATTERN = r"(?is)<title[^>]*>(.*?)</title>"
_HREF_PATTERN = r'(?is)href="([^"]*)"'
_BLOCK_SPLIT = r"\s*\n\s*"


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------

def clean_text(html: Column) -> Column:
    """Tag-stripped, entity-decoded, space-collapsed text with block
    boundaries as newlines (pre-filter). Pure codegen'd regex fold."""
    c = html
    for pat, rep in _TAG_STRIP_STEPS:
        c = F.regexp_replace(c, pat, rep)
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.regexp_replace(c, _WS_PATTERN, " ")


def main_text_blocks(html: Column, min_words: int = MIN_BLOCK_WORDS) -> Column:
    """array<string> of the surviving content blocks, in document order."""
    blocks = F.transform(F.split(clean_text(html), _BLOCK_SPLIT), F.trim)
    return F.filter(blocks, lambda b: F.size(F.split(b, " ")) >= min_words)


def main_text(html: Column, min_words: int = MIN_BLOCK_WORDS) -> Column:
    """The extracted main text: surviving blocks joined by newlines.
    Empty string (not NULL) when nothing survives — matches the oracle's
    COALESCE so the value hash agrees."""
    return F.array_join(main_text_blocks(html, min_words), "\n")


def html_title(html: Column) -> Column:
    """<title> content ('' when absent), from the ORIGINAL markup —
    extracted before stripping because the title tag is dropped as
    boilerplate (it is a short block) by the main-text rules."""
    return F.regexp_extract(html, _TITLE_PATTERN, 1)


def extract_links(html: Column) -> Column:
    """array<string> of href values in document order — the URL-frontier
    feed of a crawl pipeline."""
    return F.regexp_extract_all(html, F.lit(_HREF_PATTERN), F.lit(1))


# ---------------------------------------------------------------------------
# DuckDB side (oracle replay) — generated from the SAME spec
# ---------------------------------------------------------------------------

def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def clean_text_sql(expr: str) -> str:
    """DuckDB SQL applying exactly ``clean_text`` to ``expr``."""
    e = expr
    for pat, rep in _TAG_STRIP_STEPS:
        rep_sql = "chr(10)" if rep == "\n" else _sq(rep)
        e = f"regexp_replace({e}, {_sq(pat)}, {rep_sql}, 'g')"
    for ent, rep in _ENTITIES:
        e = f"replace({e}, {_sq(ent)}, {_sq(rep)})"
    return f"regexp_replace({e}, {_sq(_WS_PATTERN)}, ' ', 'g')"


def main_text_blocks_sql(expr: str, min_words: int = MIN_BLOCK_WORDS) -> str:
    """DuckDB list<varchar> of surviving blocks (= main_text_blocks)."""
    split = f"string_split_regex({clean_text_sql(expr)}, {_sq(_BLOCK_SPLIT)})"
    trimmed = f"list_transform({split}, b -> trim(b))"
    return (
        f"list_filter({trimmed}, "
        f"b -> len(string_split(b, ' ')) >= {min_words})"
    )


def main_text_sql(expr: str, min_words: int = MIN_BLOCK_WORDS) -> str:
    return (
        f"coalesce(array_to_string({main_text_blocks_sql(expr, min_words)}, "
        "chr(10)), '')"
    )


def html_title_sql(expr: str) -> str:
    return f"regexp_extract({expr}, {_sq(_TITLE_PATTERN)}, 1)"


def extract_links_sql(expr: str) -> str:
    return f"regexp_extract_all({expr}, {_sq(_HREF_PATTERN)}, 1)"


# ---------------------------------------------------------------------------
# Deterministic synthetic page builder (test/oracle fixture)
# ---------------------------------------------------------------------------
# One template, rendered by BOTH engines, wraps a documents-table row in a
# realistic page: head chrome (title/style/script), nav with links, h1,
# main content (the doc text + an entity-rich sentence + a short note that
# must be dropped), an HTML comment, and a footer. Every boilerplate rule
# above has a probe in here.

_TEMPLATE: list[tuple[str, str]] = [
    ("lit", "<html><head><title>Doc "),
    ("field", "doc_id"),
    (
        "lit",
        "</title><style>body { margin: 0; } nav a { color: #00c; }</style>"
        '<script type="text/javascript">if (1 < 2) { var x = "a > b"; }'
        "</script></head><body>"
        '<nav><ul><li><a href="/">Home</a></li>'
        '<li><a href="/about">About</a></li>'
        '<li><a href="/doc/',
    ),
    ("field", "doc_id"),
    ("lit", '">Permalink</a></li></ul></nav><h1>Doc '),
    ("field", "doc_id"),
    ("lit", '</h1><div id="main"><p>'),
    ("field", "text"),
    (
        "lit",
        "</p><p>Fish &amp; chips cost &lt; ten &quot;euros&quot; today</p>"
        "<p>Short note.</p></div><!-- tracking pixel -->"
        '<footer><p>Copyright &amp; <a href="/terms">Terms</a>'
        "</p></footer></body></html>",
    ),
]


def synth_page(fields: dict[str, Column]) -> Column:
    """Spark Column rendering the template with the given field columns
    (string-typed)."""
    parts = [
        F.lit(v) if kind == "lit" else fields[v] for kind, v in _TEMPLATE
    ]
    return F.concat(*parts)


def synth_page_sql(fields: dict[str, str]) -> str:
    """DuckDB expression rendering the SAME template."""
    parts = [
        _sq(v) if kind == "lit" else fields[v] for kind, v in _TEMPLATE
    ]
    return " || ".join(parts)
