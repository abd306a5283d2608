"""Web-corpus heuristic filters: the C4 / RefinedWeb cleaning family.

The published web-pipeline steps that sit between extraction
(kernel.py / content.py) and dedup (dedup.py):

- :func:`c4_quality_flags` — the page-level heuristic signals of C4
  (Raffel et al., arXiv:1910.10683 §2.2): terminal-punctuation line
  ratio, short-line count, sentence count, "lorem ipsum" and curly-
  brace markers, and the resulting keep decision.
- :func:`line_filter` — RefinedWeb-style line-wise correction
  (Penedo et al., arXiv:2306.01116 §3.1): strip navigation chrome /
  too-short lines from the document instead of dropping the page.
- :func:`url_canonicalize` / :func:`url_dedup` — the URL-level first
  pass of every crawl pipeline (CCNet, RefinedWeb): normalize scheme/
  host case, default ports, ``www.``, tracking params, fragments and
  trailing slashes, then keep one document per canonical URL.

Scale shape (100 TB): every function here is MAP-ONLY codegen —
built-in string / higher-order-array expressions, no Python, no
shuffle — except ``url_dedup``'s single groupBy on the canonical-URL
string (bounded: one row per distinct URL; the payload never moves,
only (url, id) pairs do). All outputs are engine-portable: the exact
same computation is replayable in ANSI-ish SQL (the DuckDB oracles in
queries.py replay them verbatim), so the filters double as lineage-
auditable corpus metadata rather than opaque Python decisions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "c4_quality_flags",
    "line_filter",
    "url_canonicalize",
    "url_dedup",
    "url_features",
    "crawl_gate",
    "DEFAULT_LINE_BLOCKLIST",
]

# Navigation-chrome lines RefinedWeb-style line correction removes
# when a line consists of nothing else (lowercased, trimmed match).
DEFAULT_LINE_BLOCKLIST = (
    "home", "about", "contact", "menu", "search",
    "click here", "sign in", "log in", "register", "subscribe",
)

_NL = "\n"
# a line "ends in terminal punctuation" per C4 if its last non-space
# char is . ! ? or a closing double quote
_TERMINAL_RE = '[.!?"]\\s*$'


def c4_quality_flags(df: DataFrame, text_col: str = "text",
                     min_words_per_line: int = 5,
                     min_sentences: int = 3) -> DataFrame:
    """Append the C4 page-quality signals (arXiv:1910.10683 §2.2) as
    integer/boolean columns plus the combined ``c4_keep`` decision:

    - ``n_lines`` — newline-split line count
    - ``n_terminal_lines`` — lines ending in ``. ! ? "``
    - ``n_short_lines`` — lines with fewer than ``min_words_per_line``
      whitespace words
    - ``n_sentences`` — non-empty ``[.!?]``-delimited fragments
    - ``has_lorem`` — lowercased text contains ``lorem ipsum``
    - ``has_brace`` — text contains ``{`` (code/JS page marker)
    - ``c4_keep`` — no lorem/brace and ``n_sentences >= min_sentences``

    Pure codegen (split / filter / rlike higher-order expressions);
    one pass over the text column, no shuffle, no Python.
    """
    t = F.col(text_col)
    lines = F.split(t, _NL)
    n_lines = F.size(lines).cast("long")
    n_terminal = F.size(F.filter(
        lines, lambda l: l.rlike(_TERMINAL_RE))).cast("long")
    n_short = F.size(F.filter(
        lines,
        lambda l: F.size(F.split(F.trim(l), " +"))
        < F.lit(min_words_per_line))).cast("long")
    n_sentences = F.size(F.filter(
        F.split(t, "[.!?]"),
        lambda s: F.length(F.trim(s)) > 0)).cast("long")
    has_lorem = F.lower(t).contains("lorem ipsum")
    has_brace = t.contains("{")
    return (df
            .withColumn("n_lines", n_lines)
            .withColumn("n_terminal_lines", n_terminal)
            .withColumn("n_short_lines", n_short)
            .withColumn("n_sentences", n_sentences)
            .withColumn("has_lorem", has_lorem)
            .withColumn("has_brace", has_brace)
            .withColumn(
                "c4_keep",
                ~has_lorem & ~has_brace
                & (n_sentences >= F.lit(min_sentences))))


def line_filter(df: DataFrame, text_col: str = "text",
                min_words: int = 3,
                blocklist: tuple = DEFAULT_LINE_BLOCKLIST,
                out_col: str = "text_filtered") -> DataFrame:
    """RefinedWeb-style line-wise correction (arXiv:2306.01116 §3.1):
    drop lines that are navigation chrome (trimmed+lowercased match
    against ``blocklist``) or have fewer than ``min_words`` words;
    keep the document with the surviving lines rejoined by ``\\n``.

    Appends ``out_col`` plus ``n_lines_removed``. Map-only higher-
    order array expressions — no shuffle, no Python; the blocklist is
    a compile-time literal array (plan constant, not a join).
    """
    block = F.array(*[F.lit(b) for b in blocklist])
    lines = F.split(F.col(text_col), _NL)

    def keep(l: Column) -> Column:
        low = F.lower(F.trim(l))
        return (~F.array_contains(block, low)
                & (F.size(F.split(F.trim(l), " +")) >= F.lit(min_words)))

    kept = F.filter(lines, keep)
    return (df
            .withColumn(out_col, F.concat_ws(_NL, kept))
            .withColumn("n_lines_removed",
                        (F.size(lines) - F.size(kept)).cast("long")))


def url_canonicalize(df: DataFrame, url_col: str = "url",
                     out_col: str = "canonical_url") -> DataFrame:
    """Append the canonical form of ``url_col``:

    1. drop the ``#fragment``
    2. lowercase the scheme://host[:port] prefix (paths stay
       case-sensitive per RFC 3986)
    3. drop default ports ``:80`` / ``:443``
    4. drop a leading ``www.`` host label
    5. drop ``utm_*`` tracking query params (then tidy dangling
       ``?`` / ``&`` separators)
    6. strip one trailing ``/``

    Parameter ORDER is preserved (reordering would conflate
    semantically different URLs for servers that care). Six
    regexp_replace passes, all codegen — no UDF, no shuffle.
    """
    u = F.regexp_replace(F.col(url_col), "#.*$", "")           # 1
    prefix = F.regexp_extract(u, "^[^/]*//[^/?]*", 0)
    rest = F.substr(u, F.length(prefix) + F.lit(1))
    prefix = F.lower(prefix)                                    # 2
    prefix = F.regexp_replace(prefix, ":(80|443)$", "")        # 3
    prefix = F.regexp_replace(prefix, "^([a-z]+://)www\\.", "$1")  # 4
    rest = F.regexp_replace(rest, "utm_[^&]*&", "")            # 5
    rest = F.regexp_replace(rest, "[?&]utm_[^&]*$", "")
    rest = F.regexp_replace(rest, "\\?$", "")
    canon = F.concat(prefix, rest)
    canon = F.regexp_replace(canon, "/$", "")                  # 6
    return df.withColumn(out_col, canon)


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """Keep one document per canonical URL — the crawl pipeline's
    cheapest dedup pass, run before any content hashing. Returns one
    row per distinct canonical URL: (canonical_url, keeper ``id_col``
    = minimum id, ``n_dups`` = duplicate count).

    One groupBy on the canonical string; only (url, id) pairs
    shuffle, never document payloads — join the keeper ids back to
    the corpus to materialize the deduped set.
    """
    c = url_canonicalize(df.select(id_col, url_col), url_col=url_col)
    return (c.groupBy("canonical_url")
            .agg(F.min(id_col).cast("long").alias(id_col),
                 (F.count("*") - 1).cast("long").alias("n_dups")))


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append structural URL features — the columns crawl schedulers
    and domain-mixture samplers key on before any content work:

    - ``scheme`` / ``host`` / ``is_https``
    - ``registered_domain`` — the last two dot-labels of the host
      (heuristic: a production pipeline substitutes the public-suffix
      list here; the two-label rule is exact for .com/.org/.net-style
      corpora and documented as approximate for ccSLDs like .co.uk)
    - ``path_depth`` — count of non-empty path segments
    - ``n_query_params`` — ``&``-separated entries of the query string

    Pure regexp/array codegen — no UDF, no shuffle, safe in the scan
    stage at any corpus size."""
    u = F.col(url_col)
    scheme = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    host = F.regexp_extract(u, r"^[^/]*//([^/:?#]*)", 1)
    path = F.regexp_extract(u, r"^[^/]*//[^/?#]*(/[^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    return (df
            .withColumn("scheme", scheme)
            .withColumn("host", host)
            .withColumn("registered_domain",
                        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))
            .withColumn("path_depth",
                        F.size(F.filter(F.split(path, "/"),
                                        lambda x: x != ""))
                        .cast("long"))
            .withColumn("n_query_params",
                        F.when(query == "", F.lit(0)).otherwise(
                            F.size(F.split(query, "&"))).cast("long"))
            .withColumn("is_https", F.lower(scheme) == "https"))


def crawl_gate(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """The crawl-side admission gate, composing the metadata pass with
    URL-level dedup: parse page metadata, drop pages whose robots meta
    carries the ``noindex`` token, then keep ONE page per canonical
    URL (pages without a canonical link stand alone). Returns
    (canonical_url, ``id_col`` = keeper = min id, n_dups).

    Policy pins: ``robots_noindex`` NULL (unparseable html) drops —
    a page we could not read robots policy for must not enter the
    corpus; the keep-one group key for canonical-less pages is a
    per-doc sentinel so they can never collapse together.

    Scale: the metadata pass is the map-only Arrow stage of
    operators/pagemeta.py; the gate is a filter in the same stage;
    only (canonical, id) pairs shuffle for the keep-one groupBy."""
    from .pagemeta import extract_page_metadata

    meta = extract_page_metadata(
        df.select(id_col, text_col), text_col=text_col, drop_text=True)
    live = meta.filter(F.col("robots_noindex") == F.lit(False))
    key = F.coalesce(
        F.col("canonical_url"),
        F.concat(F.lit("_self:"), F.col(id_col).cast("string")))
    return (live.select(key.alias("canonical_url"), id_col)
            .groupBy("canonical_url")
            .agg(F.min(id_col).cast("long").alias(id_col),
                 (F.count("*") - 1).cast("long").alias("n_dups")))
