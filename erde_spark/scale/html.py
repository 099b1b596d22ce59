"""HTML-to-text extraction for web-crawl curation.

The first transform of every crawl-derived training pipeline: strip
markup, keep visible text. Everything here is a chain of JVM
``regexp_replace`` / ``regexp_extract`` expressions — whole-stage
codegen, no Python workers, no per-row UDFs — so a 100 TB crawl pass is
one narrow scan whose cost is the regex engine, not serialization.

The regex dialect is deliberately restricted to the intersection of
Java's engine (Spark) and RE2 (DuckDB/Go): inline ``(?is)`` flags,
non-greedy ``.*?``, explicit whitespace classes ``[ \\t\\r\\n]`` (NOT
``\\s`` — Java's includes \\x0B, RE2's does not), and no backreferences
in replacements. That keeps the extraction oracle-checkable: the same
patterns run verbatim under DuckDB in the correctness gate.

This is tag stripping + entity decoding + whitespace normalization —
the deterministic 80% of boilerplate removal. Link-density line pruning
(trafilatura/jusText style) is heuristic and model-specific; compose it
downstream from ``text`` + ``n_links`` if needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Kept in (pattern, replacement) order — the whole chain is applied
# left-to-right, and the DuckDB oracle replays the identical sequence.
HTML_TEXT_STEPS: list[tuple[str, str]] = [
    # script/style/head payloads are never visible text
    (r'(?is)<script\b[^>]*>.*?</script>', ' '),
    (r'(?is)<style\b[^>]*>.*?</style>', ' '),
    (r'(?s)<!--.*?-->', ' '),
    # block-level closers and <br> become newlines so paragraph
    # structure survives tag stripping
    (r'(?i)<br[ \t]*/?>|</p>|</div>|</h[1-6]>|</li>|</tr>|</table>'
     r'|</blockquote>|</section>|</article>', '\n'),
    # every remaining tag disappears
    (r'(?s)<[^>]*>', ' '),
    # minimal entity set (decode &amp; LAST or it re-introduces
    # entities: "&amp;lt;" must become "&lt;", not "<")
    (r'&nbsp;', ' '),
    (r'&lt;', '<'),
    (r'&gt;', '>'),
    (r'&quot;', '"'),
    (r'&#39;|&apos;', "'"),
    (r'&amp;', '&'),
    # whitespace normalization: runs of spaces/tabs/CRs -> one space,
    # newline islands -> one newline, trim
    (r'[ \t\r]+', ' '),
    (r' ?\n[ \t\r\n]*', '\n'),
    (r'^[ \n]+|[ \n]+$', ''),
]

TITLE_PATTERN = r'(?is)<title[^>]*>(.*?)</title>'
HREF_PATTERN = r'(?i)href="([^"]*)"'


def html_to_text(col: Column | str) -> Column:
    """Visible text of an HTML document (see module doc for scope)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in HTML_TEXT_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return c


def html_title(col: Column | str) -> Column:
    """Contents of the first <title> element ('' if none)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_extract(c, TITLE_PATTERN, 1))


def html_links(col: Column | str) -> Column:
    """Array of double-quoted href attribute values, in order."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(HREF_PATTERN), F.lit(1))


def html_extract(df: DataFrame, html_col: str = 'html',
                 keep: list[str] | None = None) -> DataFrame:
    """Per-document extraction report: visible ``text``, ``title``,
    ``links``, ``n_links``, and ``text_ratio`` (visible chars / raw
    chars — the classic junk-page signal: near-0 means markup soup,
    near-1 means the page was already text). ``keep`` columns are
    carried through unchanged (default: all non-HTML columns)."""
    carry = keep if keep is not None else [c for c in df.columns if c != html_col]
    text = html_to_text(html_col)
    return df.select(
        *carry,
        text.alias('text'),
        html_title(html_col).alias('title'),
        html_links(html_col).alias('links'),
        F.size(html_links(html_col)).alias('n_links'),
        F.round(F.length(text) / F.greatest(F.length(html_col), F.lit(1)), 4)
         .alias('text_ratio'))


def duckdb_text_sql(expr: str) -> str:
    """The DuckDB expression computing ``html_to_text`` of ``expr`` —
    the same pattern chain, rendered as nested regexp_replace calls with
    the 'g' (and 's'/'i' where flagged inline) options. Used by the
    correctness-gate oracle so Spark and DuckDB run LITERALLY the same
    sequence."""
    sql = expr
    for pat, rep in HTML_TEXT_STEPS:
        p = pat.replace("'", "''")
        # RE2 rewrite strings only know \0-\9 and \\ — a literal
        # newline replacement must ride in as chr(10), not '\n'
        r = 'chr(10)' if rep == '\n' else "'" + rep.replace("'", "''") + "'"
        sql = f"regexp_replace({sql}, '{p}', {r}, 'g')"
    return sql
