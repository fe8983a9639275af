"""HTML text extraction — the EXTRACT stage of public web pipelines
(CCNet/RefinedWeb/FineWeb all start from WARC/HTML and strip markup
before any quality or dedup pass). Rule-based and deliberately portable:
every step is a regexp/replace Column expression that runs verbatim as
SQL in the oracle twin (the same portability argument as
operators.urls.normalize_url — an extractor two engines can't agree on
is not a contract).

Pipeline (:func:`extract_text`): script/style blocks removed WITH their
content, remaining tags stripped to a space, the common named/numeric
entities decoded (``&amp;`` deliberately LAST so ``&amp;lt;`` decodes to
the literal ``&lt;`` and not ``<``), whitespace collapsed. Unknown
entities (``&copy;`` …) pass through unchanged — a lossless, documented
non-goal, like production extractors' entity tables. Real trafilatura-
style boilerplate classification (nav/footer heuristics, link density)
is a model, not a rule set, and sits behind the same seam compressed
codecs do in multimodal.binary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["strip_blocks", "strip_tags", "decode_entities",
           "extract_title", "extract_text"]

#: decode table, applied in order — &amp; LAST (double-decode guard)
ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]

# One pattern PER element, each DOTALL ((?s) — block bodies span
# newlines in real HTML) and closed only by its OWN end tag: a single
# alternation pattern would let <script>…</style> terminate a script
# block, leaking the tail of the script into the extracted text.
# Two passes instead of a backreference because the DuckDB twin's RE2
# engine has no backreferences; (?s) is common to both engines.
_SCRIPT_RE = r"(?s)<script[^>]*>.*?</script>"
_STYLE_RE = r"(?s)<style[^>]*>.*?</style>"
_TAG_RE = r"<[^>]*>"


def strip_blocks(col: Column) -> Column:
    """Remove script/style elements INCLUDING their content (the text
    inside them is code, never prose). Non-greedy so adjacent blocks
    don't swallow the markup between them; one pass per element type so
    a stray ``</style>`` inside a script never closes the script.

    Rule-based non-goal (shared with every regex extractor): the pass
    order fixes ``</style>``-inside-script, but the MIRROR case — an
    unclosed ``<script>`` opener inside a style body followed by a real
    script — makes the script pass consume across the ``</style>``,
    leaving an unclosed ``<style>`` whose prelude text leaks into the
    output. Pathologically nested opener-inside-body markup needs a
    real HTML parser; this extractor targets well-formed blocks."""
    return F.regexp_replace(
        F.regexp_replace(col, _SCRIPT_RE, " "), _STYLE_RE, " ")


def strip_tags(col: Column) -> Column:
    """Replace every remaining tag with a space (a space, not '', so
    ``</p><p>`` boundaries don't weld words together)."""
    return F.regexp_replace(col, _TAG_RE, " ")


def decode_entities(col: Column) -> Column:
    """Decode the common HTML entities (:data:`ENTITIES`, literal
    replaces — no regex), ``&amp;`` last."""
    for ent, ch in ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def extract_title(col: Column) -> Column:
    """The first ``<title>`` element's text (non-greedy), entity-decoded
    and trimmed; '' when absent."""
    return F.trim(decode_entities(
        F.regexp_extract(col, r"<title[^>]*>(.*?)</title>", 1)))


def extract_text(col: Column) -> Column:
    """Full extraction: blocks → tags → entities → whitespace collapse →
    trim. Pure expression work — map-only in a 100-TB scan projection;
    the raw HTML bytes reduce to clean text inside the scan and never
    shuffle."""
    s = decode_entities(strip_tags(strip_blocks(col)))
    return F.trim(F.regexp_replace(s, r"\s+", " "))
