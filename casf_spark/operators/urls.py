"""URL / domain curation operators — the pre-text filtering layer of
public web-corpus pipelines (CCNet, RefinedWeb, FineWeb all normalize,
dedup, cap, and blocklist by URL *before* touching document text, because
a URL decision costs bytes while a text decision costs kilobytes).

Absent from the reference (SURVEY.md §2 has no web-curation surface);
these are Phase-D extensions in the same contract style as
operators.curation: every transform is pure Catalyst expression work
(regexp / split / array ops — map-only, codegen'd, zero shuffle except
where a cap or dedup genuinely needs the domain/URL key), so each has an
exactly-matching DuckDB twin.

Normalization is deliberately regex-based rather than ``F.parse_url``:
the Hive parse_url builtin has engine-specific edge behavior (NULL on
malformed, Java URI quirks) that no other engine replicates bit-for-bit,
and a curation canonicalizer must be *portable* — the same rules here
run verbatim as SQL in the oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "MULTI_PART_SUFFIXES",
    "TRACKING_PARAM_RE",
    "normalize_url",
    "url_host",
    "registered_domain",
    "domain_caps",
    "domain_blocklist_filter",
]

# Minimal multi-part public-suffix seed ("co.uk" is a suffix, so the
# registered domain of www.example.co.uk is example.co.uk, not co.uk).
# PSL SEAM: production swaps this literal set for the full Mozilla
# public-suffix list shipped as a broadcast side table; the extraction
# rule below (one extra label when the 2-label tail is a listed suffix)
# is exactly the PSL algorithm restricted to its 2-label entries.
MULTI_PART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.in", "co.nz", "com.br", "com.cn", "com.mx",
)

# Tracking / attribution query parameters stripped by normalization —
# the standard CCNet/snowplow removal set (utm_* plus the big click ids).
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)"


def _stripped(url_col: Column) -> Column:
    """URL with the fragment removed — fragments are client-side only
    and never part of document identity."""
    return F.regexp_replace(url_col, r"#.*$", "")


def url_host(url_col: Column) -> Column:
    """Canonical host: authority lowercased, leading ``www.`` dropped,
    default port (``:80`` http / ``:443`` https) stripped, non-default
    ports kept. Pure expression — safe in a 100-TB scan projection."""
    u = _stripped(url_col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTHORITY_RE, 1))
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.substring(auth, 1, F.length(auth) - 3)
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        F.substring(auth, 1, F.length(auth) - 4)
    ).otherwise(auth)
    return F.regexp_replace(auth, r"^www\.", "")


def normalize_url(url_col: Column) -> Column:
    """Canonical form of a raw URL — the dedup/cap/blocklist key:

    * fragment dropped;
    * scheme and host lowercased, leading ``www.`` dropped, default
      port stripped (:func:`url_host`);
    * path: trailing ``/`` runs collapsed away (root stays ``/``; an
      empty path becomes ``/``);
    * query: tracking params (:data:`TRACKING_PARAM_RE`) and empty
      fragments removed, survivors sorted bytewise, ``?`` dropped when
      nothing survives.

    Everything is regexp/array expression work — map-only, whole-stage
    codegen, no Python. The exact same rules run as SQL in the oracle
    twin, which is the point: a canonicalizer two engines can't agree
    on is not canonical.
    """
    u = _stripped(url_col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = url_host(url_col)
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    keep = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)))
    qn = F.array_join(keep, "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qn == "", F.lit("")).otherwise(F.concat(F.lit("?"), qn)))


def registered_domain(host_col: Column) -> Column:
    """Registered (pay-level) domain of a canonical host: the last two
    labels, or three when the 2-label tail is a listed multi-part
    public suffix (:data:`MULTI_PART_SUFFIXES` — the PSL seam). Hosts
    with fewer than two labels pass through unchanged. Pure expression;
    the suffix set is a literal IN-list (production: broadcast PSL)."""
    labels = F.split(host_col, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2),
                        F.element_at(labels, -1))
    last3 = F.concat_ws(".", F.element_at(labels, -3), last2)
    return F.when(n <= 2, host_col).when(
        last2.isin(*MULTI_PART_SUFFIXES), last3).otherwise(last2)


def domain_caps(df: DataFrame, domain_col: str, cap: int,
                order_cols: list[Column]) -> DataFrame:
    """Per-domain document cap — the anti-SEO-farm sampler (RefinedWeb
    caps URLs per registered domain so one mirror farm can't dominate
    the corpus): rank rows within each domain by ``order_cols`` (best
    first; make it total — tiebreak on a unique id) and keep
    ``rank <= cap``, with the rank kept as ``domain_rank``.

    Scale shape: ONE shuffle on the domain key (the row_number window);
    no join-back. Hot domains skew the window partition — at 100 TB
    pre-aggregate a per-domain count first and only window domains over
    the cap (everything under it passes untouched), or lean on AQE skew
    handling; the cap semantics are unchanged.
    """
    w = Window.partitionBy(domain_col).orderBy(*order_cols)
    return (df.withColumn("domain_rank",
                          F.row_number().over(w).cast("long"))
            .where(F.col("domain_rank") <= int(cap)))


def domain_blocklist_filter(df: DataFrame, domain_col: str,
                            blocklist: DataFrame) -> DataFrame:
    """Drop rows whose domain appears in a blocklist table (adult/spam/
    malware lists — the first gate of every public web pipeline).
    Broadcast LEFT ANTI join: the blocklist (thousands to low millions
    of rows — tiny next to the corpus) ships to every executor and the
    corpus never shuffles. ``blocklist`` must carry ``domain_col``."""
    return df.join(F.broadcast(blocklist.select(domain_col).distinct()),
                   domain_col, "left_anti")
