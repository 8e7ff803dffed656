"""Web-text hygiene operators for a Common-Crawl-style pipeline:
PII masking and URL canonicalization.

Both are pure JVM ``regexp_replace`` / ``regexp_extract`` chains
(whole-stage codegen, zero shuffle, no Python) over patterns chosen to
behave identically in java.util.regex (Spark) and RE2 (DuckDB): no
backreferences, no lookaround, non-capturing groups only in patterns,
and — critically — NO capture references in replacement strings
(Java spells them ``$1``, RE2 spells them ``\\1``, so a shared literal
step table cannot use them). The DuckDB oracle in ``__spark_entry__``
replays the same step tables with the ``'g'`` flag (DuckDB replaces
first-match by default; Spark is always global).

Reference parity note: the reference pipeline receives pre-extracted
sentences and has no PII/URL stage — these belong to the
training-data-pipeline family the task brief adds on top of SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# PII masking
# ---------------------------------------------------------------------------

# Applied strictly in order: emails first (an email contains digit runs
# a later numeric pattern could nibble at), then IPv4 (dotted digit
# quads would otherwise half-match the phone rule), then phones.
# Counting happens on the progressively-masked text for the same
# reason — each occurrence is attributed to exactly one category.
PII_STEPS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


def pii_mask(col: str | Column) -> Column:
    """Text with emails, IPv4 addresses, and US-style phone numbers
    replaced by typed placeholders, in PII_STEPS order."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, rep in PII_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return c


def pii_counts(col: str | Column) -> list[Column]:
    """One count column per PII category (aliased ``n_<name>``),
    counted on the progressively-masked text so categories never
    double-count the same span."""
    c = F.col(col) if isinstance(col, str) else col
    out = []
    for name, pat, rep in PII_STEPS:
        out.append(F.size(F.regexp_extract_all(c, F.lit(pat), 0)).alias(f"n_{name}"))
        c = F.regexp_replace(c, pat, rep)
    return out


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

# Step table applied in order BEFORE the scheme/host lowering:
#  1. drop the fragment;
#  2-4. drop tracking parameters (utm_*, fbclid, gclid, msclkid) in the
#       three positional forms — '&p=v', '?p=v&' (more params follow,
#       keep the '?'), '?p=v$' (sole param) — using literal
#       replacements only (see module docstring on capture refs);
#  5. collapse any '&&' runs left by step 2;
#  6. drop a dangling '?' or '&';
#  7-8. drop redundant trailing slashes ('/path/?q' → '/path?q',
#       'host/' → 'host').
_TRACK = r"(?:utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid)"
URL_CANON_STEPS: tuple[tuple[str, str], ...] = (
    (r"#.*$", ""),
    (rf"&{_TRACK}=[^&#]*", ""),
    (rf"\?{_TRACK}=[^&#]*&", "?"),
    (rf"\?{_TRACK}=[^&#]*$", ""),
    (r"&&+", "&"),
    (r"[?&]+$", ""),
    (r"/+\?", "?"),
    (r"(?:/)+$", ""),
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$"


def url_canonicalize(col: str | Column) -> Column:
    """Canonical form of an absolute URL: fragment and tracking params
    stripped, scheme and host lowercased, default ports (:80/:443)
    dropped, redundant trailing slash removed. Inputs with no
    ``scheme://`` prefix pass through with only the step-table
    normalizations (relative URLs are kept, not invented)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in URL_CANON_STEPS:
        c = F.regexp_replace(c, pat, rep)
    scheme = F.lower(F.regexp_extract(c, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(c, _HOST_RE, 1))
    # only the scheme's OWN default port is redundant: http on :443 is
    # a different origin than http on :80 and must not collapse
    host = F.when(
        scheme == "http", F.regexp_replace(host, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    rest = F.regexp_extract(c, _REST_RE, 1)
    return F.when(scheme == "", c).otherwise(
        F.concat(scheme, F.lit("://"), host, rest)
    )


def url_host(col: str | Column) -> Column:
    """Lowercased host (port stripped) of an absolute URL, '' when the
    input has no ``scheme://`` prefix."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.lower(F.regexp_extract(c, _HOST_RE, 1))
    return F.regexp_replace(host, r":\d+$", "")
