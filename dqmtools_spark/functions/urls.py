"""URL canonicalization for web-corpus dedup (CommonCrawl-style).

Web pipelines dedup fetched pages by CANONICAL URL before any content
hashing: the same page arrives as ``http://WWW.Site.com/a/``,
``https://site.com:443/a?utm_source=x`` and ``https://site.com/a`` and
must collapse to one key.  ``canonical_url`` normalizes:

  1. strip the ``#fragment``
  2. lowercase the ``scheme://host`` head (path/query case preserved)
  3. drop a ``www.`` host prefix
  4. drop explicit default ports ``:80`` / ``:443``
  5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``),
     healing the separators (``?utm_a=1&b=2`` -> ``?b=2``)
  6. strip trailing ``/``

Everything is built-in string/regexp expressions (whole-stage codegen,
no UDF), and every regex stays inside the Java-regex ∩ RE2 common
subset — NO lookaround, NO backrefs in patterns — so a DuckDB oracle
can mirror the semantics for the differential gate (DuckDB regexes are
RE2; its ``regexp_replace`` needs the ``'g'`` flag where Spark's
replaces all occurrences by default).

Simplifications, documented: default-port stripping is not
scheme-conditional (``http://h:443`` also loses the port — such URLs
are misconfigurations in practice), and the literal ``://www.`` /
``:443/`` replacements assume those byte sequences only occur in the
scheme/authority, true for any RFC-3986 URL (``//`` cannot appear in a
path and ``:`` cannot appear in a host).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking params to drop; extend freely — the oracle builder reads the
# same list (RE2-safe alternation, no anchors)
TRACKING_PARAM_RE = "(utm_[a-z0-9]+|fbclid|gclid)"

_HEAD_RE = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"


def canonical_url(col: Column | str) -> Column:
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    # 1. fragment
    u = F.regexp_replace(u, "#.*$", "")
    # 2. lowercase scheme://host, keep the tail as-is
    head = F.lower(F.regexp_extract(u, _HEAD_RE, 1))
    tail = F.regexp_replace(u, _HEAD_RE, "")
    u = F.concat(head, tail)
    # 3. www. host prefix (literal replace: '://www.' can only occur at
    # the authority in a valid URL)
    u = F.replace(u, F.lit("://www."), F.lit("://"))
    # 4. default ports
    for port in (":80", ":443"):
        u = F.replace(u, F.lit(f"{port}/"), F.lit("/"))
        u = F.replace(u, F.lit(f"{port}?"), F.lit("?"))
        u = F.regexp_replace(u, f"{port}$", "")
    # 5. tracking params: (a) '&p=v' anywhere, then (b) a leading
    # '?p=v&' promotes the next param, then (c) a lone '?p=v'
    u = F.regexp_replace(u, f"&{TRACKING_PARAM_RE}=[^&]*", "")
    u = F.regexp_replace(u, f"[?]{TRACKING_PARAM_RE}=[^&]*&", "?")
    u = F.regexp_replace(u, f"[?]{TRACKING_PARAM_RE}=[^&]*$", "")
    # 6. trailing slash
    u = F.regexp_replace(u, "/+$", "")
    return u


def canonical_url_sql(expr: str) -> str:
    """DuckDB rendering of :func:`canonical_url` over SQL text
    ``expr`` — the independent oracle side of the differential."""
    u = f"trim({expr})"
    u = f"regexp_replace({u}, '#.*$', '')"
    head = f"lower(regexp_extract({u}, '{_HEAD_RE}', 1))"
    tail = f"regexp_replace({u}, '{_HEAD_RE}', '')"
    u = f"({head} || {tail})"
    u = f"replace({u}, '://www.', '://')"
    for port in (":80", ":443"):
        u = f"replace({u}, '{port}/', '/')"
        u = f"replace({u}, '{port}?', '?')"
        u = f"regexp_replace({u}, '{port}$', '')"
    u = f"regexp_replace({u}, '&{TRACKING_PARAM_RE}=[^&]*', '', 'g')"
    u = f"regexp_replace({u}, '[?]{TRACKING_PARAM_RE}=[^&]*&', '?')"
    u = f"regexp_replace({u}, '[?]{TRACKING_PARAM_RE}=[^&]*$', '')"
    u = f"regexp_replace({u}, '/+$', '')"
    return u
