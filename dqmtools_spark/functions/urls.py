"""URL canonicalization for web-corpus dedup (CommonCrawl-style).

Web pipelines dedup fetched pages by CANONICAL URL before any content
hashing: the same page arrives as ``http://WWW.Site.com/a/``,
``https://site.com:443/a?utm_source=x`` and ``https://site.com/a`` and
must collapse to one key.  ``canonical_url`` normalizes:

  1. strip the ``#fragment``
  2. lowercase the ``scheme://authority`` head (path/query case kept)
  3. drop a ``www.`` host prefix            (head-anchored)
  4. drop explicit default ports ``:80`` / ``:443``  (head-anchored)
  5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``),
     healing the separators (``?utm_a=1&b=2`` -> ``?b=2``)
  6. strip trailing ``/``

The URL is split ONCE into head (``scheme://authority``) and tail
(path + query) by an anchored regex; the authority rewrites (3, 4)
touch only the head and the query rewrites (5) only the tail, so path
segments like ``/a:80/b`` or query values containing ``://www.`` are
never mangled.  Everything is built-in string/regexp expressions
(whole-stage codegen, no UDF), and every regex stays inside the
Java-regex ∩ RE2 common subset — NO lookaround, NO backrefs in
patterns — so a DuckDB oracle mirrors the semantics for the
differential gate (DuckDB ``regexp_replace`` replaces the FIRST match
unless given the ``'g'`` flag; Spark always replaces all, so every
mirror step that can match more than once carries ``'g'``).

Documented simplifications: port stripping is not scheme-conditional
(``http://h:443`` also loses the port — a misconfiguration in
practice), and the tracking-param rewrite is syntactic — a literal
``?utm_x=...`` inside a query VALUE is treated as a parameter, the
standard canonicalizer tradeoff.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking params to drop; extend freely — the oracle builder reads the
# same list (RE2-safe alternation, no anchors)
TRACKING_PARAM_RE = "(utm_[a-z0-9]+|fbclid|gclid)"

_HEAD_RE = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
_PORT_RE = ":(80|443)$"


def canonical_url(col: Column | str) -> Column:
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    # 1. fragment
    u = F.regexp_replace(u, "#.*$", "")
    # 2. split: lowercase head, tail untouched (a non-URL string has no
    # head match -> head = '', tail = the whole string)
    head = F.lower(F.regexp_extract(u, _HEAD_RE, 1))
    tail = F.regexp_replace(u, _HEAD_RE, "")
    # 3./4. authority rewrites — head only
    head = F.replace(head, F.lit("://www."), F.lit("://"))
    head = F.regexp_replace(head, _PORT_RE, "")
    # 5. tracking params — tail only: (a) '&p=v' anywhere, (b) '?p=v&'
    # promotes the next param, (c) a lone trailing '?p=v'
    tail = F.regexp_replace(tail, f"&{TRACKING_PARAM_RE}=[^&]*", "")
    tail = F.regexp_replace(tail, f"[?]{TRACKING_PARAM_RE}=[^&]*&", "?")
    tail = F.regexp_replace(tail, f"[?]{TRACKING_PARAM_RE}=[^&]*$", "")
    # 6. trailing slash
    return F.regexp_replace(F.concat(head, tail), "/+$", "")


def canonical_url_sql(expr: str) -> str:
    """DuckDB rendering of :func:`canonical_url` over SQL text
    ``expr`` — the independent oracle side of the differential.
    Steps (a) and (b) of the tracking rewrite can match more than once
    (e.g. a literal '?' inside a query value), so they carry 'g' to
    match Spark's replace-all; (c) is '$'-anchored and single-match."""
    u = f"trim({expr})"
    u = f"regexp_replace({u}, '#.*$', '')"
    head = f"lower(regexp_extract({u}, '{_HEAD_RE}', 1))"
    tail = f"regexp_replace({u}, '{_HEAD_RE}', '')"
    head = f"replace({head}, '://www.', '://')"
    head = f"regexp_replace({head}, '{_PORT_RE}', '')"
    tail = f"regexp_replace({tail}, '&{TRACKING_PARAM_RE}=[^&]*', '', 'g')"
    tail = f"regexp_replace({tail}, '[?]{TRACKING_PARAM_RE}=[^&]*&', '?', 'g')"
    tail = f"regexp_replace({tail}, '[?]{TRACKING_PARAM_RE}=[^&]*$', '')"
    return f"regexp_replace(({head} || {tail}), '/+$', '')"
