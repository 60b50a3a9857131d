"""Canonical pure-Python text functions — the byte-identical contract.

Every transformation that must produce *byte-identical* output per url
(north rule) is defined ONCE here as a locale-free, version-pinned pure
function of the input bytes/str.  The Spark pipeline calls these from
inside vectorized pandas UDFs; the pytest reference implementation calls
the same functions from plain pandas.  Nothing here touches Spark.

Reference analog: the fragment decoders the reference delegates to
(``rawdatautils`` unpackers invoked from
``/root/reference/python/dqmtools/dataframe_creator.py:118-142``) — the
deterministic decode step between raw bytes and analyzable columns.
"""

from __future__ import annotations

import re

# --- HTML -> text extraction -------------------------------------------------
# Deliberately simple and fully deterministic: strip script/style blocks,
# strip tags, decode the handful of entities the synthesizer emits,
# collapse runs of spaces/tabs per line, drop blank lines.

_RE_SCRIPT = re.compile(rb"(?s)<(script|style)\b[^>]*>.*?</\1>")
_RE_TAG = re.compile(rb"<[^>]+>")
_ENTITIES = [
    (b"&amp;", b"&"),
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&#39;", b"'"),
    (b"&nbsp;", b" "),
]
_RE_SPACES = re.compile(r"[ \t]+")


def extract_text(html: bytes | None) -> str | None:
    """Extract visible text from page bytes. Byte-identical contract."""
    if html is None:
        return None
    raw = _RE_SCRIPT.sub(b"", html)
    raw = _RE_TAG.sub(b" ", raw)
    for ent, rep in _ENTITIES:
        raw = raw.replace(ent, rep)
    s = raw.decode("utf-8", errors="replace")
    lines = []
    for line in s.split("\n"):
        line = _RE_SPACES.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


# --- PII / toxicity scrub ----------------------------------------------------
# Regexes are anchored to ASCII classes only (locale-free).  Order of
# application is part of the contract: email, phone, ssn, ipv4, toxicity.

PII_PATTERNS: list[tuple[str, re.Pattern[str], str]] = [
    ("email", re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"), "<EMAIL>"),
    ("phone", re.compile(r"(?<!\d)(?:\+?1[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}(?!\d)"), "<PHONE>"),
    ("ssn", re.compile(r"(?<!\d)\d{3}-\d{2}-\d{4}(?!\d)"), "<SSN>"),
    ("ipv4", re.compile(r"(?<!\d)(?:\d{1,3}\.){3}\d{1,3}(?!\d)"), "<IP>"),
]

# Tiny deterministic stand-in lexicon (a real deployment swaps in a
# curated list; the plumbing — word-boundary match, counting, replace —
# is the engine part).
TOXICITY_LEXICON = ("frakking", "gorram", "smegging")
_RE_TOX = re.compile(
    r"\b(" + "|".join(TOXICITY_LEXICON) + r")\b", flags=re.IGNORECASE
)

SCRUB_KINDS = [name for name, _, _ in PII_PATTERNS] + ["toxicity"]


_RE_DIGIT = re.compile(r"\d")

# Cheap presence guards: a pattern whose REQUIRED characters are absent
# from the input cannot match, so its scan may be skipped.  Safe by
# construction: replacements only delete text and insert fixed tokens
# (all containing '<', none containing '@', digits, or lexicon words),
# so a skip decision made on the ORIGINAL text stays valid after
# earlier passes rewrite it — a skipped pass could only ever have found
# zero matches.  ~75% of web docs carry no PII at all; this turns five
# regex scans into one-or-two cheap C probes for them.


def scrub_text(text: str | None) -> tuple[str | None, dict[str, int]]:
    """Replace PII/toxic spans; return (scrubbed, per-kind hit counts).

    Application order (email, phone, ssn, ipv4, toxicity) is part of
    the byte-identical contract — each pass runs on the output of the
    previous one.  (A fused single-pass alternation is NOT equivalent:
    e.g. '(555) 123-4567@x.io' → sequential gives '(555) <EMAIL>',
    fused would give '<PHONE>@x.io'.)
    """
    hits: dict[str, int] = {k: 0 for k in SCRUB_KINDS}
    if text is None:
        return None, hits
    out = text
    has_digit = _RE_DIGIT.search(text) is not None
    for name, pat, repl in PII_PATTERNS:
        if name == "email":
            if "@" not in text:
                continue
        elif not has_digit:
            continue
        out, n = pat.subn(repl, out)
        hits[name] = n
    low = text.lower()
    if any(w in low for w in TOXICITY_LEXICON):
        out, n = _RE_TOX.subn("<TOX>", out)
        hits["toxicity"] = n
    return out, hits


def scrub_text_unguarded(text: str | None) -> tuple[str | None, dict[str, int]]:
    """Reference form without the presence guards — used by the
    property test that proves guard equivalence."""
    hits: dict[str, int] = {k: 0 for k in SCRUB_KINDS}
    if text is None:
        return None, hits
    out = text
    for name, pat, repl in PII_PATTERNS:
        out, n = pat.subn(repl, out)
        hits[name] = n
    out, n = _RE_TOX.subn("<TOX>", out)
    hits["toxicity"] = n
    return out, hits


# --- Language ID (fastText stand-in) ----------------------------------------
# Deterministic marker-token scorer: count hits from each language's
# marker set; CJK codepoints vote for zh.  Ties break by language code
# ascending.  Interface-compatible with swapping in a real fastText
# model inside the same pandas UDF.

LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the and of to in is that with for was are this have from not".split()
    ),
    "fr": frozenset(
        "le la les de et un une dans est pour que avec sur pas nous vous".split()
    ),
    "es": frozenset(
        "el los de y en que un una por con para es las del se como".split()
    ),
    "de": frozenset(
        "der die das und in den von zu mit ist für auf nicht eine als".split()
    ),
}

_TOKEN_RE = re.compile(r"[^\W\d_]+", flags=re.UNICODE)

# inverted marker index: token -> languages containing it (one dict
# lookup per token instead of four set probes)
_MARKER_LANGS: dict[str, tuple[str, ...]] = {}
for _lang in sorted(LANG_MARKERS):
    for _w in sorted(LANG_MARKERS[_lang]):
        _MARKER_LANGS[_w] = _MARKER_LANGS.get(_w, ()) + (_lang,)

# same codepoint range as the old per-char loop (0x4E00..0x9FFF), but
# counted by the C regex engine instead of a Python char loop
_CJK_RE = re.compile("[\u4e00-\u9fff]")


def langid_scores(text: str | None) -> dict[str, int]:
    """Marker-hit counts per language (zh scored on CJK codepoints)."""
    scores = {lang: 0 for lang in LANG_MARKERS}
    scores["zh"] = 0
    if not text:
        return scores
    lowered = text.lower()
    get = _MARKER_LANGS.get
    for tok in _TOKEN_RE.findall(lowered):
        langs = get(tok)
        if langs:
            for lang in langs:
                scores[lang] += 1
    scores["zh"] = len(_CJK_RE.findall(text))
    return scores


def predict_lang(text: str | None) -> str:
    scores = langid_scores(text)
    # max score, tie-break lang code ascending — deterministic.
    return min(sorted(scores), key=lambda l: (-scores[l], l))


# --- Perplexity (KenLM stand-in) ---------------------------------------------
# Unigram language model with add-one smoothing over a fixed vocabulary
# derived from the marker sets + synthesizer content words.  Fully
# deterministic; scored vectorized inside a pandas UDF.

_CONTENT_WORDS = (
    "data table scan join merge sort filter group query row column value "
    "stream batch window key hash part order spark vector customer line "
    "small big fast slow agg dup"
).split()


def build_unigram_model() -> dict[str, float]:
    """word -> log2 probability, add-one smoothed, deterministic."""
    import math

    vocab: dict[str, int] = {}
    for markers in LANG_MARKERS.values():
        for w in sorted(markers):
            vocab[w] = vocab.get(w, 0) + 8  # markers are frequent
    for w in _CONTENT_WORDS:
        vocab[w] = vocab.get(w, 0) + 4
    total = sum(vocab.values()) + len(vocab) + 1
    return {w: math.log2((c + 1) / total) for w, c in sorted(vocab.items())}


def lm_and_oov() -> tuple[dict[str, float], float]:
    """The (model, oov_log2p) pair; OOV sits 4 bits below the rarest word."""
    m = build_unigram_model()
    return m, min(m.values()) - 4.0


def perplexity(text: str | None, model: dict[str, float], oov: float) -> float | None:
    """2^(-mean log2 p) over whitespace tokens; None for empty text."""
    if not text:
        return None
    toks = text.lower().split()
    if not toks:
        return None
    lp = sum(model.get(t, oov) for t in toks) / len(toks)
    return float(2.0 ** (-lp))
