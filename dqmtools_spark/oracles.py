"""DuckDB oracle SQL builders for the engine-portable operator tiers.

Every generator here emits ANSI-ish SQL that DuckDB runs over the same
parquet tables as the Spark queries in ``__spark_entry__.py``; the
driver compares rows + schema + value hashes.  The design rule that
makes full-output verification possible for LSH/ANN operators: every
DISCRETE decision (hash, band bucket, plane sign, centroid assignment,
probe choice) is exact integer arithmetic over engine-portable hashes
(md5-derived, ``functions/hashing.py``) or quantized vectors
(``similarity.QUANT_SCALE``), so both engines make bit-identical
decisions; floating point appears only in emitted score columns
(cosine), where a single exact division or a ROUND(…, 4) absorbs
summation-order noise (same policy the round-1 oracles shipped with).

Thresholds / marker sets / LM vocabulary are imported from the SAME
modules the pipeline uses, so a config change cannot de-sync the
oracle from the engine.
"""

from __future__ import annotations

from dqmtools_spark.functions.hashing import (
    P31,
    md5_hash60_sql,
    universal_hash_consts,
)
from dqmtools_spark.functions.textproc import LANG_MARKERS, lm_and_oov
from dqmtools_spark.functions.textstats import ALL_MARKERS
from dqmtools_spark.operators.similarity import QUANT_SCALE
from dqmtools_spark.rules.builtin import LANG_THRESHOLDS, THRESHOLDS


# 60-bit md5 hash fragment — the ONE definition, shared with the Spark
# column form via functions/hashing.py
_md5h = md5_hash60_sql


def _in_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _int_list(vals) -> str:
    return "[" + ", ".join(str(int(v)) for v in vals) + "]"


# --------------------------------------------------------------- MinHash


def minhash_pairs_sql(
    n: int = 3, num_hashes: int = 32, bands: int = 8, threshold: float = 0.5
) -> str:
    """Full-output oracle for ``minhash_lsh_pairs_md5``: same shingles,
    same md5+Carter-Wegman minhash family, same banded candidate rule
    (some signature slice agrees), same exact-Jaccard verify.  At the
    oracle's scale (sf0.01, ~500 docs) the banding is evaluated as an
    all-pairs EXISTS over band slices instead of a join — identical
    candidate semantics, trivially correct."""
    consts = universal_hash_consts(num_hashes)
    rows = num_hashes // bands
    mins = ",\n               ".join(
        f"LIST_MIN(LIST_TRANSFORM(x, v -> ({a} * v + {b}) % {P31}))"
        for a, b in consts
    )
    band_eq = "\n           OR ".join(
        f"a.s[{b * rows + 1}:{(b + 1) * rows}] = b.s[{b * rows + 1}:{(b + 1) * rows}]"
        for b in range(bands)
    )
    jac = (
        "CAST(LEN(LIST_INTERSECT(a.x, b.x)) AS DOUBLE) / "
        "(LEN(a.x) + LEN(b.x) - LEN(LIST_INTERSECT(a.x, b.x)))"
    )
    return f"""
        WITH w0 AS (
            -- NULL text is excluded up front (Spark: null shingle set
            -- -> null signature -> filtered before banding)
            SELECT doc_id, REGEXP_EXTRACT_ALL(TRIM(text), '\\S+') AS w
            FROM documents WHERE text IS NOT NULL
        ),
        grams AS (
            SELECT doc_id,
                   LIST_DISTINCT(LIST_TRANSFORM(
                       GENERATE_SERIES(1, GREATEST(LEN(w) - {n - 1}, 1)),
                       i -> ARRAY_TO_STRING(w[i:i + {n - 1}], ' ')
                   )) AS g
            FROM w0
        ),
        sh AS (
            SELECT doc_id,
                   LIST_DISTINCT(LIST_TRANSFORM(g, s -> {_md5h('s')} % {P31})) AS x
            FROM grams
        ),
        sig AS (
            SELECT doc_id, x,
               [{mins}] AS s
            FROM sh WHERE LEN(x) > 0
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, {jac} AS jaccard
        FROM sig a, sig b
        WHERE a.doc_id < b.doc_id
          AND ({band_eq})
          AND {jac} >= {threshold}
    """


# --------------------------------------------------------------- SimHash


def simhash_pairs_sql(max_hamming: int = 6, n_bits: int = 60) -> str:
    """Full-output oracle for the md5-family ``simhash_pairs``.  With
    ``n_bands > max_hamming`` the Spark banding has recall exactly 1.0
    (pigeonhole), so the emitted set is EXACTLY all pairs with
    Hamming <= max_hamming — which is what this SQL computes directly
    from the same bit-vote signatures."""
    return f"""
        WITH t AS (
            SELECT doc_id,
                   LIST_DISTINCT(LIST_TRANSFORM(
                       REGEXP_EXTRACT_ALL(TRIM(LOWER(text)), '\\S+'),
                       w -> {_md5h('w')}
                   )) AS hs
            FROM documents
        ),
        th AS (SELECT doc_id, UNNEST(hs) AS h FROM t),
        votes AS (
            SELECT doc_id, bits.i,
                   SUM(CASE WHEN (h >> bits.i) & 1 = 1 THEN 1 ELSE -1 END) AS v
            FROM th CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {n_bits - 1})) AS i) bits
            GROUP BY doc_id, bits.i
        ),
        sig0 AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN v >= 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS sig
            FROM votes GROUP BY doc_id
        ),
        sigs AS (
            -- empty token set (hs = []) -> signature 0 (tie votes);
            -- NULL text (hs IS NULL) -> excluded, matching the Spark
            -- tier's null-signature contract
            SELECT t.doc_id, COALESCE(sig0.sig, 0) AS sig
            FROM t LEFT JOIN sig0 ON t.doc_id = sig0.doc_id
            WHERE t.hs IS NOT NULL
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
        FROM sigs a, sigs b
        WHERE a.doc_id < b.doc_id
          AND bit_count(xor(a.sig, b.sig)) <= {max_hamming}
    """


# ------------------------------------------------- integer-plane LSH ANN


def _bucket_expr(qcol: str, planes: list[list[int]]) -> str:
    terms = [
        f"(CASE WHEN list_dot_product({qcol}, {_int_list(p)}) >= 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


# floor, not round: floor of the (identically-computed) double has no
# rounding-mode freedom, so every engine quantizes bit-identically even
# when y*SCALE lands exactly on k+0.5 (possible with float32 inputs)
_QUANT = (
    "LIST_TRANSFORM(CAST(embedding AS DOUBLE[]), "
    f"y -> CAST(FLOOR(y * {QUANT_SCALE}) AS BIGINT))"
)

_COS = (
    "list_dot_product(a.v, b.v) / "
    "(SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v)))"
)


def embedding_dup_lsh_sql(planes: list[list[int]], threshold: float = 0.35) -> str:
    """Full-output oracle for ``embedding_cosine_pairs_int``: the
    candidate rule (equal integer-plane sign bucket) is exact integer
    math; the verify cosine is float but only thresholded/rounded."""
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   {_bucket_expr(_QUANT, planes)} AS bucket
            FROM embeddings
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({_COS}, 4) AS cosine
        FROM e a, e b
        WHERE a.vec_id < b.vec_id
          AND a.bucket = b.bucket
          AND {_COS} >= {threshold}
    """


def embedding_dup_lsh_banded_sql(
    plane_sets: list[list[list[int]]], threshold: float = 0.5
) -> str:
    """Full-output oracle for ``embedding_cosine_pairs_int_banded``:
    each band's bucket is the same exact integer sign pattern as the
    single-band oracle; a pair is a candidate when ANY band agrees
    (the OR-construction), then exact cosine verifies.  DuckDB
    evaluates the OR over all-pairs directly (the corpus is small at
    oracle scale); Spark reaches the same pair set through the banded
    equi-join."""
    bucket_cols = ", ".join(
        f"{_bucket_expr(_QUANT, ps)} AS bkt{i}"
        for i, ps in enumerate(plane_sets)
    )
    any_band = " OR ".join(
        f"a.bkt{i} = b.bkt{i}" for i in range(len(plane_sets))
    )
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {bucket_cols}
            FROM embeddings
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({_COS}, 4) AS cosine
        FROM e a, e b
        WHERE a.vec_id < b.vec_id
          AND ({any_band})
          AND {_COS} >= {threshold}
    """


def ann_topk_sql(planes: list[list[int]], k: int = 10) -> str:
    """Full-output oracle for ``int_ann_query``: probe set = query
    bucket plus every Hamming-1 neighbor (a data-independent rule both
    engines enumerate identically), exact cosine top-k within it."""
    masks = [0] + [1 << p for p in range(len(planes))]
    cosq = (
        "list_dot_product(c.v, q.qv) / "
        "(SQRT(list_dot_product(c.v, c.v)) * SQRT(list_dot_product(q.qv, q.qv)))"
    )
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   {_bucket_expr(_QUANT, planes)} AS bucket
            FROM embeddings
        ),
        q AS (SELECT v AS qv, bucket AS qbucket FROM e WHERE vec_id = 0),
        probes AS (
            SELECT xor(q.qbucket, m.m) AS pb
            FROM q CROSS JOIN (SELECT UNNEST({masks}) AS m) m
        )
        SELECT c.vec_id, ROUND({cosq}, 4) AS cosine
        FROM e c CROSS JOIN q
        WHERE c.vec_id <> 0 AND c.bucket IN (SELECT pb FROM probes)
        ORDER BY {cosq} DESC, c.vec_id ASC
        LIMIT {k}
    """


# ----------------------------------------------------- quantized-IP IVF


def ivf_topk_sql(n_centroids: int = 8, n_probe: int = 3, k: int = 10) -> str:
    """Full-output oracle for ``build_ivf_ip_index`` + ``ivf_ip_query``:
    centroid sample (md5 order), assignment (argmax int dot, tie ->
    smallest centroid index) and probe choice (top-n_probe by int dot)
    are all exact integer decisions; only the emitted cosine is float."""
    cosq = (
        "list_dot_product(a.v, q.qv) / "
        "(SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(q.qv, q.qv)))"
    )
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {_QUANT} AS vq
            FROM embeddings WHERE vec_id <> 0
        ),
        q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv, {_QUANT} AS qq
            FROM embeddings WHERE vec_id = 0
        ),
        cent AS (
            SELECT vq AS cq,
                   ROW_NUMBER() OVER (ORDER BY MD5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
            FROM e
            QUALIFY ROW_NUMBER() OVER (ORDER BY MD5(CAST(vec_id AS VARCHAR)), vec_id) <= {n_centroids}
        ),
        assigned AS (
            SELECT e.vec_id, e.v, c.cid
            FROM e CROSS JOIN cent c
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY e.vec_id
                ORDER BY list_dot_product(e.vq, c.cq) DESC, c.cid ASC) = 1
        ),
        probe AS (
            SELECT c.cid
            FROM cent c CROSS JOIN q
            QUALIFY ROW_NUMBER() OVER (
                ORDER BY list_dot_product(q.qq, c.cq) DESC, c.cid ASC) <= {n_probe}
        )
        SELECT a.vec_id, ROUND({cosq}, 4) AS cosine
        FROM assigned a JOIN probe p ON a.cid = p.cid CROSS JOIN q
        ORDER BY {cosq} DESC, a.vec_id ASC
        LIMIT {k}
    """


# ------------------------------------------------------------- spectral


def spectral_peak_sql(n: int = 32, max_freq: int = 14) -> str:
    """Closed-form oracle for the FFT power-spectrum peak: for the
    synthesized two-tone signal cos(2*pi*f*i/n) + 0.25*cos(2*pi*15*i/n)
    with integer f in [1, max_freq], the one-sided power spectrum peaks
    at bin f with |X_f|^2 = (n/2)^2 exactly (the secondary tone
    contributes (0.25*n/2)^2, 16x smaller).  A real FFT lands within
    ~1e-12 of the closed form — invisible under ROUND(…, 3)."""
    return f"""
        SELECT doc_id,
               CAST(1 + doc_id % {max_freq} AS INTEGER) AS peak_bin,
               CAST({(n // 2) ** 2} AS DOUBLE) AS peak_power
        FROM documents
    """


def global_line_dedup_sql(chunk: int = 4, min_chars: int = 1) -> str:
    """Oracle for corpus-GLOBAL line dedup over the chunked documents
    form (the testdata has no newlines, so both engines first derive
    the same ``chunk``-word lines).  Winner-per-line = first occurrence
    by (doc_id, idx) — ROW_NUMBER over MD5(line) here, min(struct) in
    Spark: identical for the exact same (md5, order) key.  md5 of the
    reassembled text is the byte-level differential."""
    return f"""
        WITH d AS (
            SELECT doc_id,
                   ARRAY_TO_STRING({word_chunks_sql('text', chunk)},
                                   CHR(10)) AS t
            FROM documents
        ),
        l AS (
            SELECT doc_id, s['i'] AS idx, s['l'] AS line
            FROM (SELECT doc_id,
                         UNNEST(LIST_TRANSFORM(STRING_SPLIT(t, CHR(10)),
                                (x, i) -> {{'i': i, 'l': x}})) AS s
                  FROM d)
        ),
        k AS (
            SELECT doc_id, idx, line,
                   (LENGTH(line) < {min_chars}) OR
                   (ROW_NUMBER() OVER (PARTITION BY MD5(line)
                                       ORDER BY doc_id, idx) = 1) AS keep
            FROM l
        )
        SELECT doc_id,
               CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
               MD5(COALESCE(STRING_AGG(CASE WHEN keep THEN line END,
                                       CHR(10) ORDER BY idx), '')) AS dedup_md5
        FROM k
        GROUP BY doc_id
    """


def doc_line_dedup_sql() -> str:
    """Oracle for intra-document repeated-line removal: DuckDB's
    indexed LIST_FILTER + LIST_POSITION are 1-based like Spark's
    array_position, so "keep first occurrence of each exact line"
    is the same expression in both engines; md5 of the reassembled
    text is the byte-level differential."""
    kept = (
        "LIST_FILTER(STRING_SPLIT(text, CHR(10)), "
        "(x, i) -> LIST_POSITION(STRING_SPLIT(text, CHR(10)), x) = i)"
    )
    return f"""
        SELECT doc_id,
               CAST(LEN(STRING_SPLIT(text, CHR(10))) AS BIGINT) AS n_lines,
               CAST(LEN({kept}) AS BIGINT) AS n_kept,
               MD5(ARRAY_TO_STRING({kept}, CHR(10))) AS dedup_md5
        FROM documents
    """


def token_shards_sql(budget: int) -> str:
    """Oracle for greedy token-budget sharding: exclusive running sum
    over doc_id order, shard = cum_before DIV budget — pure integer
    window math plus one INTEGER division (DuckDB ``//`` = Spark
    ``div``), exact over the full int64 range in both engines."""
    return f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS tokens
            FROM documents
        ),
        c AS (
            SELECT doc_id, tokens,
                   SUM(tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM t
        )
        SELECT CAST((cum - tokens) // {int(budget)} AS BIGINT) AS shard,
               COUNT(*) AS n_docs,
               CAST(SUM(tokens) AS BIGINT) AS total_tokens,
               CAST(MIN(tokens) AS BIGINT) AS min_doc_tokens,
               CAST(MAX(tokens) AS BIGINT) AS max_doc_tokens
        FROM c
        GROUP BY 1
    """


def contamination_sql(n: int, eval_max_id: int) -> str:
    """Oracle for n-gram benchmark decontamination: same word shingles
    and md5/mod-p hashes as the Spark operator; distinct-gram hit
    counts per contaminated corpus doc."""
    # STRICT n-grams: a doc with < n words emits no grams (DuckDB
    # generate_series(1, <=0) is the empty list) — matches the Spark
    # operator's strict=True contract
    grams = (
        "LIST_DISTINCT(LIST_TRANSFORM("
        "LIST_TRANSFORM(GENERATE_SERIES(1, "
        f"LEN(REGEXP_EXTRACT_ALL(TRIM(text), '\\S+')) - {n - 1}), "
        f"i -> ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(TRIM(text), '\\S+')[i:i + {n - 1}], ' ')), "
        f"s -> {_md5h('s')} % {P31}))"
    )
    return f"""
        WITH g AS (
            SELECT doc_id, {grams} AS g
            FROM documents WHERE text IS NOT NULL
        ),
        e AS (SELECT DISTINCT UNNEST(g) AS h FROM g WHERE doc_id < {eval_max_id}),
        c AS (SELECT doc_id, UNNEST(g) AS h FROM g WHERE doc_id >= {eval_max_id})
        SELECT c.doc_id, COUNT(DISTINCT c.h) AS n_contaminated_grams
        FROM c JOIN e ON c.h = e.h
        GROUP BY c.doc_id
    """


def dup_ngram_spans_sql(n: int = 8, min_docs: int = 2) -> str:
    """Oracle for the ExactSubstr-style repeated-span signal: SAME
    strict word shingles (with multiplicity) and md5/mod-p hashes as
    ``dedup.duplicated_ngram_spans``; a gram is hot when >= min_docs
    DISTINCT docs carry it; per-doc position counts and fraction."""
    w = "REGEXP_EXTRACT_ALL(TRIM(text), '\\S+')"
    gram_str = f"ARRAY_TO_STRING({w}[i:i + {n - 1}], ' ')"
    grams = (
        f"LIST_TRANSFORM(GENERATE_SERIES(1, LEN({w}) - {n - 1}), "
        f"i -> {_md5h(gram_str)} % {P31})"
    )
    return f"""
        WITH g AS (
            SELECT doc_id, UNNEST({grams}) AS gh
            FROM documents WHERE text IS NOT NULL
        ),
        hot AS (
            SELECT gh FROM (SELECT DISTINCT doc_id, gh FROM g)
            GROUP BY gh HAVING COUNT(*) >= {int(min_docs)}
        ),
        per_doc AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id),
        dup AS (
            SELECT g.doc_id, COUNT(*) AS n_dup_grams
            FROM g JOIN hot ON g.gh = hot.gh
            GROUP BY g.doc_id
        )
        SELECT p.doc_id,
               CAST(p.n_grams AS BIGINT) AS n_grams,
               CAST(COALESCE(d.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
               ROUND(COALESCE(d.n_dup_grams, 0) / CAST(p.n_grams AS DOUBLE), 6)
                   AS dup_fraction
        FROM per_doc p LEFT JOIN dup d USING (doc_id)
    """


def remove_dup_spans_sql(n: int = 8, min_docs: int = 2) -> str:
    """Oracle for ExactSubstr-style repeated-span REMOVAL: same strict
    shingles / md5-mod-p hot-gram decision as ``dup_ngram_spans_sql``,
    then every token position covered by a hot gram start (s .. s+n-1,
    1-based here, 0-based Spark-side — positions never surface) is
    dropped and the text rebuilt by STRING_AGG over surviving tokens in
    position order.  Docs with < n words pass through token-rejoined."""
    w = "REGEXP_EXTRACT_ALL(TRIM(text), '\\S+')"
    gram_str = f"ARRAY_TO_STRING(ws[s:s + {n - 1}], ' ')"
    return f"""
        WITH d AS (
            SELECT doc_id, {w} AS ws FROM documents WHERE text IS NOT NULL
        ),
        g AS (
            SELECT doc_id, s, {_md5h(gram_str)} % {P31} AS gh
            FROM (
                SELECT doc_id, ws,
                       UNNEST(GENERATE_SERIES(1, LEN(ws) - {n - 1})) AS s
                FROM d
            )
        ),
        hot AS (
            SELECT gh FROM (SELECT DISTINCT doc_id, gh FROM g)
            GROUP BY gh HAVING COUNT(*) >= {int(min_docs)}
        ),
        covered AS (
            SELECT DISTINCT doc_id, p FROM (
                SELECT g.doc_id,
                       UNNEST(GENERATE_SERIES(g.s, g.s + {n - 1})) AS p
                FROM g JOIN hot USING (gh)
            )
        ),
        toks AS (
            SELECT doc_id, p, ws[p] AS tok
            FROM (
                SELECT doc_id, ws,
                       UNNEST(GENERATE_SERIES(1, LEN(ws))) AS p
                FROM d
            )
        ),
        kept AS (
            SELECT toks.* FROM toks
            ANTI JOIN covered USING (doc_id, p)
        ),
        rebuilt AS (
            SELECT doc_id,
                   STRING_AGG(tok, ' ' ORDER BY p) AS clean_text,
                   COUNT(*) AS n_kept
            FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(LEN(ws) AS BIGINT) AS n_tokens,
               CAST(LEN(ws) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
               ROUND(CASE WHEN LEN(ws) = 0 THEN 0.0
                          ELSE (LEN(ws) - COALESCE(n_kept, 0))
                               / CAST(LEN(ws) AS DOUBLE)
                     END, 6) AS removed_fraction,
               COALESCE(clean_text, '') AS clean_text
        FROM d LEFT JOIN rebuilt USING (doc_id)
    """


def remove_dup_spans_max_sql(
    n: int = 8, min_docs: int = 2, min_span_chars: int = 50
) -> str:
    """Oracle for MAXIMAL-span removal (``remove_duplicated_spans``
    with ``min_span_chars`` > 0 — the actual Lee et al. 2022 rule):
    same hot-gram/covered-position derivation as
    :func:`remove_dup_spans_sql`, then covered positions merge into
    maximal spans by the gaps-and-islands identity
    (p - ROW_NUMBER() is constant within a run of adjacent positions)
    and only spans whose rejoined char length (token lengths +
    single-space gaps) reaches the threshold are removed.  All the
    span decisions are pure integer math — bit-exact across engines."""
    w = "REGEXP_EXTRACT_ALL(TRIM(text), '\\S+')"
    gram_str = f"ARRAY_TO_STRING(ws[s:s + {n - 1}], ' ')"
    return f"""
        WITH d AS (
            SELECT doc_id, {w} AS ws FROM documents WHERE text IS NOT NULL
        ),
        g AS (
            SELECT doc_id, s, {_md5h(gram_str)} % {P31} AS gh
            FROM (
                SELECT doc_id, ws,
                       UNNEST(GENERATE_SERIES(1, LEN(ws) - {n - 1})) AS s
                FROM d
            )
        ),
        hot AS (
            SELECT gh FROM (SELECT DISTINCT doc_id, gh FROM g)
            GROUP BY gh HAVING COUNT(*) >= {int(min_docs)}
        ),
        covered AS (
            SELECT DISTINCT doc_id, p FROM (
                SELECT g.doc_id,
                       UNNEST(GENERATE_SERIES(g.s, g.s + {n - 1})) AS p
                FROM g JOIN hot USING (gh)
            )
        ),
        toks AS (
            SELECT doc_id, p, ws[p] AS tok
            FROM (
                SELECT doc_id, ws,
                       UNNEST(GENERATE_SERIES(1, LEN(ws))) AS p
                FROM d
            )
        ),
        islands AS (
            SELECT doc_id, p,
                   p - ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY p) AS grp
            FROM covered
        ),
        span_ok AS (
            SELECT i.doc_id, i.grp
            FROM islands i JOIN toks t USING (doc_id, p)
            GROUP BY i.doc_id, i.grp
            HAVING SUM(LENGTH(t.tok)) + COUNT(*) - 1 >= {int(min_span_chars)}
        ),
        removed AS (
            SELECT i.doc_id, i.p
            FROM islands i SEMI JOIN span_ok s
                ON i.doc_id = s.doc_id AND i.grp = s.grp
        ),
        kept AS (
            SELECT toks.* FROM toks
            ANTI JOIN removed USING (doc_id, p)
        ),
        rebuilt AS (
            SELECT doc_id,
                   STRING_AGG(tok, ' ' ORDER BY p) AS clean_text,
                   COUNT(*) AS n_kept
            FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(LEN(ws) AS BIGINT) AS n_tokens,
               CAST(LEN(ws) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
               ROUND(CASE WHEN LEN(ws) = 0 THEN 0.0
                          ELSE (LEN(ws) - COALESCE(n_kept, 0))
                               / CAST(LEN(ws) AS DOUBLE)
                     END, 6) AS removed_fraction,
               COALESCE(clean_text, '') AS clean_text
        FROM d LEFT JOIN rebuilt USING (doc_id)
    """


def doc_top_bigram_sql() -> str:
    """Oracle for the Gopher top-bigram repetition signal: non-distinct
    word bigrams (multiplicity counted), per-doc argmax with
    (count desc, gram asc) ties, char fraction = count*len(gram)/len(text)
    (exact division), averaged per source (rounded — avg over ~100
    doubles carries summation-order noise)."""
    w = "REGEXP_EXTRACT_ALL(TRIM(text), '\\S+')"
    grams = (
        f"LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN({w}) - 1, 1)), "
        f"i -> ARRAY_TO_STRING({w}[i:i + 1], ' '))"
    )
    return f"""
        WITH ex AS (
            SELECT doc_id, source, LENGTH(text) AS nch, UNNEST({grams}) AS g
            FROM documents
        ),
        counts AS (
            SELECT doc_id, source, nch, g, COUNT(*) AS top_count
            FROM ex GROUP BY doc_id, source, nch, g
        ),
        top AS (
            SELECT doc_id, source, nch, g, top_count
            FROM counts
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY top_count DESC, g ASC) = 1
        ),
        per_doc AS (
            SELECT source,
                   CASE WHEN nch = 0 THEN 0.0
                        ELSE CAST(top_count * LENGTH(g) AS DOUBLE) / nch
                   END AS char_fraction,
                   top_count
            FROM top
        )
        SELECT source,
               COUNT(*) AS n_docs,
               ROUND(AVG(char_fraction), 4) AS avg_top_bigram_fraction,
               CAST(MAX(top_count) AS BIGINT) AS max_top_count
        FROM per_doc
        GROUP BY source
    """


# ----------------------------------------------------- quality pipeline


def _lang_case(score_names: dict[str, str]) -> str:
    """Argmax with tie -> alphabetically-first language, as a CASE
    chain over alphabetically ordered languages (parity:
    textproc.predict_lang's min over (-score, lang))."""
    langs = sorted(score_names)
    clauses = []
    for i, lang in enumerate(langs[:-1]):
        rest = [score_names[o] for o in langs[i + 1 :]]
        cond = " AND ".join(f"{score_names[lang]} >= {o}" for o in rest)
        clauses.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{langs[-1]}' END"


def pipeline_result_sql() -> str:
    """Full-output oracle for the quality pipeline's doc_results
    projection (url, keep, lang_pred, quality_score): language ID,
    all nine text stats, unigram perplexity and the 11-rule fold
    recomputed in SQL from the SAME marker sets / vocabulary /
    thresholds the engine imports.

    Scope note: on the driver corpus ``extract_text`` is the identity
    (no tags/entities/space-runs in the synthesized documents —
    asserted for every sf directory in tests), so the oracle computes
    from raw ``text``; the extraction itself is byte-level-tested
    against ``tests/reference_impl.py``.  Float caveat: perplexity is
    a sum of ~100 doubles whose order differs between engines (~1e-13
    relative); a doc sitting within 1e-10 of the 400.0 ceiling could
    in principle flip — no such doc exists at any test sf.
    """
    t = THRESHOLDS
    vocab, oov = lm_and_oov()
    vocab_rows = ",\n                ".join(
        f"('{w}', CAST({lp!r} AS DOUBLE))" for w, lp in sorted(vocab.items())
    )
    marker_counts = ",\n            ".join(
        f"LEN(LIST_FILTER(REGEXP_EXTRACT_ALL(LOWER(text), '\\p{{L}}+'), "
        f"w -> w IN ({_in_list(sorted(LANG_MARKERS[lang]))}))) AS s_{lang}"
        for lang in sorted(LANG_MARKERS)
    )
    lang_case = _lang_case(
        {lang: f"s_{lang}" for lang in [*sorted(LANG_MARKERS), "zh"]}
    )
    thr_stop = " ".join(
        f"WHEN '{r['lang_pred']}' THEN CAST({r['thr_stopword_min']!r} AS DOUBLE)"
        for r in LANG_THRESHOLDS
    )
    thr_ppl = " ".join(
        f"WHEN '{r['lang_pred']}' THEN CAST({r['thr_ppl_max']!r} AS DOUBLE)"
        for r in LANG_THRESHOLDS
    )
    n_rules = 11
    pall = " AND ".join(f"p{i}" for i in range(1, n_rules + 1))
    psum = " + ".join(f"p{i}::INT" for i in range(1, n_rules + 1))
    return f"""
        WITH base AS (
            SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url, text
            FROM documents
        ),
        stats AS (
            SELECT url, text,
            LEN(REGEXP_EXTRACT_ALL(text, '\\S+')) AS wc,
            LENGTH(text) AS nch,
            LEN(REGEXP_EXTRACT_ALL(text, '\\s')) AS nws,
            LEN(REGEXP_EXTRACT_ALL(text, '[^\\p{{L}}\\p{{N}}\\s]')) AS nsym,
            LEN(LIST_FILTER(REGEXP_EXTRACT_ALL(LOWER(text), '\\S+'),
                w -> w IN ({_in_list(ALL_MARKERS)}))) AS nstop,
            LEN(LIST_FILTER(REGEXP_EXTRACT_ALL(text, '\\S+'),
                w -> NOT REGEXP_MATCHES(w, '\\p{{L}}'))) AS nnoalpha,
            LIST_FILTER(STRING_SPLIT(text, CHR(10)),
                x -> LENGTH(TRIM(x)) > 0) AS nel,
            CONTAINS(text, '{{') AS curly,
            {marker_counts},
            LEN(REGEXP_EXTRACT_ALL(text, '[\\x{{4e00}}-\\x{{9fff}}]')) AS s_zh
            FROM base
        ),
        derived AS (
            SELECT url, text, wc, curly,
            CASE WHEN wc = 0 THEN NULL
                 ELSE CAST(nch - nws AS DOUBLE) / wc END AS mwl,
            CASE WHEN nch = 0 THEN 0.0
                 ELSE CAST(nsym AS DOUBLE) / nch END AS symr,
            CASE WHEN wc = 0 THEN 0.0
                 ELSE CAST(nstop AS DOUBLE) / wc END AS stopf,
            CASE WHEN LEN(nel) = 0 THEN 0.0
                 ELSE 1.0 - CAST(LEN(LIST_DISTINCT(nel)) AS DOUBLE) / LEN(nel) END AS repf,
            CASE WHEN wc = 0 THEN 0.0
                 ELSE CAST(wc - nnoalpha AS DOUBLE) / wc END AS alphaf,
            CASE WHEN LEN(nel) = 0 THEN 0.0
                 ELSE CAST(LEN(LIST_FILTER(nel,
                      x -> ends_with(x, '...') OR ends_with(x, '…'))) AS DOUBLE)
                      / LEN(nel) END AS ellf,
            CASE WHEN LEN(nel) = 0 THEN 0.0
                 ELSE CAST(LEN(LIST_FILTER(nel,
                      x -> starts_with(x, '- ') OR starts_with(x, '* ')
                           OR starts_with(x, '• '))) AS DOUBLE)
                      / LEN(nel) END AS bulf,
            {lang_case} AS lang_pred
            FROM stats
        ),
        ptoks AS (
            SELECT url, UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '\\S+')) AS w
            FROM base
        ),
        vocab(w, lp) AS (
            SELECT * FROM (VALUES
                {vocab_rows})
        ),
        plp AS (
            SELECT p.url, SUM(COALESCE(v.lp, CAST({oov!r} AS DOUBLE))) / COUNT(*) AS mlp
            FROM ptoks p LEFT JOIN vocab v ON p.w = v.w
            GROUP BY p.url
        ),
        scored AS (
            SELECT d.*, POWER(2.0, -plp.mlp) AS ppl,
                   CASE d.lang_pred {thr_stop} END AS thr_stop,
                   CASE d.lang_pred {thr_ppl} END AS thr_ppl
            FROM derived d LEFT JOIN plp ON d.url = plp.url
        ),
        flags AS (
            SELECT url, lang_pred,
            COALESCE(wc >= {t['min_word_count']}, FALSE) AS p1,
            COALESCE(wc <= {t['max_word_count']}, FALSE) AS p2,
            COALESCE(mwl BETWEEN {t['min_mean_word_len']!r} AND {t['max_mean_word_len']!r}, FALSE) AS p3,
            COALESCE(symr <= {t['max_symbol_ratio']!r}, FALSE) AS p4,
            COALESCE(repf <= {t['max_repeated_line_fraction']!r}, FALSE) AS p5,
            COALESCE(alphaf >= {t['min_alpha_word_fraction']!r}, FALSE) AS p6,
            COALESCE(ellf <= {t['max_ellipsis_line_fraction']!r}, FALSE) AS p7,
            COALESCE(bulf <= {t['max_bullet_line_fraction']!r}, FALSE) AS p8,
            COALESCE(NOT curly, FALSE) AS p9,
            COALESCE(stopf >= thr_stop, FALSE) AS p10,
            COALESCE(ppl <= thr_ppl, FALSE) AS p11
            FROM scored
        )
        SELECT url,
               ({pall}) AS keep,
               lang_pred,
               CAST({psum} AS DOUBLE) / {n_rules} AS quality_score
        FROM flags
    """


def pipeline_keep_agg_sql() -> str:
    """Aggregated form of :func:`pipeline_result_sql` (keep counts per
    predicted language) — the oracle for the STAGED pipeline query,
    proving fused and staged paths agree under the driver's own gate."""
    return f"""
        WITH r AS ({pipeline_result_sql()})
        SELECT lang_pred,
               COUNT(*) AS n_docs,
               CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_keep,
               CAST(COUNT(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_drop
        FROM r
        GROUP BY lang_pred
    """


def bloom_dedup_sql(m_bits: int, k: int, split_id: int) -> str:
    """Oracle for the Bloom-filter membership query: replays the
    filter bit-for-bit — same md5-60bit double hashing
    ``(h1 + j*h2) mod m`` (h2 forced odd), 63-bit words, BIT_OR build,
    all-bits-set probe — plus the exact-join ground truth that proves
    the no-false-negative law inside the differential itself."""
    from dqmtools_spark.functions.hashing import md5_hash60_sql

    h1 = md5_hash60_sql("text")
    h2 = f"({md5_hash60_sql(chr(39) + 'bloom2:' + chr(39) + ' || text')} | 1)"
    return f"""
        WITH corpus AS (
            SELECT text FROM documents WHERE doc_id >= {split_id}
        ),
        probe AS (
            SELECT doc_id, text FROM documents WHERE doc_id < {split_id}
        ),
        cpos AS (
            SELECT ({h1} + t.j * {h2}) % {m_bits} AS pos
            FROM corpus CROSS JOIN range(0, {k}) AS t(j)
        ),
        words AS (
            SELECT pos // 63 AS word_idx,
                   BIT_OR(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER))
                       AS word
            FROM cpos GROUP BY pos // 63
        ),
        ppos AS (
            SELECT doc_id,
                   ({h1} + t.j * {h2}) % {m_bits} AS pos
            FROM probe CROSS JOIN range(0, {k}) AS t(j)
        ),
        memb AS (
            SELECT p.doc_id,
                   BOOL_AND(((COALESCE(w.word, CAST(0 AS BIGINT))
                              >> CAST(p.pos % 63 AS INTEGER)) & 1) = 1)
                       AS maybe_member
            FROM ppos p
            LEFT JOIN words w ON w.word_idx = p.pos // 63
            GROUP BY p.doc_id
        ),
        actual AS (
            SELECT p.doc_id,
                   (c.text IS NOT NULL) AS actual_dup
            FROM probe p
            LEFT JOIN (SELECT DISTINCT text FROM corpus) c
              ON p.text = c.text
        )
        SELECT m.doc_id, m.maybe_member, a.actual_dup
        FROM memb m JOIN actual a ON m.doc_id = a.doc_id
    """


def word_chunks_sql(expr: str, chunk: int = 4) -> str:
    """DuckDB twin of ``operators/dedup.word_chunks`` — the shared
    chunk-word line derivation used by the global-line-dedup and
    dup-line-fraction oracles."""
    return (
        f"LIST_TRANSFORM(RANGE(1, LEN(STRING_SPLIT({expr}, ' ')) + 1, "
        f"{chunk}), i -> ARRAY_TO_STRING("
        f"STRING_SPLIT({expr}, ' ')[i:i + {chunk - 1}], ' '))"
    )


def cms_user_counts_sql(width: int, depth: int) -> str:
    """Oracle for the count-min sketch query: replays build (explode d
    Carter-Wegman rows -> counter counts) and estimate (min over the d
    counters) with the exact same integer hash literals as the Spark
    plan, joined against the exact counts."""
    from dqmtools_spark.functions.hashing import (
        P31,
        md5_hash60_sql,
        universal_hash_consts,
    )

    consts = universal_hash_consts(depth, tag="cms")
    pos_case = "CASE t.j " + " ".join(
        f"WHEN {j} THEN (({a} * h.h + {b}) % {P31}) % {width}"
        for j, (a, b) in enumerate(consts)
    ) + " END"
    h_expr = md5_hash60_sql("CAST(user_id AS VARCHAR)")
    return f"""
        WITH h AS (
            SELECT user_id, {h_expr} % {P31} AS h FROM events
        ),
        pos AS (
            SELECT h.user_id, t.j, {pos_case} AS pos
            FROM h CROSS JOIN range(0, {depth}) AS t(j)
        ),
        sk AS (
            SELECT j, pos, COUNT(*) AS counter FROM pos GROUP BY j, pos
        ),
        dk AS (SELECT DISTINCT user_id, j, pos FROM pos),
        est AS (
            SELECT dk.user_id,
                   MIN(COALESCE(sk.counter, 0)) AS cms_est
            FROM dk LEFT JOIN sk ON dk.j = sk.j AND dk.pos = sk.pos
            GROUP BY dk.user_id
        ),
        exact AS (
            SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY user_id
        )
        SELECT e.user_id, x.exact_n, e.cms_est,
               e.cms_est - x.exact_n AS over_by
        FROM est e JOIN exact x ON e.user_id = x.user_id
    """


def hll_users_sql(m: int = 32) -> str:
    """Oracle for the HyperLogLog query: same register/rank integer
    math (binary-string length, no float log2), same exact dyadic
    harmonic sum, same fixed-shape final division.  The alpha·m²
    literal is emitted via repr() so both engines parse the identical
    double."""
    from dqmtools_spark.functions.hashing import md5_hash60_sql
    from dqmtools_spark.operators.sketch import hll_alpha, hll_field_bits

    amm = repr(hll_alpha(m) * m * m)
    fb = hll_field_bits(m)
    h_expr = md5_hash60_sql("CAST(user_id AS VARCHAR)")
    return f"""
        WITH h AS (SELECT {h_expr} AS h FROM events),
        r AS (
            SELECT h % {m} AS register,
                   LEAST(CASE WHEN h // {m} = 0 THEN {fb + 1}
                              ELSE {fb + 1} - LENGTH(BIN(h // {m}))
                         END, {fb}) AS rank
            FROM h
        ),
        regs AS (
            SELECT register, MAX(rank) AS max_rank FROM r GROUP BY register
        ),
        s AS (
            SELECT SUM(CAST(1 AS BIGINT)
                       << CAST({fb} - max_rank AS INTEGER)) AS ssum,
                   COUNT(*) AS npres
            FROM regs
        )
        SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_n,
               ROUND({amm} /
                     (CAST(ssum + ({m} - npres) *
                           (CAST(1 AS BIGINT) << {fb}) AS DOUBLE)
                      / {float(1 << fb)!r}), 2) AS hll_est
        FROM s
    """
