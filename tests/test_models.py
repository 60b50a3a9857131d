"""Real trained artifacts through the model seam (VERDICT r3 item 3).

The seam (``udfs.make_process_udfs``) has so far only carried stand-ins.
These tests put the COMMITTED, genuinely-trained artifacts through it:

- ``artifacts/langid_synth.bin`` — fastText supervised classifier in
  the official .bin v12 binary layout (magic 793712314), trained by
  ``scripts/train_models.py`` on 1,600 synth pages;
- ``artifacts/webtext_en_3gram.arpa.gz`` — interpolated Witten–Bell
  3-gram backoff LM in KenLM/SRILM ARPA interchange format.

Assertions are exact where math permits (format round-trips,
per-context probability normalization, worker-vs-driver score
equality) and statistical where they can't be (held-out accuracy).

Reference anchor: per-channel decoder state built once and reused
(``dataframe_creator.py:32-116``) — here, a model loaded once
driver-side whose bound method rides the UDF closure to executors.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from dqmtools_spark.functions.models import (
    ArpaLM,
    BOS,
    EOS,
    UNK,
    ft_hash,
    ft_subwords,
    load_arpa,
    load_fasttext_bin,
    save_fasttext_bin,
    tokenize,
    train_arpa,
    train_fasttext_supervised,
    write_arpa,
)
from dqmtools_spark.synth import gen_pages_pdf

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts")
FT_BIN = os.path.join(ART, "langid_synth.bin")
ARPA_GZ = os.path.join(ART, "webtext_en_3gram.arpa.gz")

# training corpus: same generator, DIFFERENT seed from train_models.py
# (101) — every page here is unseen by both artifacts
_EVAL_SEED = 707


def _eval_pages(n=300):
    return gen_pages_pdf(_EVAL_SEED, list(range(n)))


# ===================================================================
# ARPA LM: format + math
# ===================================================================


def _tiny_lm(order=3, **kw):
    corpus = [
        tokenize(t)
        for t in [
            "the cat sat on the mat",
            "the dog sat on the rug",
            "a cat and a dog",
            "the cat ran to the dog",
            "the mat was on the rug",
        ]
        * 3
    ]
    return train_arpa(corpus, order=order, **kw)


def test_arpa_each_context_sums_to_one():
    """After pruning + backoff renormalization, p(.|h) must sum to 1
    over the vocabulary for EVERY listed context — the defining
    invariant of a valid backoff model."""
    lm = _tiny_lm(word_min_count=1, prune_min_counts=(1, 1, 2))
    vocab = sorted(lm.vocab - {BOS})
    for n in range(1, lm.order):
        for ctx in list(lm.table[n]):
            total = sum(
                10.0 ** lm.word_logprob(ctx, w) for w in vocab
            )
            assert math.isclose(total, 1.0, abs_tol=1e-9), (ctx, total)


def test_arpa_write_load_roundtrip(tmp_path):
    lm = _tiny_lm(word_min_count=1)
    p = str(tmp_path / "m.arpa.gz")
    write_arpa(lm, p)
    lm2 = load_arpa(p)
    assert lm2.order == lm.order
    assert set(lm2.table[3]) == set(lm.table[3])
    for text in ["the cat sat on the rug", "a dog ran", "unseen words here"]:
        a, b = lm.text_perplexity(text), lm2.text_perplexity(text)
        assert a == pytest.approx(b, rel=1e-6), text


def test_arpa_oov_and_empty():
    lm = _tiny_lm(word_min_count=1)
    assert lm.text_perplexity("") is None
    assert lm.text_perplexity(None) is None
    # all-OOV text scores via <unk>, finite and positive
    v = lm.text_perplexity("zzz qqq xxx")
    assert v is not None and 1.0 < v < 1e9


def test_committed_arpa_artifact_separates_domains():
    """The checked-in LM was trained on English synth pages: held-out
    English text must score far lower perplexity than other langs."""
    lm = load_arpa(ARPA_GZ)
    assert lm.order == 3
    pdf = _eval_pages()
    ppl = {
        grp: float(
            np.mean([
                v for v in (lm.text_perplexity(t) for t in pdf[pdf["lang"] == grp]["text"])
                if v is not None
            ])
        )
        for grp in ("en", "fr", "de")
    }
    assert ppl["en"] * 3 < min(ppl["fr"], ppl["de"]), ppl


# ===================================================================
# fastText: format + hashing + classification
# ===================================================================


def test_ft_hash_is_fasttext_fnv1a():
    """Known values: 'hello' hashes to textbook FNV-1a 0x4F9F2CAB
    (ASCII: sign-extension is a no-op); non-ASCII diverges from
    textbook FNV-1a because fastText casts each byte through int8_t."""
    assert ft_hash("hello") == 0x4F9F2CAB
    textbook = 2166136261
    for b in "café".encode("utf-8"):
        textbook = ((textbook ^ b) * 16777619) & 0xFFFFFFFF
    assert ft_hash("café") != textbook
    assert ft_hash("café") == 1970454601  # int8-extended variant, pinned


def test_ft_subwords_match_fasttext_walk():
    # codepoint-aligned, '<'/'>' decoration, no 1-gram at the edges
    assert ft_subwords("ab", 2, 3) == ["<a", "<ab", "ab", "ab>", "b>"]
    # multibyte chars count as ONE position
    assert ft_subwords("café", 3, 3) == ["<ca", "caf", "afé", "fé>"]


def test_ft_bin_roundtrip(tmp_path):
    texts = ["aa bb cc", "dd ee ff", "aa cc", "ee ff dd"] * 5
    labels = (["x"] * 2 + ["y"] * 2) * 5
    m = train_fasttext_supervised(texts, labels, dim=4, bucket=64, epoch=3, min_count=1)
    p = str(tmp_path / "m.bin")
    save_fasttext_bin(m, p)
    m2 = load_fasttext_bin(p)
    assert m2.words == m.words and m2.labels == m.labels
    assert np.array_equal(m2.w_in, m.w_in) and np.array_equal(m2.w_out, m.w_out)
    assert [m.predict(t) for t in texts] == [m2.predict(t) for t in texts]


def test_ft_bin_rejects_bad_magic(tmp_path):
    p = str(tmp_path / "junk.bin")
    with open(p, "wb") as f:
        f.write(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        load_fasttext_bin(p)


def test_committed_langid_artifact_accuracy():
    model = load_fasttext_bin(FT_BIN)
    pdf = _eval_pages()
    preds = [model.predict(t) for t in pdf["text"]]
    acc = float(np.mean([p == l for p, l in zip(preds, pdf["lang"])]))
    assert acc > 0.95, acc
    assert model.predict("") == "und"


# ===================================================================
# through the seam: loaded artifacts drive the Spark pipeline
# ===================================================================


def test_real_models_through_pipeline_seam(spark):
    """Load BOTH committed artifacts driver-side, run the full pipeline
    with them injected, and check the workers computed EXACTLY what the
    driver-side models say — proving the real model objects (not
    stand-ins) reached the executors via the closure."""
    from dqmtools_spark.pipeline import python_phase, run_pipeline
    from dqmtools_spark.synth import synth_pages

    model = load_fasttext_bin(FT_BIN)
    lm = load_arpa(ARPA_GZ)
    models = {"langid_fn": model.predict, "ppl_fn": lm.text_perplexity}

    pages = synth_pages(spark, 60, seed=_EVAL_SEED)
    enriched = python_phase(pages, models=models)
    rows = enriched.select("url", "text_ex", "lang_pred", "perplexity").collect()
    assert rows
    mismatches = []
    for r in rows:
        want_lang = model.predict(r["text_ex"])
        want_ppl = lm.text_perplexity(r["text_ex"])
        ok_ppl = (
            (want_ppl is None and r["perplexity"] is None)
            or (want_ppl is not None and r["perplexity"] == pytest.approx(want_ppl, rel=1e-9))
        )
        if r["lang_pred"] != want_lang or not ok_ppl:
            mismatches.append(r["url"])
    assert not mismatches, mismatches

    # and through the FULL pipeline (rules fold on top of the injected
    # models' outputs), the predictions agree with ground truth
    res, _ = run_pipeline(spark, pages, n_buckets=4, models=models)
    out = res.select("url", "lang_pred").collect()
    truth = {p["url"]: p["lang"] for p in pages.select("url", "lang").collect()}
    agree = float(np.mean([r["lang_pred"] == truth[r["url"]] for r in out]))
    assert agree > 0.9, agree


def test_path_based_handles_cache_per_process_and_match_closure(spark):
    """langid_fn_from_path / ppl_fn_from_path: picklable, load the
    artifact once per process (module cache), and score identically to
    the closure-shipped bound methods."""
    from pyspark import cloudpickle

    from dqmtools_spark.functions import models as M

    lp = "artifacts/langid_synth.bin"
    ap = "artifacts/webtext_en_3gram.arpa.gz"
    lang_h, ppl_h = M.langid_fn_from_path(lp), M.ppl_fn_from_path(ap)
    # round-trip through cloudpickle (what the UDF closure does) — tiny
    blob = cloudpickle.dumps((lang_h, ppl_h))
    assert len(blob) < 10_000  # paths, not matrices
    lang_h2, ppl_h2 = cloudpickle.loads(blob)

    ft, lm = M.load_fasttext_bin(lp), M.load_arpa(ap)
    for t in ("the quick brown fox", "der die das und", "abc xyz one two"):
        assert lang_h2(t) == ft.predict(t)
        assert ppl_h2(t) == lm.text_perplexity(t)
    # second call reuses the cached object (same identity)
    before = M._PROCESS_CACHE.get(lp)
    lang_h2("再 来 一次 的 是")
    assert M._PROCESS_CACHE.get(lp) is before
