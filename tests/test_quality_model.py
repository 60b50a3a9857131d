"""Model-based quality filtering (DCLM / FineWeb-Edu shape):
`artifacts/quality_synth.bin` is a fastText keep/drop classifier
distilled from the heuristic rule suite by `scripts/train_models.py`
(teacher = the independent pandas reference labeler).  Tests load the
COMMITTED artifact — no training happens here — and hold it to the
teacher's labels on fresh pages through the Spark operator.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from dqmtools_spark.functions.models import load_fasttext_bin
from dqmtools_spark.operators.quality_model import (
    fasttext_keep_scorer,
    score_quality,
)

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts", "quality_synth.bin")


@pytest.fixture(scope="module")
def qmodel():
    return load_fasttext_bin(ART)


def test_artifact_is_a_keep_drop_classifier(qmodel):
    labels = sorted(lb for lb, _c in qmodel.labels)
    assert labels == ["__label__drop", "__label__keep"]
    score = fasttext_keep_scorer(qmodel)
    assert score(None) == 0.0 and score("") == 0.0
    assert 0.0 <= score("some ordinary words here") <= 1.0


def test_agreement_with_reference_labels_on_fresh_pages(qmodel, spark):
    """Score 400 pages the artifact never trained on (different seed)
    via the Spark operator; agreement with the independent reference
    labeler must stay >= 0.95 (held-out training metric was 0.981,
    majority baseline 0.854)."""
    from reference_impl import label_pages

    from dqmtools_spark.synth import gen_pages_pdf

    pages = gen_pages_pdf(777, list(range(400)))
    lab = label_pages(pages)
    pdf = lab[["url", "text_extracted", "keep"]].rename(
        columns={"text_extracted": "text"}
    )
    df = spark.createDataFrame(pdf[["url", "text"]])
    scored = score_quality(df, fasttext_keep_scorer(qmodel), text_col="text")
    got = {r["url"]: r for r in scored.collect()}
    model_keep = np.array([got[u]["model_keep"] for u in pdf["url"]])
    ref_keep = pdf["keep"].to_numpy()
    agreement = float((model_keep == ref_keep).mean())
    majority = max(ref_keep.mean(), 1 - ref_keep.mean())
    assert agreement >= 0.95, f"agreement {agreement}"
    assert agreement > majority + 0.05  # genuinely beats always-keep
    # scores are calibrated-ish: mean score of kept >> dropped
    scores = np.array([got[u]["quality_score"] for u in pdf["url"]])
    assert scores[ref_keep].mean() - scores[~ref_keep].mean() > 0.5


def test_operator_passthrough_threshold_and_plan(qmodel, spark):
    from dqmtools_spark.plans.audit import explain_str

    df = spark.createDataFrame(
        [(1, "good plain text with several common words", "x"),
         (2, None, "y")],
        ["id", "text", "extra"],
    )
    out = score_quality(
        df, fasttext_keep_scorer(qmodel), text_col="text", threshold=0.9
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["extra"] == "x"            # input columns pass through
    assert rows[2]["quality_score"] == 0.0 and rows[2]["model_keep"] is False
    assert (rows[1]["quality_score"] >= 0.9) == rows[1]["model_keep"]
    plan = explain_str(out)
    assert "Exchange" not in plan             # map-only: zero shuffles
