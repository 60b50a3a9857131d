"""Model-based quality filtering — the DCLM / FineWeb-Edu shape.

A classifier distilled from heuristic keep/drop labels (trained and
committed by ``scripts/train_models.py`` as
``artifacts/quality_synth.bin``) scores documents at scale; a
threshold on the score replaces — or gates ahead of — the full rule
evaluation.  Why this exists at 10^12 docs: the model score is ONE
mapInPandas pass over the text column (per-executor model load,
closure-shipped, no state, no shuffle), while the full rule suite
needs extraction, stats, LM perplexity and scrubbing; scoring first
and early-dropping obvious junk shrinks the expensive path's input.

The scorer is any ``text -> P(keep)`` callable, so the committed
fastText artifact, a stand-in, or a future real model all ride the
same seam (exactly like ``udfs.make_process_udfs``'s ``langid_fn``).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def fasttext_keep_scorer(model, keep_label: str = "keep") -> Callable[[str | None], float]:
    """A committed fastText classifier -> ``text -> P(keep)``.

    ``model``: a ``functions.models.FastTextModel`` (e.g. from
    ``load_fasttext_bin('artifacts/quality_synth.bin')``) whose labels
    include ``__label__<keep_label>``."""
    # EXACT label match — a suffix test would silently pick e.g.
    # '__label__not_keep' and invert every keep/drop score
    want = f"__label__{keep_label}"
    keep_idx = next(
        (i for i, (lb, _c) in enumerate(model.labels) if lb == want), None
    )
    if keep_idx is None:
        raise ValueError(
            f"model has no label {want!r}; labels: "
            f"{[lb for lb, _c in model.labels]}"
        )

    def score(text: str | None) -> float:
        if not text:
            return 0.0  # empty/null is never keepable
        return float(model.predict_scores(text)[keep_idx])

    return score


def score_quality(
    df: DataFrame,
    score_fn: Callable[[str | None], float],
    text_col: str = "text",
    threshold: float = 0.5,
    score_col: str = "quality_score",
    keep_col: str = "model_keep",
) -> DataFrame:
    """Append ``quality_score`` (P(keep)) and ``model_keep`` (score >=
    threshold) to every row — one Arrow-batched map pass, zero
    shuffles; all input columns pass through."""
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(score_col, T.DoubleType(), True),
            T.StructField(keep_col, T.BooleanType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scores = [score_fn(t) for t in pdf[text_col]]
            pdf[score_col] = pd.Series(scores, index=pdf.index, dtype="float64")
            pdf[keep_col] = pdf[score_col] >= threshold
            yield pdf

    return df.mapInPandas(run, schema=schema)
