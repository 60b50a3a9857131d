"""Array higher-order functions (SURVEY §2.3) — all JVM-side, no UDFs.

The centerpiece is A5: reconstruction of diff-of-diff sparse-encoded
arrays.  The reference calls an external decoder for this
(``python/dqmtools/dqmtests/wibeth_tests.py:191``:
``desparsify_array_diff_of_diff_locs_and_vals(first, idx, vals,
n_frames*64)[-1]``) inside a per-row pandas ``apply`` — the hottest
per-row lambda in the repo.  Here the same math is a Spark
``transform``/``aggregate`` expression, so it runs in whole-stage
codegen over every row of a distributed table.

Encoding semantics (and the closed forms used below):

  The length-``n`` array ``arr`` has first differences
  ``d[j] = arr[j+1] - arr[j]`` (j = 0..n-2), and the second
  differences ``dd[0] = d[0], dd[j] = d[j] - d[j-1]`` are sparse:
  nonzero only at positions ``idx`` with values ``vals``.

  Therefore  ``d[j]   = Σ_{k: idx_k <= j} vals_k``
  and        ``arr[i] = first + Σ_{j<i} d[j]
                      = first + Σ_k vals_k * max(0, i - idx_k)``.

  Two closed forms fall out (used by the oracle-differential test —
  they compute the same numbers WITHOUT materializing the array):
    last  = arr[n-1] = first + Σ_k vals_k * (n-1 - idx_k)
    total = Σ_i arr[i] = n*first + Σ_k vals_k * T(n-1-idx_k),
            T(m) = m*(m+1)/2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def desparsify_diff_of_diff(
    first: Column | str,
    idx: Column | str,
    vals: Column | str,
    n: Column | str,
) -> Column:
    """Full array reconstruction: returns ``array<long>`` of length n.

    O(n * nnz) work per row, entirely in codegen; at 100 TB this beats
    any Python decode because no rows cross the JVM boundary.
    """
    first, idx, vals, n = (_as_col(c) for c in (first, idx, vals, n))
    pairs = F.zip_with(
        idx.cast("array<long>"),
        vals.cast("array<long>"),
        lambda i, v: F.struct(i.alias("i"), v.alias("v")),
    )
    zero = F.lit(0).cast("long")
    return F.transform(
        F.sequence(F.lit(0).cast("long"), n.cast("long") - 1),
        lambda pos: first.cast("long")
        + F.aggregate(
            pairs,
            zero,
            lambda acc, p: acc + p["v"] * F.greatest(zero, pos - p["i"]),
        ),
    )


def desparsify_last(
    first: Column | str,
    idx: Column | str,
    vals: Column | str,
    n: Column | str,
) -> Column:
    """Last element only — the exact quantity wibeth_tests.py:191 needs
    (readout-window coverage check) without building the array."""
    first, idx, vals, n = (_as_col(c) for c in (first, idx, vals, n))
    contrib = F.zip_with(
        idx.cast("array<long>"),
        vals.cast("array<long>"),
        lambda i, v: v * (n.cast("long") - 1 - i),
    )
    return first.cast("long") + F.aggregate(
        contrib, F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def count_not_equal(arr: Column | str, value) -> Column:
    """A1/A2: ``(x.vals != good_value).sum()`` (wibeth_tests.py:20,76)."""
    return F.size(F.filter(_as_col(arr), lambda v: v != F.lit(value)))


def any_exceeds(arr: Column | str, limit) -> Column:
    """A8 domain check: any element over a physical limit
    (dump_pds_ana_info.py:158-160, adc > 2**14)."""
    return F.exists(_as_col(arr), lambda v: v > F.lit(limit))


def slice_between_values(
    arr: Column | str, ts: Column | str, begin: Column, end: Column
) -> Column:
    """A7: slice ``arr`` to the positions where the parallel ``ts``
    array lies in [begin, end] (dump_pds_ana_info.py:167-188)."""
    arr, ts = _as_col(arr), _as_col(ts)
    zipped = F.zip_with(ts, arr, lambda t, a: F.struct(t.alias("t"), a.alias("a")))
    kept = F.filter(zipped, lambda p: (p["t"] >= begin) & (p["t"] <= end))
    return F.transform(kept, lambda p: p["a"])
