"""Sliding-window array kernels that are safe to inline.

THE TRAP (found by tools/scale_probe.py, round 4): the obvious
sliding-window expression

    transform(sequence(1, greatest(size(arr) - k + 1, 1)),
              i -> f(slice(arr, i, k)))

captures ``arr`` inside the lambda body. Catalyst's CollapseProject
then substitutes the full DEFINITION of ``arr`` (a split, an
md5-transform, ...) into the body, and higher-order functions are
interpreted, not codegen'd — so the captured expression is
re-evaluated once PER WINDOW INDEX: O(len²) work per row. Measured
on q_containment at sf0.1 (5k docs, ~100-word texts): the winnowing
fingerprint projection alone took ~100 s; the arrays_zip form below
brings the whole query to seconds. The blowup is invisible at
sf0.01-scale correctness runs and catastrophic at 10×.

THE FIX: build the windows as ``arrays_zip`` of k SHIFTED SLICES.
The expensive array expression appears only in zip ARGUMENTS and
size guards — a small constant number of evaluations per row
(~2k+2 after CollapseProject), never per element — and the lambda
body touches nothing but its own element:

    z = arrays_zip(slice(arr,1,n) as w0, slice(arr,2,n) as w1, ...)
    transform(z, s -> f(s.w0, s.w1, ...))

Edge parity with the slice form: a window reaching past the end of
the array yields NULL struct fields where slice() would truncate;
``concat_ws`` skips NULLs and ``least`` ignores NULLs, so the
k-gram join and window-min below are byte-identical to the naive
form, including the short-document edge (n is clamped to ≥ 1 so a
doc shorter than one window still emits its truncated window).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _shifted_zip(arr: Column, k: int, prefix: str) -> Column:
    """arrays_zip of k slices of ``arr`` shifted by 0..k-1, each of
    length n = max(size(arr)-k+1, 1). Field j is named {prefix}{j}."""
    n = F.greatest(F.size(arr) - (k - 1), F.lit(1))
    return F.arrays_zip(
        *[F.slice(arr, j + 1, n).alias(f"{prefix}{j}") for j in range(k)]
    )


def sliding_join(arr: Column, k: int, sep: str = " ") -> Column:
    """Array of k-gram strings over ``arr`` (length max(size-k+1, 1);
    the final partial windows of the naive slice form are reproduced
    via concat_ws's NULL-skipping, and an empty input yields ['']
    exactly as slice-of-empty → concat_ws does)."""
    z = _shifted_zip(arr, k, "w")
    joined = F.transform(
        z, lambda s: F.concat_ws(sep, *[s[f"w{j}"] for j in range(k)])
    )
    return F.when(F.size(arr) > 0, joined).otherwise(F.array(F.lit("")))


def chunked_join(arr: Column, k: int, sep: str = " ") -> Column:
    """Array of NON-overlapping k-word chunk strings (stride k,
    length ceil(size/k); empty input → empty array). Chunk j's
    members are gathered with filter-by-index — the index lambda
    references only the filter's own argument, so nothing is
    captured — then zipped positionally."""
    cols = [
        F.filter(arr, lambda x, i: i % k == F.lit(j)).alias(f"c{j}")
        for j in range(k)
    ]
    z = F.arrays_zip(*cols)
    return F.transform(z, lambda s: F.concat_ws(sep, *[s[f"c{j}"] for j in range(k)]))


def sliding_min(arr: Column, w: int) -> Column:
    """Array of windowed minima over ``arr`` (length max(size-w+1, 1);
    least() ignores the NULLs of partial windows; an empty input
    yields [NULL] exactly as array_min(slice-of-empty) does)."""
    z = _shifted_zip(arr, w, "h")
    mins = F.transform(z, lambda s: F.least(*[s[f"h{j}"] for j in range(w)]))
    return F.when(F.size(arr) > 0, mins).otherwise(F.array(F.array_min(arr)))
