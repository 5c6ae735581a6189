"""Array helpers shared by operators.

``explode_computed`` exists because of a Catalyst pitfall measured in
this repo: exploding a *computed* array expression (a ``transform``/
``array_distinct``/``split`` chain rather than a materialized column)
lets the InferFiltersFromGenerate rule synthesize
``size(expr) > 0 AND isnotnull(expr)`` below the Generate. Filter
pushdown then inlines projection aliases into that condition, so the
array expression is re-evaluated per row — and if the expression
indexes into an aliased ``split()`` (``element_at(_words, i)``), the
inlining turns each index access into a fresh re-split: O(len²) per
document. Measured on the 3-gram shingle pipeline at sf0.1: 8.3 s vs
0.5 s for the same 260 k-row explode.

``explode_outer`` is exempt from the rule (an outer generate must keep
empty-array rows, so no filter can be inferred); filtering the
*generated* column afterwards is one cheap null-check per output row
and reproduces inner-explode semantics exactly (explode drops
null/empty arrays; explode_outer emits a single null element for them,
which the filter removes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def explode_computed(expr: Column | str, alias: str) -> tuple[Column, Column]:
    """Explode a computed array expression without triggering
    InferFiltersFromGenerate re-evaluation.

    Returns ``(exploded_col, keep_filter)``: select the first, then
    ``.filter`` the second::

        col, keep = explode_computed(grams, "bigram")
        df.select("doc_id", col).filter(keep)
    """
    return F.explode_outer(expr).alias(alias), F.col(alias).isNotNull()
