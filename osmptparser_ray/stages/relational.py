"""General relational operators (guide patterns as first-class functions).

* ``topk_per_group`` — top-k rows per group key by a score column:
  per-batch partial top-k (vectorized pandas sort/head — a combiner that
  caps shuffle volume at k rows per group per batch) then a per-group
  merge. The training-data staple "best k documents per domain".
* ``broadcast_join`` — map-side dimension enrichment: the small side is
  collected once, ``ray.put``, and merged into every batch with a pandas
  hash merge — zero shuffle (guide §joins: "small side: broadcast it").
"""

from __future__ import annotations

from typing import Literal, Optional

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..util import cached_get


def topk_per_group(
    ds: rd.Dataset,
    group_col: str,
    score_col: str,
    k: int,
    *,
    tiebreak_col: Optional[str] = None,
    descending: bool = True,
) -> rd.Dataset:
    """Top-k rows per group by score (ties broken by ``tiebreak_col`` asc).

    Output: input columns + ``rank`` (1-based within group).
    """
    sort_cols = [score_col] + ([tiebreak_col] if tiebreak_col else [])
    asc = [not descending] + ([True] if tiebreak_col else [])

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values(sort_cols, ascending=asc, kind="stable")
            .groupby(group_col, sort=False)
            .head(k)
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=asc, kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = range(1, len(g) + 1)
        return g

    return (
        ds.map_batches(partial_topk, batch_format="pandas")
        .groupby(group_col)
        .map_groups(merge, batch_format="pandas")
    )


def broadcast_join(
    ds: rd.Dataset,
    small: rd.Dataset,
    on: str,
    right_on: Optional[str] = None,
    *,
    how: Literal["inner", "left"] = "inner",
) -> rd.Dataset:
    """Enrich ``ds`` with columns from a SMALL dimension table — no shuffle.

    ``small`` is fully collected (must fit driver/worker memory — dimension
    tables, vocabularies, blocklists) and merged per batch.
    """
    rkey = right_on or on
    small_pd = small.to_pandas()
    small_ref = ray.put(small_pd)

    def enrich(batch: pd.DataFrame) -> pd.DataFrame:
        dim = cached_get(small_ref)
        out = batch.merge(dim, left_on=on, right_on=rkey, how=how)
        if rkey != on and rkey in out.columns:
            out = out.drop(columns=[rkey])
        return out

    return ds.map_batches(enrich, batch_format="pandas")



_SAMPLE_MULT = 2654435761  # Knuth multiplicative constant


def deterministic_sample(
    ds: rd.Dataset,
    fraction: float,
    on: str,
    *,
    salt: int = 0,
) -> rd.Dataset:
    """Deterministic hash sampling: keep rows where
    ``((id mod 2^31) * K + salt) mod 2^32 < fraction * 2^32``.

    Unlike ``Dataset.random_sample`` this is REPRODUCIBLE across runs,
    partitionings, and engines (the same closed-form predicate runs in SQL)
    — the property training pipelines need for stable held-out splits.

    The key is masked to 31 bits BEFORE the multiply so the largest
    intermediate, (2^31−1)·K ≈ 5.7e18, fits a signed 64-bit integer —
    the SQL transliteration ``((id % 2147483648) * 2654435761 + salt) %
    4294967296`` therefore never overflows BIGINT for any id. SQL parity
    assumes NON-NEGATIVE ids (SQL ``%`` takes the dividend's sign; numpy's
    takes the divisor's, so they disagree on negative keys).
    """
    threshold = int(fraction * (1 << 32))

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        keys = batch[on].to_numpy().astype(np.int64)
        h = ((keys % (1 << 31)) * _SAMPLE_MULT + salt) % (1 << 32)
        return batch[h < threshold]

    return ds.map_batches(f, batch_format="pandas")


def stratified_sample(
    ds: rd.Dataset,
    fractions: dict,
    strata_col: str,
    on: str,
    *,
    salt: int = 0,
) -> rd.Dataset:
    """Per-stratum deterministic sampling: ``fractions`` maps stratum value →
    keep fraction (missing strata are dropped). Same closed-form hash as
    ``deterministic_sample`` (31-bit-masked key — see there for the SQL
    overflow-safety argument) — SQL-expressible, reproducible."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        keys = batch[on].to_numpy().astype(np.int64)
        h = ((keys % (1 << 31)) * _SAMPLE_MULT + salt) % (1 << 32)
        thresh = batch[strata_col].map(
            lambda s: int(fractions.get(s, 0.0) * (1 << 32))
        ).to_numpy()
        return batch[h < thresh]

    return ds.map_batches(f, batch_format="pandas")
