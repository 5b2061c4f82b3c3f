"""Tag-filter DSL — condition strings over OSM tag maps.

Semantics from behavioral study of the reference (`filter_relation` /
`filter_way`, /root/reference/src/parser/mod.rs:88-144):

* conditions are '&'-separated conjuncts;
* each conjunct is ``key`` (tag presence) or ``key=v1,v2,...`` (tag present
  AND its value exactly equals one of the comma-separated values);
* only the FIRST '='-piece after the key is used (``k=a=b`` ⇒ values ``a``;
  the trailing ``=b`` is ignored — mirror of Rust's two `.next()` calls);
* the empty filter string "" yields one conjunct with the empty key, which
  no tag map contains ⇒ selects NOTHING (literal reference behavior).

Presets (mod.rs:147-163):
* PTV2  — NOTE deviation documented in SURVEY.md §2.8: the reference's
  literal preset demands a ``route_master`` tag that its own integration
  fixture lacks; the observable contract (integration test passes) requires
  the preset WITHOUT ``route_master``. We ship the contract-passing preset
  and keep the literal one as ``PTV2_LITERAL``.
* AA — administrative areas.

Two evaluation forms:
* ``TagFilter.matches(tags_dict)`` — scalar, for per-row / test use.
* ``TagFilter.mask_table(table, col)`` — vectorized over an Arrow
  ``map<string,string>`` column: flatten once to (row, key, value) arrays,
  then boolean masks per conjunct (no per-row Python loop).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import numpy as np
import pyarrow as pa

PTV2 = "name&route=bus,tram,train,subway,light_rail,monorail,trolleybus"
PTV2_LITERAL = "name&route_master&route=bus,tram,train,subway,light_rail,monorail,trolleybus"
AA = "name&admin_level&boundary=administrative"


class TagFilter:
    """Compiled filter: list of (key, values-or-None) conjuncts."""

    def __init__(self, conditions: str):
        self.source = conditions
        self.conjuncts: list[tuple[str, Optional[list[str]]]] = []
        for condition in conditions.split("&"):
            parts = condition.split("=")
            key = parts[0]
            values = parts[1].split(",") if len(parts) > 1 else None
            self.conjuncts.append((key, values))

    def matches(self, tags: Mapping[str, str]) -> bool:
        for key, values in self.conjuncts:
            if key not in tags:
                return False
            if values is not None and tags[key] not in values:
                return False
        return True

    def mask_flat(
        self, row_idx: np.ndarray, keys: np.ndarray, vals: np.ndarray, num_rows: int
    ) -> np.ndarray:
        """Boolean row mask from pre-flattened (row, key, value) arrays.

        A value conjunct checks only each row's FIRST occurrence of the
        key, matching the reference's ``tags().find(..)`` (mod.rs:93):
        a row whose map carries duplicate keys (legal in Arrow maps and in
        XML <tag> children) passes iff the first occurrence's value
        matches — a later matching duplicate must NOT rescue it.
        """
        out = np.ones(num_rows, dtype=bool)
        for key, values in self.conjuncts:
            hit = keys == key
            rows_k = row_idx[hit]  # non-decreasing (row-major flatten)
            ok = np.zeros(num_rows, dtype=bool)
            if values is None:
                ok[rows_k] = True
            else:
                first = np.ones(len(rows_k), dtype=bool)
                first[1:] = rows_k[1:] != rows_k[:-1]
                frows = rows_k[first]
                fvals = vals[hit][first]
                ok[frows[np.isin(fvals, values)]] = True
            out &= ok
        return out

    def mask_table(self, table: pa.Table, col: str = "tags") -> np.ndarray:
        """Vectorized row mask over an Arrow map<string,string> column."""
        row_idx, keys, vals = flatten_tags(table[col])
        return self.mask_flat(row_idx, keys, vals, table.num_rows)

    def filter_table(self, table: pa.Table, col: str = "tags") -> pa.Table:
        return table.filter(pa.array(self.mask_table(table, col)))


def flatten_tags(column: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a map<string,string> column to (row_index, key, value) numpy arrays."""
    if isinstance(column, pa.ChunkedArray):
        column = column.combine_chunks()
    if isinstance(column, pa.ChunkedArray):  # zero-chunk edge
        column = pa.concat_arrays(column.chunks) if column.chunks else pa.array(
            [], type=column.type
        )
    # column is a MapArray: offsets give per-row item ranges
    offsets = column.offsets.to_numpy(zero_copy_only=False)
    n = len(column)
    counts = np.diff(offsets)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    keys = np.asarray(column.keys.to_numpy(zero_copy_only=False), dtype=object)
    vals = np.asarray(column.items.to_numpy(zero_copy_only=False), dtype=object)
    # a null map row contributes no items; offsets already reflect that
    return row_idx, keys, vals


def tags_field(name: str = "tags") -> pa.Field:
    return pa.field(name, pa.map_(pa.string(), pa.string()))


def dicts_to_map_array(dicts: Sequence[Mapping[str, str]]) -> pa.Array:
    """Build a map<string,string> array from python dicts."""
    return pa.array(
        [list(d.items()) if d is not None else None for d in dicts],
        type=pa.map_(pa.string(), pa.string()),
    )


def map_column_to_dicts(column: pa.ChunkedArray | pa.Array) -> list[dict]:
    """Materialize a map column to python dicts (test / small-result use)."""
    if isinstance(column, pa.ChunkedArray):
        out: list[dict] = []
        for chunk in column.chunks:
            out.extend(map_column_to_dicts(chunk))
        return out
    return [dict(item) if item is not None else {} for item in column.to_pylist()]


def get_tag_values(table: pa.Table, key: str, col: str = "tags") -> np.ndarray:
    """Vectorized single-key lookup over a map column → object array (None if absent).

    Uses FIRST occurrence per row, matching Rust's ``tags().find(..)``.
    """
    row_idx, keys, vals = flatten_tags(table[col])
    out = np.full(table.num_rows, None, dtype=object)
    hit = keys == key
    rows = row_idx[hit]
    values = vals[hit]
    # keep first occurrence: reverse so earlier assignment wins last
    out[rows[::-1]] = values[::-1]
    return out
