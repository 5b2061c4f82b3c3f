"""id_set_mode="bloom" ingest path (round-3, VERDICT r2 #6): Bloom
prefilter + exact post-join must produce ParserTables IDENTICAL to the
exact sorted-array broadcast path on the fixture corpus — the Bloom side
is a pure physical-plan swap for id sets too big to ray.put."""

import pandas as pd
import ray.data as rd

from osmptparser_ray.kernel.filters import PTV2
from osmptparser_ray.sources.pages import synthesize_pages_table
from osmptparser_ray.stages.elements import build_parser_tables, extract_elements


def _tables(mode, ray_session):
    pages = rd.from_arrow(synthesize_pages_table(replicas=1))
    elements = extract_elements(pages, validate=True)
    return build_parser_tables(elements, PTV2, id_set_mode=mode)


def _canon(ds, sort_cols):
    df = ds.to_pandas()
    # map/list columns → stable string repr for frame comparison
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, dict))).any():
            df[c] = df[c].map(repr)
    return df.sort_values(sort_cols).reset_index(drop=True)[sorted(df.columns)]


class TestBloomIngestParity:
    def test_forced_bloom_equals_exact(self, ray_session):
        exact = _tables("exact", ray_session)
        bloom = _tables("bloom", ray_session)
        for name, sort_cols in (
            ("relations", ["id"]),
            ("ways", ["id"]),
            ("nodes", ["id"]),
        ):
            a = _canon(getattr(exact, name), sort_cols)
            b = _canon(getattr(bloom, name), sort_cols)
            pd.testing.assert_frame_equal(a, b, check_like=True)

    def test_bloom_mode_rejects_unknown(self, ray_session):
        import pytest

        pages = rd.from_arrow(synthesize_pages_table(replicas=1))
        elements = extract_elements(pages, validate=True)
        with pytest.raises(ValueError):
            build_parser_tables(elements, PTV2, id_set_mode="nope")
