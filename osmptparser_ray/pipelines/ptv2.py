"""End-to-end pipelines: pages → element tables → PT routes / areas.

The Ray-Data-native equivalent of the reference's three entry points
(``Parser::new`` + ``get_public_transports`` / ``get_areas`` / CLI,
reference mod.rs:147-173, 511-527, 580-654, bin.rs:42-84).

Default parameters mirror the reference: CLI gap 150.0 m (bin.rs:38-39),
integration-test gap 1500.0 m (tests/integration_test.rs:6).
"""

from __future__ import annotations

from typing import Literal, Optional

import ray.data as rd

from ..kernel.filters import AA, PTV2
from ..stages.assemble import cli_area_filter, get_areas, get_public_transports
from ..stages.elements import (
    ParserTables,
    build_parser_tables,
    extract_elements,
    read_pages,
)

DEFAULT_GAP = 150.0


def parser_tables_from_pages(
    pages_path: str,
    filters: str,
    *,
    validate: bool = True,
    dedup: bool = False,
    concurrency: Optional[int | tuple[int, int]] = None,
    id_set_mode: str = "exact",
) -> ParserTables:
    """pages parquet → ParserTables (the reference Parser::new equivalent).

    ``id_set_mode="bloom"`` switches the J1/J2 semi-join sides from exact
    sorted-array broadcasts to Bloom prefilter + exact post-join (same
    tables; for id sets too big to ``ray.put``)."""
    pages = read_pages(pages_path, validate=validate)
    elements = extract_elements(pages, validate=validate, concurrency=concurrency)
    return build_parser_tables(elements, filters, dedup=dedup, id_set_mode=id_set_mode)


def public_transports_from_pages(
    pages_path: str,
    gap: float = DEFAULT_GAP,
    filters: str = PTV2,
    *,
    mode: Literal["broadcast", "shuffle"] = "broadcast",
    validate: bool = True,
    concurrency: Optional[int | tuple[int, int]] = None,
    id_set_mode: str = "exact",
) -> rd.Dataset:
    """new_ptv2 + get_public_transports, end-to-end."""
    tables = parser_tables_from_pages(
        pages_path, filters, validate=validate, concurrency=concurrency,
        id_set_mode=id_set_mode,
    )
    return get_public_transports(tables, gap, mode=mode, concurrency=concurrency)


def areas_from_pages(
    pages_path: str,
    gap: float = DEFAULT_GAP,
    filters: str = AA,
    *,
    mode: Literal["broadcast", "shuffle"] = "broadcast",
    cli_parity: bool = False,
    validate: bool = True,
    concurrency: Optional[int | tuple[int, int]] = None,
) -> rd.Dataset:
    """new(filters) + get_areas; ``cli_parity`` applies the CLI-only
    status!=0 / empty-geometry drop (reference bin.rs:68-73)."""
    tables = parser_tables_from_pages(
        pages_path, filters, validate=validate, concurrency=concurrency
    )
    areas = get_areas(tables, gap, mode=mode, concurrency=concurrency)
    return cli_area_filter(areas) if cli_parity else areas


def parser_tables_from_pbf(
    pbf_path: str,
    filters: str,
    *,
    dedup: bool = False,
) -> ParserTables:
    """``.osm.pbf`` file → ParserTables — the reference's literal entry
    point (``Parser::new(path, filters)``, mod.rs:147-173) over its native
    binary input. The blob-parallel source (sources.pbf) replaces the
    pages→extract front half; every later stage is shared."""
    from ..sources.pbf import read_pbf_elements

    return build_parser_tables(read_pbf_elements(pbf_path), filters, dedup=dedup)


def public_transports_from_pbf(
    pbf_path: str,
    gap: float = DEFAULT_GAP,
    filters: str = PTV2,
    *,
    mode: Literal["broadcast", "shuffle"] = "broadcast",
) -> rd.Dataset:
    """``Parser::new_ptv2(path)`` + ``get_public_transports`` over a real
    PBF file (the reference README's workload)."""
    return get_public_transports(parser_tables_from_pbf(pbf_path, filters), gap, mode=mode)


def areas_from_pbf(
    pbf_path: str,
    gap: float = DEFAULT_GAP,
    filters: str = AA,
    *,
    mode: Literal["broadcast", "shuffle"] = "broadcast",
    cli_parity: bool = False,
) -> rd.Dataset:
    """``Parser::new(path, filters)`` + ``get_areas`` over a real PBF."""
    areas = get_areas(parser_tables_from_pbf(pbf_path, filters), gap, mode=mode)
    return cli_area_filter(areas) if cli_parity else areas
