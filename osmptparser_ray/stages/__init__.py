from .assemble import (
    AREA_SCHEMA,
    PT_SCHEMA,
    cli_area_filter,
    get_areas,
    get_public_transports,
)
from .elements import (
    ParserTables,
    build_parser_tables,
    dedup_by_id,
    extract_elements,
    ingest_elements,
    read_pages,
)

__all__ = [
    "AREA_SCHEMA",
    "PT_SCHEMA",
    "ParserTables",
    "build_parser_tables",
    "cli_area_filter",
    "dedup_by_id",
    "extract_elements",
    "get_areas",
    "get_public_transports",
    "ingest_elements",
    "read_pages",
]
