from .extract import OsmPayloadExtractor, extract_text
from .osmxml import ELEMENT_SCHEMA, elements_to_xml, parse_osm_payload
from .pages import (
    PAGES_SCHEMA,
    synthesize_pages_parquet,
    synthesize_pages_table,
)
from .pbf import read_pbf_elements, scan_pbf_blobs
from .pbf_write import write_pbf, write_pbf_shards
from .vecparse import extract_payloads, parse_payload_batch

__all__ = [
    "ELEMENT_SCHEMA",
    "OsmPayloadExtractor",
    "PAGES_SCHEMA",
    "elements_to_xml",
    "extract_text",
    "parse_osm_payload",
    "read_pbf_elements",
    "scan_pbf_blobs",
    "extract_payloads",
    "parse_payload_batch",
    "synthesize_pages_parquet",
    "synthesize_pages_table",
    "write_pbf",
    "write_pbf_shards",
]
