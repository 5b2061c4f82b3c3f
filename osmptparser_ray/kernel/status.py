"""Parse-status codes, mirroring the reference's state machine.

Reference: /root/reference/src/parser/parse_status.rs:1-23 and the cascade in
src/parser/relation.rs:229-254.

Codes:
    0   OK            (detail "")
    101 "Sorted"      (single linestring after sort_ways + first_pass)
    102 "Joined"      (single linestring after gap-stitching join_ways)
    103 "Joined Sorted" (join_ways over the sorted order — unreachable in
                       practice because sort_ways is an identity, see
                       kernel.geometry.sort_ways)
    501 "Broken"      (could not form a single linestring; geometry is EMPTY)
"""

from __future__ import annotations

from typing import NamedTuple

OK = 0
SORTED = 101
JOINED = 102
JOINED_SORTED = 103
BROKEN = 501

DETAIL = {
    OK: "",
    SORTED: "Sorted",
    JOINED: "Joined",
    JOINED_SORTED: "Joined Sorted",
    BROKEN: "Broken",
}


class ParseStatus(NamedTuple):
    code: int
    detail: str

    @classmethod
    def ok(cls) -> "ParseStatus":
        return cls(OK, "")

    @classmethod
    def of(cls, code: int) -> "ParseStatus":
        return cls(code, DETAIL[code])
