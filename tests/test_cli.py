"""CLI surface test (reference bin.rs parity) — subprocess, own Ray session."""

import json
import subprocess
import sys

import pytest

from osmptparser_ray.sources import synthesize_pages_parquet


@pytest.fixture(scope="module")
def pages(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "pages.parquet"
    return synthesize_pages_parquet(str(p))


def _run(args):
    return subprocess.run(
        [sys.executable, "-m", "osmptparser_ray.cli", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )


class TestCli:
    def test_ptv2_json_array(self, pages):
        r = _run([pages, "--filter-ptv2", "--gap", "1500", "--cpus", "4"])
        assert r.returncode == 0, r.stderr[-500:]
        arr = json.loads(r.stdout)
        assert len(arr) == 2
        ids = sorted(a["properties"]["id"] for a in arr)
        assert ids == [85965, 2030162]

    def test_areas_cli_filter(self, pages):
        r = _run([pages, "--filter", "highway", "--cpus", "4"])
        assert r.returncode == 0, r.stderr[-500:]
        arr = json.loads(r.stdout)
        assert all(a["properties"]["parse_status"]["code"] == 0 for a in arr)

    def test_requires_filter(self, pages):
        r = _run([pages])
        assert r.returncode != 0
        assert "required" in r.stderr.lower() or "filter" in r.stderr.lower()


class TestErrorPolicy:
    def test_skip_malformed(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from osmptparser_ray.sources.extract import OsmPayloadExtractor
        from osmptparser_ray.sources.pages import PAYLOAD_CLOSE, PAYLOAD_OPEN

        good = f"{PAYLOAD_OPEN}<osm><node id=\"1\" lat=\"0\" lon=\"0\"/></osm>{PAYLOAD_CLOSE}"
        bad = f"{PAYLOAD_OPEN}<osm><node id=\"1\" lat=\"0\"</osm>{PAYLOAD_CLOSE}"  # broken XML
        t = pa.table(
            {
                "url": pa.array(["u1", "u2"], pa.string()),
                "html": pa.array([good.encode(), bad.encode()], pa.binary()),
            }
        )
        ex = OsmPayloadExtractor(validate=False, on_error="skip")
        out = ex(t)
        assert out.num_rows == 1 and ex.n_skipped == 1
        with pytest.raises(Exception):
            OsmPayloadExtractor(validate=False, on_error="raise")(t)
