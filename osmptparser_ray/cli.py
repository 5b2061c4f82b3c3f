"""CLI — parity with the reference binary (reference bin.rs:6-84).

Usage:
    python -m osmptparser_ray.cli PAGES.parquet --filter-ptv2 [--gap 150]
    python -m osmptparser_ray.cli PAGES.parquet --filter "name&admin_level" [--gap 150]

Behavior mirrors the reference CLI:
* ``--filter-ptv2`` → PTv2 public transports, printed as a JSON array of
  per-route GeoJSON FeatureCollections (bin.rs:50-62);
* otherwise ``--filter`` (generic DSL) → areas, printed as a JSON array of
  Polygon Features, SKIPPING rows with parse_status != 0 or empty
  geometry (bin.rs:68-73 — library callers get everything, the CLI does
  not);
* ``--cpus 0`` (default) means all cores (bin.rs:44-48);
* ``--gap`` defaults to 150.0 meters (bin.rs:38-39).

``--output DIR`` additionally writes the full (unfiltered) result as
partitioned Parquet instead of printing JSON.

This entry point OWNS the Ray session (init + shutdown); the library
functions never do.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="osmptparser_ray", description=__doc__)
    p.add_argument("pages", help="pages parquet file/dir (url, warc_ts, html, text, lang)")
    p.add_argument("--filter", default=None, help='tag filter DSL, e.g. "name&admin_level"')
    p.add_argument("--filter-ptv2", action="store_true", help="use the PTv2 preset")
    p.add_argument("--cpus", type=int, default=0, help="0 = all cores (default)")
    p.add_argument("--gap", type=float, default=150.0, help="gap-fix tolerance meters")
    p.add_argument("--output", default=None, help="write parquet to DIR instead of printing JSON")
    args = p.parse_args(argv)

    if not args.filter_ptv2 and args.filter is None:
        p.error("one of --filter-ptv2 / --filter is required")

    import ray

    num_cpus = args.cpus if args.cpus > 0 else (os.cpu_count() or 4)
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    try:
        from .pipelines.ptv2 import areas_from_pages, public_transports_from_pages
        from .sources.geojson import to_geojson_area, to_geojson_pt

        if args.filter_ptv2:
            ds = public_transports_from_pages(args.pages, gap=args.gap)
            if args.output:
                ds.write_parquet(args.output)
                print(json.dumps({"written": args.output, "rows": ds.count()}))
                return 0
            rows = ds.take_all()
            # JSON-array printing, one geojson per row (bin.rs:50-62)
            sys.stdout.write("[\n")
            for i, row in enumerate(rows):
                if i:
                    sys.stdout.write(",\n")
                sys.stdout.write(to_geojson_pt(row))
            sys.stdout.write("\n]\n")
        else:
            ds = areas_from_pages(args.pages, gap=args.gap, filters=args.filter)
            if args.output:
                ds.write_parquet(args.output)
                print(json.dumps({"written": args.output, "rows": ds.count()}))
                return 0
            rows = ds.take_all()
            sys.stdout.write("[\n")
            first = True
            for row in rows:
                # CLI-only drop of broken/empty rows (bin.rs:68-73)
                if row["status_code"] != 0 or len(row["geometry"]) == 0:
                    continue
                if not first:
                    sys.stdout.write(",\n")
                sys.stdout.write(to_geojson_area(row))
                first = False
            sys.stdout.write("\n]\n")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
