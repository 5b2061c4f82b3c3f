"""osmptparser_ray — a Ray-Data-native spatial data-processing engine.

From-scratch reimplementation of the capabilities of cualbondi/osmptparser
(reference at /root/reference, studied for semantics only) as streaming
Ray Data pipelines over Arrow batches, plus a brand-new tiling /
spatial-join layer and large-scale training-data operators
(dedup, similarity search, text analysis).

Layout:
    kernel/     pure-Python geometry + filter kernels (zero Ray)
    sources/    page corpus synthesis, OSM payload extraction, geojson
    stages/     element tables, semi-joins, relation assembly
    pipelines/  end-to-end PTv2 / areas / ingest pipelines
    spatial/    cell index, point-in-polygon, kNN, raster-vector joins
    text/       dedup (exact/minhash/simhash), language-ID, quality, tokens
    embed/      ANN similarity search over embedding columns
    state/      partitioned checkpoint/resume manifests + incremental ops
    graph.py    edge-list graph operators (PageRank power iteration)
"""

__version__ = "0.1.0"
