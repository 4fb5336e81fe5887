"""Ingestion: source-code table → link-graph edge table.

The engine's production input (per the target contract) is an
Iceberg/Parquet table of source-code repositories
``(repo, path, commit, lang, content)``. This package:

- synthesizes that table deterministically at any scale (synth.py) —
  contents encode a PLANTED dependency plan, so extraction has an exact
  expected output;
- extracts import/include references per language with vectorized pandas
  UDFs over Arrow batches — no per-row Python (extract.py);
- assigns deterministic dense vertex ids and emits the (src, dst, weight)
  edge table the Graph layer consumes.
"""

from linkgraph.ingest.extract import (
    assign_vertex_ids,
    content_hashes,
    extract_edges,
    extract_references,
)
from linkgraph.ingest.synth import synthesize_source_table

__all__ = [
    "assign_vertex_ids",
    "content_hashes",
    "extract_edges",
    "extract_references",
    "synthesize_source_table",
]
