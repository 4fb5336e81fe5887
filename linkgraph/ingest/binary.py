"""Reference-format binary edge file I/O (optional cross-check artifact).

The reference consumes a binary file of little-endian fixed-width records:
``[src:uint32][dst:uint32]`` or ``[src:uint32][dst:uint32][weight:float32]``
(item_size(), init_all.c:43-49; README.md:21-23). This module writes any
edge DataFrame in that exact format — so the C binaries, if ever compiled,
can be run on bit-identical graphs — and reads such files back.

Driver-side (collects): this is a test-fixture bridge, not a data path;
the reference itself only handles single-node-sized files.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def write_reference_edges(edges: DataFrame, path: str, weighted: bool = False) -> int:
    """Write sorted (src, dst[, weight]) rows as the reference's binary
    input format. Returns the record count. Sorted by (src, dst) for
    reproducible bytes."""
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    # orderBy includes weight so parallel edges (which Graph preserves)
    # serialize in a deterministic order — reproducible bytes
    rows = edges.select(*cols).orderBy(*cols).collect()
    fmt = "<IIf" if weighted else "<II"
    with open(path, "wb") as f:
        for r in rows:
            if weighted:
                f.write(struct.pack(fmt, r["src"], r["dst"], float(r["weight"])))
            else:
                f.write(struct.pack(fmt, r["src"], r["dst"]))
    return len(rows)


def read_reference_edges(
    spark: SparkSession, path: str, weighted: bool = False
) -> DataFrame:
    """Read the reference's binary edge format into an edge DataFrame
    (edge count inferred from file size, as init_all.c:821 does)."""
    if weighted:
        raw = np.fromfile(path, dtype=np.dtype([("src", "<u4"), ("dst", "<u4"), ("w", "<f4")]))
        rows = [(int(r["src"]), int(r["dst"]), float(r["w"])) for r in raw]
        return spark.createDataFrame(rows, "src long, dst long, weight double")
    raw = np.fromfile(path, dtype=np.dtype([("src", "<u4"), ("dst", "<u4")]))
    rows = [(int(r["src"]), int(r["dst"])) for r in raw]
    return spark.createDataFrame(rows, "src long, dst long")
