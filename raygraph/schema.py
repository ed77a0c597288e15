"""Arrow schemas for every table the engine passes between stages.

These are the contract between pipeline stages (FIXTURES.md §1-2). The
reference's "schema" is (shape, dtype) fixed at Matrix creation
(reference graphblas/core/matrix.py:157); ours is a pyarrow schema per
Dataset, with vertex ids in uint64 (GrB_Index analog,
reference graphblas/core/dtypes.py:51).
"""

from __future__ import annotations

import pyarrow as pa

# Common-Crawl-style pages table (BASELINE.json input_hint).
PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("s")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# Extraction output: one row per page.
EXTRACTED = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("extracted_text", pa.string()),
        pa.field("outlinks", pa.list_(pa.string())),
        pa.field("lang", pa.string()),
    ]
)

# COO edge table (the Matrix analog, SURVEY.md §1.5).
EDGES = pa.schema(
    [
        pa.field("src", pa.uint64()),
        pa.field("dst", pa.uint64()),
        pa.field("w", pa.float64()),
    ]
)

# Per-partition CSR block — one Arrow row per partition (FIXTURES.md §2).
# src_pos / dst_pos are positions into the owning partition's sorted vertex
# id array, precomputed at build so iteration-time gathers are O(1) lookups.
CSR_BLOCK = pa.schema(
    [
        pa.field("part", pa.int32()),
        pa.field("ids", pa.large_list(pa.uint64())),       # sorted vertex ids owned by part
        pa.field("deg", pa.large_list(pa.float64())),      # out-degree aligned to ids
        pa.field("src_pos", pa.large_list(pa.int64())),    # row -> position in ids
        pa.field("indptr", pa.large_list(pa.int64())),     # CSR row pointers (len nsrc+1)
        pa.field("dst_part", pa.large_list(pa.int32())),   # per-edge destination partition
        pa.field("dst_pos", pa.large_list(pa.int64())),    # per-edge position in dest part ids
        pa.field("w", pa.large_list(pa.float64())),        # per-edge weight
        pa.field("nnz", pa.int64()),
    ]
)

# Sparse vertex state table (the Vector analog; absent row = missing element).
def vertex_schema(val_type: pa.DataType = pa.float64()) -> pa.Schema:
    return pa.schema([pa.field("v", pa.uint64()), pa.field("val", val_type)])
