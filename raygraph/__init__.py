"""raygraph — a Ray-Data-native link-graph analytics engine.

Built from scratch with the query/data-processing capabilities of the
python-graphblas reference (see SURVEY.md): sparse-linear-algebra kernels
(mxv / ewise / apply / select / reduce / extract / assign) re-expressed as
Ray Data pipelines over Arrow batches, plus the link-graph algorithms the
reference ships in its notebooks (PageRank, FastSV connected components,
label propagation, masked triangle counting) and the large-scale
training-data operators (dedup, similarity search, text analysis).

Nothing in this package calls ``ray.init()`` — the caller owns the Ray
session (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"

from raygraph import ops  # noqa: F401
