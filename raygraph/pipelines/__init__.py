"""Driver-facing query pack: every operator exposed as a named pipeline
over the testdata tables, with a DuckDB oracle where SQL can express it."""

from raygraph.pipelines.queries import QUERIES, entry_pipeline
from raygraph.pipelines.oracles import ORACLES

__all__ = ["QUERIES", "ORACLES", "entry_pipeline"]
