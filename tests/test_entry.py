"""Driver-contract smoke tests: entry(), queries(), oracle_sql()."""

import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

import __ray_entry__ as em  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows():
    out = em.entry()
    assert isinstance(out, pd.DataFrame)
    assert len(out) > 0
    assert list(out.columns) == ["v", "score"]
    # pagerank scores: every vertex >= teleport share
    assert (out["score"] > 0).all()


def test_queries_and_oracles_align():
    qs = em.queries()
    oracles = em.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # every query has a SQL oracle (doc_profile, the last rows-only one,
    # gained a bit-exact fingerprint oracle in r3)
    assert set(qs) == set(oracles)


def test_selected_queries_run_and_match_duckdb():
    """Tiny in-process replica of the driver gate on three queries."""
    import duckdb
    import numpy as np

    con = duckdb.connect()
    for t in ("lineitem", "supplier", "customer", "orders", "documents",
              "embeddings", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    qs, oracles = em.queries(), em.oracle_sql()
    for name in ("degrees_out", "pagerank_k8", "events_tumbling"):
        mine = qs[name](SF)
        mine = mine.to_pandas() if not isinstance(mine, pd.DataFrame) else mine
        want = con.execute(oracles[name]).df()
        mine = mine[sorted(mine.columns)].sort_values(sorted(mine.columns)).reset_index(drop=True)
        want = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
        assert len(mine) == len(want)
        for c in mine.columns:
            a, b = mine[c].to_numpy(), want[c].to_numpy()
            if np.issubdtype(a.dtype, np.floating):
                np.testing.assert_allclose(a, b, atol=1e-9)
            else:
                assert (a == b).all()
