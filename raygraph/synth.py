"""Deterministic Common-Crawl-style page generator (FIXTURES.md §1).

Every page is generated from ``rng = default_rng([seed, row])`` so the
table is identical regardless of how rows are batched across workers —
generation runs as a Ray Data ``map_batches`` over ``ray.data.range`` and
stays deterministic under any partitioning.

Link structure: out-degree ~ truncated Zipf(alpha=1.8, max=n/10) so hub
skew is real at every scale; targets biased to early pages
(``floor(row * u**3)`` — a seeded preferential-attachment surrogate that
yields power-law in-degree); ~1%% dangling pages, ~2%% duplicate links
(exercises dup_op dedup, reference graphblas/core/matrix.py:643-698),
~1%% links to unknown urls (dropped at resolve).

The ``text`` column is the extraction ground truth: concatenation of
``<p>`` block contents and anchor texts in document order joined by
``"\\n"`` — the engine's parser must reproduce it byte-for-byte per url
(BASELINE.json input_hint per-row invariant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raygraph.schema import PAGES

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber basalt cedar dune ember fjord grove harbor inlet "
    "jetty knoll lagoon mesa nexus orchard prairie quarry ridge summit terrace "
    "upland vale wharf yonder zenith"
).split()

EPOCH = np.datetime64("2026-01-01T00:00:00")
ZIPF_ALPHA = 1.8
LANGS = ("en", "de", "fr")


def url_of(row: int, pages_per_site: int) -> str:
    return f"https://site{row // pages_per_site}.example/p/{row % pages_per_site}"


def _sentence(rng: np.random.Generator) -> str:
    k = int(rng.integers(5, 21))
    idx = rng.integers(0, len(WORDS), size=k)
    return " ".join(WORDS[i] for i in idx)


def gen_rows(rows: np.ndarray, n_pages: int, pages_per_site: int, seed: int) -> pa.Table:
    """Generate the pages-table rows for the given global row indices."""
    urls, htmls, texts, langs = [], [], [], []
    max_deg = max(1, n_pages // 10)
    for row in rows.tolist():
        rng = np.random.default_rng([seed, row])
        url = url_of(row, pages_per_site)

        # out-degree (Zipf, truncated) and dangling pages
        if row == 0 or rng.random() < 0.01:
            ndeg = 0
        else:
            ndeg = int(min(rng.zipf(ZIPF_ALPHA), max_deg))

        targets: list[str] = []
        for _ in range(ndeg):
            if rng.random() < 0.01:
                targets.append(f"https://unknown{int(rng.integers(0, 1 << 30))}.example/p/0")
            else:
                t = int((row * rng.random() ** 3))  # biased to early pages -> hubs
                targets.append(url_of(t, pages_per_site))
            if rng.random() < 0.02:  # duplicate link
                targets.append(targets[-1])

        n_para = int(rng.integers(1, 6))
        items: list[tuple[str, str, str]] = [("p", _sentence(rng), "") for _ in range(n_para)]
        items += [("a", f"anchor {j}", t) for j, t in enumerate(targets)]
        rng.shuffle(items)  # interleave paragraphs and anchors in document order

        body = []
        txt = []
        for kind, content, target in items:
            if kind == "p":
                body.append(f"<p>{content}</p>")
            else:
                body.append(f'<a href="{target}">{content}</a>')
            txt.append(content)

        html = f"<html><head><title>T{row}</title></head><body>" + "".join(body) + "</body></html>"
        lv = rng.random()
        lang = LANGS[0] if lv < 0.90 else (LANGS[1] if lv < 0.95 else LANGS[2])

        urls.append(url)
        htmls.append(html.encode("utf-8"))
        texts.append("\n".join(txt))
        langs.append(lang)

    ts = EPOCH + np.asarray(rows, dtype="int64").astype("timedelta64[s]")
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(ts, pa.timestamp("s")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        schema=PAGES,
    )


def pages_table(n_pages: int, pages_per_site: int = 100, seed: int = 42) -> pa.Table:
    """Driver-side generation for small fixtures (tests)."""
    return gen_rows(np.arange(n_pages), n_pages, pages_per_site, seed)


def write_pages(
    out_dir: str,
    n_pages: int,
    pages_per_site: int = 100,
    seed: int = 42,
    rows_per_file: int = 20_000,
):
    """Distributed generation: Ray Data range -> map_batches -> parquet.

    Deterministic under any batching because the RNG is seeded per row.
    """
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        rows = batch["id"].to_numpy()
        return gen_rows(rows, n_pages, pages_per_site, seed)

    (
        rd.range(n_pages)
        .map_batches(gen, batch_format="pyarrow", batch_size=4096)
        .write_parquet(out_dir, min_rows_per_file=rows_per_file)
    )
    return out_dir
