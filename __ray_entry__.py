"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Fill these in as you implement operators from
SURVEY.md §2. Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: do not
call ``ray.init()`` / ``ray.shutdown()`` here, in the library code these
functions use, or inside the callables.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0.

    Derives the CC-style pages table deterministically from the sf0.001
    documents table (BASELINE.json input_hint shape), then runs the full
    extraction pipeline (dedup -> route -> HTML extract / page branch ->
    union) with the stub inference backend and returns the lazy Dataset.
    """
    from qwen_ocr_ray.pipelines.extract import run_extraction
    from qwen_ocr_ray.sources.synth_pages import ensure_pages_dataset

    pages_path, _ = ensure_pages_dataset("/root/testdata/sf0.001")
    return run_extraction(pages_path, approx_rows=600)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2.

    Each callable takes ``sf_dir`` (e.g. "/root/testdata/sf0.01") and
    returns a Dataset / pandas DataFrame / pyarrow Table. Name every
    computed/aggregate column so names match ``oracle_sql``.
    """
    from qwen_ocr_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """For each key in ``queries()``, equivalent ANSI SQL runnable by
    DuckDB on the same parquet tables (pre-registered views: region
    nation customer supplier part orders lineitem events documents
    embeddings). Omit for non-SQL-expressible ops → driver records a
    weaker rows-only check.

    Some oracles read the deterministic synthetic caches (pages golden,
    media sidecars) via read_parquet('<path>'); materialize them for the
    driver's sf0.01 gate before handing out the SQL, in case the oracle
    runs before the matching query.
    """
    from qwen_ocr_ray.pipelines.queries import ORACLE
    from qwen_ocr_ray.sources.oracle_sidecars import ensure_oracle_sidecars
    from qwen_ocr_ray.sources.synth_media import ensure_media_dataset
    from qwen_ocr_ray.sources.synth_pages import ensure_pages_dataset

    ensure_pages_dataset("/root/testdata/sf0.01")
    ensure_media_dataset("/root/testdata/sf0.01")
    ensure_oracle_sidecars("/root/testdata/sf0.01")
    return dict(ORACLE)
