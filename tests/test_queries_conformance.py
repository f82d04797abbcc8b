"""Driver conformance (SURVEY.md §5.4): every queries() entry with an oracle
is executed via Ray AND via DuckDB on the same parquet tables, and compared
order-insensitively on values — mirroring the driver's CORRECTNESS gate."""

import os

import duckdb
import pandas as pd
import pytest

from qwen_ocr_ray.pipelines.queries import ORACLE, QUERIES

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def oracle_for(name: str, sf_dir: str) -> str:
    """Oracle SQL with synthetic-cache paths rewritten from the driver's
    sf0.01 to this test session's sf (caches are ensured on demand)."""
    sql = ORACLE[name]
    if "/tmp/qor_" not in sql:
        return sql
    from qwen_ocr_ray.pipelines.queries import (
        _sf01_media_tag, _sf01_oracle_tag, _sf01_tag,
    )
    from qwen_ocr_ray.sources.oracle_sidecars import ensure_oracle_sidecars, oracle_tag
    from qwen_ocr_ray.sources.synth_media import ensure_media_dataset, media_tag
    from qwen_ocr_ray.sources.synth_pages import GEN_VERSION, ensure_pages_dataset

    tag = os.path.basename(os.path.normpath(sf_dir)) + f"_v{GEN_VERSION}"
    if "/tmp/qor_pages/" in sql:
        ensure_pages_dataset(sf_dir)
        sql = sql.replace(_sf01_tag(), tag)
    if "/tmp/qor_media/" in sql:
        ensure_media_dataset(sf_dir)
        sql = sql.replace(_sf01_media_tag(), media_tag(sf_dir))
    if "/tmp/qor_oracle/" in sql:
        ensure_oracle_sidecars(sf_dir)
        sql = sql.replace(_sf01_oracle_tag(), oracle_tag(sf_dir))
    return sql


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(name, ray_session, oracle_con, sf_dir):
    ray_result = QUERIES[name](sf_dir)
    got = normalize(ray_result.to_pandas())
    exp = normalize(oracle_con.execute(oracle_for(name, sf_dir)).fetchdf())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"row count {len(got)} != {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_all_queries_registered():
    assert set(ORACLE) <= set(QUERIES)
    assert "extract_pages" in QUERIES  # flagship present even without oracle
