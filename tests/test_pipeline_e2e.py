"""End-to-end golden runs (FIXTURES.md §1, SURVEY.md §5.2-5.3):

  - full pipeline over the synthetic sf0.001 pages table with the stub
    backend -> extracted text per url compared BYTE-IDENTICAL to goldens
  - exact URL dedup: one output row per unique url, first fetch wins
  - distribution invariance: a different bucket count (different physical
    partitioning) yields the identical (url -> text) mapping
"""

import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from qwen_ocr_ray.pipelines.extract import run_extraction
from qwen_ocr_ray.sources.synth_pages import ensure_pages_dataset


@pytest.fixture(scope="module")
def synth(ray_session, sf_dir, tmp_path_factory):
    pages_path, golden_path = ensure_pages_dataset(sf_dir)
    return pages_path, golden_path, tmp_path_factory.mktemp("routed")


@pytest.fixture(scope="module")
def extracted(synth) -> pd.DataFrame:
    pages_path, _, routed_root = synth
    ds = run_extraction(
        pages_path, routed_dir=str(routed_root / "a"), approx_rows=600
    )
    return ds.to_pandas()


def test_byte_identical_per_url(synth, extracted):
    _, golden_path, _ = synth
    golden = pq.read_table(golden_path).to_pandas()
    m = extracted.merge(golden, on="url", suffixes=("", "_exp"))
    assert len(m) == len(golden) == len(extracted)
    mismatched = m[m.text != m.text_exp]
    assert mismatched.empty, mismatched[["url", "kind"]].head()
    # every branch actually exercised (pdf = text-layer extraction branch)
    assert set(m.kind.unique()) >= {"html", "pages", "pdf", "empty", "invalid"}


def test_dedup_first_fetch_wins(synth, extracted):
    pages_path, golden_path, _ = synth
    raw = pq.read_table(pages_path, columns=["url"]).to_pandas()
    assert len(raw) > raw.url.nunique(), "fixture must contain duplicate urls"
    assert len(extracted) == raw.url.nunique()
    assert not extracted.url.duplicated().any()
    # duplicates carry a later-ts 'stale refetch' payload; first fetch must win
    assert not extracted.text.str.contains("stale refetch").any()


def test_error_columns(extracted):
    by_kind = extracted.groupby("kind")
    assert (by_kind.get_group("empty").error == "empty payload").all()
    assert (by_kind.get_group("invalid").error == "invalid utf-8 payload").all()
    assert by_kind.get_group("html").error.isna().all()
    pages = by_kind.get_group("pages")
    assert (pages.n_pages >= 3).all()
    assert (pages.input_tokens > 0).all()
    assert pages.final_breadcrumb.str.startswith("### DOCUMENT LOCATION BREADCRUMB").all()


def test_distribution_invariance(synth, extracted):
    pages_path, _, routed_root = synth
    ds2 = run_extraction(
        pages_path, routed_dir=str(routed_root / "b"), approx_rows=600, num_buckets=3
    )
    out2 = ds2.to_pandas()
    a = extracted.sort_values("url").reset_index(drop=True)
    b = out2.sort_values("url").reset_index(drop=True)
    assert a.url.tolist() == b.url.tolist()
    assert a.text.tolist() == b.text.tolist()
    shutil.rmtree(routed_root / "b", ignore_errors=True)


def test_dedup_strategy_parity(synth, tmp_path_factory):
    """broadcast and exchange phase-A strategies produce identical checkpoints
    (same kept rows per url)."""
    import pyarrow.parquet as pq_

    from qwen_ocr_ray.pipelines.extract import route_and_checkpoint

    pages_path, _, _ = synth
    roots = {}
    for strat in ("broadcast", "exchange"):
        d = str(tmp_path_factory.mktemp(f"routed_{strat}"))
        route_and_checkpoint(pages_path, d, approx_rows=600, dedup_strategy=strat)
        frames = []
        for entry in sorted(os.listdir(d)):
            if entry.startswith("kind="):
                t = pq_.read_table(os.path.join(d, entry), columns=["url", "warc_ts"])
                frames.append(t.to_pandas().assign(kind=entry))
        import pandas as pd

        roots[strat] = (
            pd.concat(frames).sort_values("url").reset_index(drop=True)
        )
    a, b = roots["broadcast"], roots["exchange"]
    assert a.url.tolist() == b.url.tolist()
    assert a.warc_ts.tolist() == b.warc_ts.tolist()
    assert a.kind.tolist() == b.kind.tolist()


def test_two_consumer_inline_path_matches_fused(synth, extracted):
    """The actor-backend inline path (two consumers + union) must produce
    the same url->text map as the default fused single pass (it is the live
    path; the stub exercises its plumbing)."""
    from qwen_ocr_ray.config import DEFAULT_CONFIG
    from qwen_ocr_ray.pipelines.extract import _inline_branches

    pages_path, _, _ = synth
    branches = _inline_branches(
        pages_path, DEFAULT_CONFIG, approx_rows=600, backend="stub",
        num_buckets=None,
    )
    ds = branches[0]
    for b in branches[1:]:
        ds = ds.union(b)
    out = ds.to_pandas().sort_values("url").reset_index(drop=True)
    ref = extracted.sort_values("url").reset_index(drop=True)
    assert out.url.tolist() == ref.url.tolist()
    assert out.text.tolist() == ref.text.tolist()


def test_empty_input_yields_empty_output(ray_session, tmp_path):
    """Zero-row input flows through route -> fold without error (the
    last-shard-of-a-sharded-run edge)."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from qwen_ocr_ray.pipelines.extract import run_extraction

    t = pa.table(
        {
            "url": pa.array([], pa.string()),
            "warc_ts": pa.array([], pa.timestamp("us")),
            "html": pa.array([], pa.binary()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
        }
    )
    p = str(tmp_path / "empty.parquet")
    pq_.write_table(t, p)
    assert run_extraction(p).count() == 0


def test_training_prep_composition(synth):
    from qwen_ocr_ray.pipelines.prep import run_training_prep

    pages_path, _, routed_root = synth
    out = run_training_prep(
        pages_path, routed_dir=str(routed_root / "a"), approx_rows=600,
        languages=("en",), min_tokens=5, min_quality=0.1,
    ).to_pandas()
    assert len(out) > 50
    assert (out.lang == "en").all()
    assert (out.n_tokens >= 5).all()
    assert (out.quality >= 0.1).all()
    assert not out.url.duplicated().any()
    assert not out.text.duplicated().any()  # exact content dedup applied


def test_training_prep_near_dup_stage(ray_session, tmp_path):
    """Planted near-duplicate e2e (VERDICT r02 #4): two html docs whose texts
    differ by a few words collapse to ONE training row when near_dedup is on,
    and survive as two when it is off."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from qwen_ocr_ray.pipelines.prep import run_training_prep
    from qwen_ocr_ray.sources.synth_pages import _mix, SEED, generate_pages_table

    # pick html-kind doc ids (kind roll < 86) deterministically
    html_ids = [i for i in range(200) if _mix(SEED, i) % 100 < 86]
    base = " ".join(f"training corpus word{w % 37} alpha beta" for w in range(120))
    near = base.replace("word3 ", "word998 ").replace("word7 ", "word999 ")
    distinct = " ".join(f"unrelated other text token{w * 13 % 91}" for w in range(120))
    ids = html_ids[:3]
    docs = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([base, near, distinct], pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
        }
    )
    pages, _ = generate_pages_table(docs)
    p = str(tmp_path / "pages.parquet")
    pq_.write_table(pages, p)

    kw = dict(approx_rows=3, languages=("en",), min_tokens=5, min_quality=0.0)
    both = run_training_prep(
        p, routed_dir=str(tmp_path / "r1"), near_dedup=False, **kw
    ).to_pandas()
    assert len(both) == 3
    kept = run_training_prep(
        p, routed_dir=str(tmp_path / "r2"), near_threshold=0.5, **kw
    ).to_pandas()
    assert len(kept) == 2
    dropped = set(both.url) - set(kept.url)
    assert len(dropped) == 1
    # the unrelated doc always survives; the dropped url is one of the pair
    assert f"/articles/{ids[2]}" in "".join(kept.url)
    assert any(f"/articles/{i}" in d for d in dropped for i in ids[:2])

def test_training_prep_semantic_stage(ray_session, tmp_path):
    """Planted SEMANTIC-duplicate e2e (VERDICT r04 #5): two docs with
    distinct texts (exact + MinHash keep both) but identical embeddings
    collapse to one training row when semantic=True; the lower doc_id
    survives (greedy larger-member-drops rule)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from qwen_ocr_ray.pipelines.prep import run_training_prep
    from qwen_ocr_ray.sources.synth_pages import SEED, _mix, generate_pages_table

    html_ids = [i for i in range(200) if _mix(SEED, i) % 100 < 86]
    ids = html_ids[:4]
    texts = [
        " ".join(f"corpus{j} sample word{(w * (7 + j)) % 61} item" for w in range(100))
        for j in range(4)
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
        }
    )
    pages, _ = generate_pages_table(docs)
    p = str(tmp_path / "pages.parquet")
    pq_.write_table(pages, p)

    # embeddings: ids[0] and ids[1] identical, others orthogonal
    dim = 8
    vecs = np.zeros((4, dim))
    vecs[0, 0] = vecs[1, 0] = 1.0
    vecs[2, 3] = 1.0
    vecs[3, 6] = 1.0
    ep = str(tmp_path / "embeddings.parquet")
    pq_.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
            }
        ),
        ep,
    )

    kw = dict(approx_rows=4, languages=("en",), min_tokens=5, min_quality=0.0)
    plain = run_training_prep(
        p, routed_dir=str(tmp_path / "r1"), **kw
    ).to_pandas()
    assert len(plain) == 4  # distinct texts: nothing dropped before semantic
    sem = run_training_prep(
        p, routed_dir=str(tmp_path / "r2"), semantic=True, embeddings_path=ep,
        sem_k=2, sem_iters=2, sem_threshold=0.95, **kw
    ).to_pandas()
    assert len(sem) == 3
    dropped = set(plain.url) - set(sem.url)
    assert dropped == {u for u in plain.url if u.endswith(f"/articles/{ids[1]}")}


def test_high_dup_exchange_end_to_end(ray_session, tmp_path_factory):
    """The 100 TB broadcast-dedup fallback, stressed: a fixture with ~35%
    CONTESTED urls (far past the 'dup fraction is broadcastable' assumption)
    runs end-to-end through dedup_strategy='exchange', produces exactly the
    golden (one row per unique url, first fetch wins, zero stale payloads),
    and matches the broadcast strategy row-for-row."""
    import pandas as pd
    import pyarrow.parquet as pq_

    from qwen_ocr_ray.sources.synth_pages import ensure_pages_dataset

    pages_path, golden_path = ensure_pages_dataset(
        "/root/testdata/sf0.001", dup_rate=0.35
    )
    meta_rows = pq_.read_metadata(pages_path).num_rows
    golden = pq_.read_table(golden_path).to_pandas()
    # fixture sanity: contested fraction really is ~35%
    dup_frac = (meta_rows - len(golden)) / len(golden)
    assert 0.30 <= dup_frac <= 0.40

    outs = {}
    for strat in ("broadcast", "exchange"):
        routed = str(tmp_path_factory.mktemp(f"hd_{strat}"))
        ds = run_extraction(
            pages_path, routed_dir=routed, approx_rows=meta_rows,
            checkpoint="disk", dedup_strategy=strat,
        )
        outs[strat] = ds.to_pandas().sort_values("url").reset_index(drop=True)
        shutil.rmtree(routed, ignore_errors=True)

    for strat, out in outs.items():
        assert len(out) == len(golden), strat
        m = out.merge(golden, on="url", suffixes=("", "_exp"))
        assert (m.text == m.text_exp).all(), strat
        assert not m.text.str.contains("stale refetch").any(), strat
    a, b = outs["broadcast"], outs["exchange"]
    assert a.url.tolist() == b.url.tolist()
    assert a.text.tolist() == b.text.tolist()


def test_inline_rejects_exchange_strategy(ray_session, tmp_path_factory):
    from qwen_ocr_ray.sources.synth_pages import ensure_pages_dataset

    pages_path, _ = ensure_pages_dataset("/root/testdata/sf0.001")
    with pytest.raises(ValueError, match="exchange"):
        run_extraction(
            pages_path, routed_dir=str(tmp_path_factory.mktemp("x")),
            checkpoint="inline", dedup_strategy="exchange",
        )
