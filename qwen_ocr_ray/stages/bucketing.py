"""Hash-bucket shuffle helpers — the engine's one reusable partitioning idiom.

Every wide operation here (exact dedup, document fold, figure join) keys on
``url`` (SURVEY.md §7 "Shuffles and keys"): we add ONE deterministic
``bucket = hash64(key) % B`` column and shuffle on it, so multiple stages can
reuse the same partitioning. Groups-per-bucket stays coarse (B buckets, not
one Ray group per key): ``groupby(key).map_groups`` would make one Python
call per key — catastrophic for 10^12 urls — whereas per-bucket calls are
O(B), with vectorized (polars/pyarrow) group handling inside the bucket.

Hashing is polars' stable-per-version vectorized row hash; bucketing is
internal to a job (never compared across versions), so that stability is
sufficient. A salted variant spreads hot keys (e.g. one domain holding 30% of
a crawl) across ``salt`` sub-buckets when downstream state is per-row rather
than per-key.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa

DEFAULT_HASH_SEED = 8675309


def hash_bucket_ids(col: pa.ChunkedArray | pa.Array, num_buckets: int, seed: int = DEFAULT_HASH_SEED) -> pa.Array:
    """Vectorized stable bucket ids for a string/binary key column."""
    s = pl.from_arrow(col)
    if isinstance(s, pl.DataFrame):  # chunked arrays arrive as 1-col frames
        s = s.to_series()
    h = s.hash(seed=seed)
    return (h % num_buckets).cast(pl.Int32).to_arrow()


def add_bucket_column(
    batch: pa.Table, key: str, num_buckets: int, out: str = "bucket", seed: int = DEFAULT_HASH_SEED
) -> pa.Table:
    return batch.append_column(out, hash_bucket_ids(batch[key], num_buckets, seed))


def pick_num_buckets(approx_rows: int | None, rows_per_bucket: int = 250_000) -> int:
    """Coarse bucket count: ~rows_per_bucket keys per bucket, clamped to
    [8, 65536]. At 10^12 rows this yields ~4M buckets — each a few hundred MB
    of shuffle output, well under a worker heap."""
    if not approx_rows or approx_rows <= 0:
        return 64
    return max(8, min(65_536, (approx_rows + rows_per_bucket - 1) // rows_per_bucket))
