"""Skew-aware domain partitioning: salted keys for hot domains.

north_rule: "skew-aware repartitioning (salted groupby on domain, bounded
partition bytes)". Common-Crawl domain distribution is Zipf — one domain can
hold 30%+ of a crawl (the synthetic fixture plants exactly that). A plain
groupby(domain) would put that domain's entire volume in one partition/task.

Two-step pattern:
  1. ``compute_hot_domains`` — partial per-batch domain counts (vectorized
     ``pyarrow.Table.group_by``), tiny global groupby, driver collects ONLY
     domains above the hot threshold (bounded output: at most 1/threshold
     entries, regardless of corpus size).
  2. ``add_salted_partition`` — partition key = ``domain#salt`` where
     salt = stable_hash(url) % n_salts(domain); hot domains get
     ceil(share / target_share) salts, cold domains 1. Same-domain locality
     is preserved for cold domains; hot domains split into bounded slices.
"""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.compute as pc

import ray

from qwen_ocr_ray.stages.agg import grouped_sums
from qwen_ocr_ray.stages.bucketing import hash_bucket_ids


def add_domain_column(t: pa.Table, url_col: str = "url") -> pa.Table:
    """Vectorized domain extraction: strip scheme, cut at first '/'."""
    no_scheme = pc.replace_substring_regex(t[url_col], pattern=r"^[a-z]+://", replacement="")
    domain = pc.replace_substring_regex(no_scheme, pattern=r"/.*$", replacement="")
    return t.append_column("domain", domain)


def compute_hot_domains(
    ds, *, hot_fraction: float = 0.05, total_rows: int
) -> dict[str, int]:
    """domain -> number of salt slices, for domains above ``hot_fraction``.

    The result is provably small (<= 1/hot_fraction entries), so it is safe
    to collect on the driver and broadcast."""
    counted = grouped_sums(
        ds.map_batches(
            lambda t: add_domain_column(t).select(["domain"]).append_column(
                "ones", pa.array([1] * t.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        ),
        keys=["domain"],
        sum_cols={"ones": "n"},
    )
    threshold = max(1, int(hot_fraction * total_rows))
    hot = counted.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], threshold)), batch_format="pyarrow"
    ).to_pandas()  # bounded: at most 1/hot_fraction rows
    return {
        d: max(1, math.ceil((n / total_rows) / hot_fraction))
        for d, n in zip(hot.domain, hot.n)
    }


def add_salted_partition(ds, hot_domains: dict[str, int], *, url_col: str = "url"):
    """Append ``part`` (string ``domain#salt``). hot_domains ships via
    ray.put once, not per batch."""
    hot_ref = ray.put(hot_domains)

    def fn(t: pa.Table) -> pa.Table:
        hot: dict[str, int] = ray.get(hot_ref)
        t = add_domain_column(t, url_col)
        dom = t["domain"]
        # Vectorized salt assignment: hot is provably small (<= 1/hot_fraction
        # entries), so one pc.if_else pass per hot domain beats a per-row
        # Python dict lookup on the full stream.
        salt = pa.nulls(t.num_rows, pa.int64()).fill_null(0)
        if hot:
            raw = pc.cast(hash_bucket_ids(t[url_col], 1 << 16), pa.int64())
            for d, m in hot.items():
                mod = pc.subtract(raw, pc.multiply(pc.divide(raw, m), m))
                salt = pc.if_else(pc.equal(dom, d), mod, salt)
        parts = pc.binary_join_element_wise(
            dom, pc.cast(salt, pa.string()), "#"
        )
        return t.append_column("part", parts)

    return ds.map_batches(fn, batch_format="pyarrow")


def partition_histogram(ds, *, url_col: str = "url", hot_fraction: float = 0.05,
                        total_rows: int):
    """Rows per salted partition — the boundedness evidence (each part's share
    <= ~hot_fraction of the corpus)."""
    hot = compute_hot_domains(ds, hot_fraction=hot_fraction, total_rows=total_rows)
    salted = add_salted_partition(ds, hot, url_col=url_col)
    return grouped_sums(
        salted.map_batches(
            lambda t: t.select(["part"]).append_column(
                "ones", pa.array([1] * t.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        ),
        keys=["part"],
        sum_cols={"ones": "n_rows"},
    )
