"""Join strategies (SURVEY.md §2.4; ray_guide "Joins and lookups").

Three patterns:

  * ``broadcast_join`` — small side (dimension table) is ``ray.put`` once and
    looked up inside every map_batches task via a vectorized polars join.
    No shuffle. The distributed analogue of the reference's metadata->page
    linear-scan lookup (/root/reference/src/pdf_handler.py:102).
  * ``bucketed_hash_join`` — both sides large: tag each side, pad to a common
    schema, union, hash-bucket on the key, and join per bucket (one Python
    call per bucket, vectorized polars join inside). This is the explicit
    partitioned hash join; bucket count bounds per-task memory.
  * ``bucketed_asof_join`` — an operator Ray Data lacks: per left row, the
    latest right row with time <= left time for the same key. Co-bucketed on
    the key (ONE shuffle), vectorized ``polars.join_asof`` per bucket.
    Partitioning assumption: all rows of one key land in one bucket, so keys
    must be un-skewed or pre-salted with a per-salt right-side replica.
  * ``bucketed_range_join`` — another operator Ray Data lacks: pairs with
    equal keys whose time difference falls in [lo, hi) (interval join).
    Same co-bucketed single-shuffle shape; an optional per-bucket ``post``
    folds an aggregate into the same exchange.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa

import ray

from qwen_ocr_ray.stages.bucketing import add_bucket_column, pick_num_buckets


def broadcast_join(
    ds,
    small: pa.Table,
    key: str,
    *,
    how: str = "inner",
    small_columns: list[str] | None = None,
):
    """ds ⋈ small on ``key``; ``small`` ships to the object store ONCE."""
    if small_columns is not None:
        small = small.select([key, *[c for c in small_columns if c != key]])
    small_ref = ray.put(small)

    def join_batch(batch: pa.Table) -> pa.Table:
        small_tbl: pa.Table = ray.get(small_ref)
        left = pl.from_arrow(batch)
        right = pl.from_arrow(small_tbl)
        return left.join(right, on=key, how=how).to_arrow()

    return ds.map_batches(join_batch, batch_format="pyarrow")


def _pad_to(batch: pa.Table, schema: pa.Schema, side: int) -> pa.Table:
    arrays = []
    for f in schema:
        if f.name == "__side":
            arrays.append(pa.array([side] * batch.num_rows, pa.int8()))
        elif f.name in batch.column_names:
            arrays.append(batch[f.name].cast(f.type))
        else:
            arrays.append(pa.nulls(batch.num_rows, f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def bucketed_hash_join(
    left,
    right,
    key: str,
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    *,
    approx_rows: int | None = None,
    num_buckets: int | None = None,
    how: str = "inner",
):
    """Inner (or left) join of two large Datasets on ``key``.

    Schemas must be passed explicitly (``ds.schema()`` would trigger
    execution). Output columns: left columns, then right columns minus the
    key. Keys are assumed un-skewed or pre-salted by the caller. ``how``
    may be "inner" or "left" — every left row lands in exactly one bucket,
    so a per-bucket left join composes to the global left join.
    """
    b = num_buckets or pick_num_buckets(approx_rows)
    lnames = [f.name for f in left_schema]
    rnames = [f.name for f in right_schema if f.name != key]
    union_fields = [pa.field("__side", pa.int8())]
    union_fields += list(left_schema)
    union_fields += [f for f in right_schema if f.name != key]
    union_schema = pa.schema(union_fields)
    out_schema = pa.schema(
        [left_schema.field(n) for n in lnames]
        + [right_schema.field(n) for n in rnames]
    )

    tagged_left = left.map_batches(
        lambda t: add_bucket_column(_pad_to(t, union_schema, 0), key, b),
        batch_format="pyarrow",
    )
    tagged_right = right.map_batches(
        lambda t: add_bucket_column(_pad_to(t, union_schema, 1), key, b),
        batch_format="pyarrow",
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["bucket"])
        sides = t["__side"]
        import pyarrow.compute as pc

        lt = t.filter(pc.equal(sides, 0)).select(lnames)
        rt = t.filter(pc.equal(sides, 1)).select([key, *rnames])
        if lt.num_rows == 0 or (rt.num_rows == 0 and how == "inner"):
            return pa.table({n: [] for n in out_schema.names}, schema=out_schema)
        joined = pl.from_arrow(lt).join(pl.from_arrow(rt), on=key, how=how)
        return joined.select(out_schema.names).to_arrow().cast(out_schema)

    return (
        tagged_left.union(tagged_right)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def bucketed_asof_join(
    left,
    right,
    *,
    key: str,
    left_time: str,
    right_time: str,
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    approx_rows: int | None = None,
    num_buckets: int | None = None,
    right_dedup: list[str] | None = None,
):
    """Backward as-of LEFT join: each left row gains the right row with the
    greatest ``right_time`` <= ``left_time`` for the same ``key`` (null
    columns when none exists).

    Determinism requires the right side to be unique per (key, time).
    Pass ``right_dedup=[tie_cols...]`` to have the join enforce that
    GLOBALLY per bucket: rows sharing (key, time) keep the one with the
    greatest tie columns. A caller-side per-batch dedup is only a partial
    combiner (batches split duplicates across map tasks), so without this
    the surviving duplicate would depend on Ray's nondeterministic block
    concat order inside map_groups.
    Output columns: left columns, then right columns minus key and time.
    """
    b = num_buckets or pick_num_buckets(approx_rows)
    lnames = [f.name for f in left_schema]
    rnames = [f.name for f in right_schema if f.name not in (key, right_time)]
    union_fields = [pa.field("__side", pa.int8())]
    union_fields += list(left_schema)
    union_fields += [f for f in right_schema if f.name not in lnames]
    union_schema = pa.schema(union_fields)
    out_schema = pa.schema(
        [left_schema.field(n) for n in lnames]
        + [right_schema.field(n) for n in rnames]
    )

    tagged_left = left.map_batches(
        lambda t: add_bucket_column(_pad_to(t, union_schema, 0), key, b),
        batch_format="pyarrow",
    )
    tagged_right = right.map_batches(
        lambda t: add_bucket_column(_pad_to(t, union_schema, 1), key, b),
        batch_format="pyarrow",
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["bucket"])
        import pyarrow.compute as pc

        lt = t.filter(pc.equal(t["__side"], 0)).select(lnames)
        if lt.num_rows == 0:
            return pa.table({n: [] for n in out_schema.names}, schema=out_schema)
        rt = t.filter(pc.equal(t["__side"], 1)).select(
            [key, right_time, *rnames]
        )
        lf = pl.from_arrow(lt).sort(left_time)
        rf = pl.from_arrow(rt)
        if right_dedup:
            # global (key, time) uniqueness: greatest tie columns win — the
            # bucket holds ALL rows of its keys, so this is exact, unlike a
            # per-batch combiner upstream
            rf = rf.sort([key, right_time, *right_dedup]).unique(
                subset=[key, right_time], keep="last", maintain_order=True
            )
        rf = rf.sort(right_time)
        joined = lf.join_asof(
            rf,
            left_on=left_time,
            right_on=right_time,
            by_left=key,
            by_right=key,
            strategy="backward",
        )
        return joined.select(out_schema.names).to_arrow().cast(out_schema)

    return (
        tagged_left.union(tagged_right)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )


def bucketed_range_join(
    left,
    right,
    *,
    key: str,
    left_time: str,
    right_time: str,
    lo_us: int,
    hi_us: int,
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    how: str = "inner",
    approx_rows: int | None = None,
    num_buckets: int | None = None,
    post=None,
    post_schema: pa.Schema | None = None,
):
    """Range (interval) join — an operator Ray Data lacks: pairs (l, r) with
    ``l.key == r.key`` and ``lo_us <= r[right_time] - l[left_time] < hi_us``
    (offsets in microseconds; timestamp[us] columns compare exactly).

    Co-bucketed on the key (ONE shuffle): both sides are tagged, padded to a
    union schema and hash-bucketed; each bucket runs a polars LAZY equi-join
    whose window filter pipelines over the join output via the streaming
    engine, so per-bucket resident memory is the in-window match set plus a
    morsel — not the full key-cross-product an eager join would materialize.
    ``how="left"`` keeps left rows with no in-window partner (right columns
    null). ``post`` (with ``post_schema``) runs per bucket on the joined
    polars frame — a per-left-key aggregate folded into the SAME exchange
    instead of paying a second one; exact because every row of a key lands
    in one bucket.

    Partitioning assumption (same as the asof join): keys un-skewed or
    pre-salted (stages/skew.py) with a per-salt right replica. ``left_time``
    and ``right_time`` must be distinct column names.
    """
    if left_time == right_time:
        raise ValueError("left_time and right_time must be distinct column names")
    b = num_buckets or pick_num_buckets(approx_rows)
    lnames = [f.name for f in left_schema]
    rnames = [f.name for f in right_schema if f.name != key]
    union_fields = [pa.field("__side", pa.int8())]
    union_fields += list(left_schema)
    union_fields += [f for f in right_schema if f.name not in lnames]
    union_schema = pa.schema(union_fields)
    out_schema = post_schema or pa.schema(
        [left_schema.field(n) for n in lnames]
        + [right_schema.field(n) for n in rnames]
    )

    tagged_left = left.map_batches(
        lambda t: add_bucket_column(_pad_to(t, union_schema, 0), key, b),
        batch_format="pyarrow",
    )
    tagged_right = right.map_batches(
        lambda t: add_bucket_column(_pad_to(t, union_schema, 1), key, b),
        batch_format="pyarrow",
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["bucket"])
        import pyarrow.compute as pc

        lt = t.filter(pc.equal(t["__side"], 0)).select(lnames)
        if lt.num_rows == 0:
            return pa.table({n: [] for n in out_schema.names}, schema=out_schema)
        rt = t.filter(pc.equal(t["__side"], 1)).select([key, *rnames])
        lf = pl.from_arrow(lt).with_row_index("__lid")
        rf = pl.from_arrow(rt)
        delta = pl.col(right_time).cast(pl.Int64) - pl.col(left_time).cast(pl.Int64)
        # Lazy + streaming engine: the window filter is pipelined over the
        # hash-join output in morsels, so a hot key's n^2 equi-matches are
        # never resident at once — an eager join would materialize the full
        # key cross-product before filtering.
        matched = (
            lf.lazy()
            .join(rf.lazy(), on=key, how="inner")
            .filter((delta >= lo_us) & (delta < hi_us))
            .collect(engine="streaming")
        )
        if how == "left":
            missing = lf.filter(
                ~pl.col("__lid").is_in(matched.get_column("__lid").implode())
            )
            # diagonal concat null-fills the absent right columns
            matched = pl.concat([matched, missing], how="diagonal")
        joined = matched.drop("__lid")
        if post is not None:
            joined = post(joined)
        return joined.select(out_schema.names).to_arrow().cast(out_schema)

    return (
        tagged_left.union(tagged_right)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pyarrow")
    )
