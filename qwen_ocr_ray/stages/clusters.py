"""Connected components over near-duplicate pair edges (cluster formation).

Near-dup pipelines (minhash/simhash/embedding) emit PAIR edges; dedup wants
CLUSTERS (keep one representative per component). This is distributed
min-label propagation (the ray_guide pattern): every node starts labeled
with itself; each round, every node adopts the minimum label in its
neighbourhood; converges in O(component diameter) rounds, detected by a
no-change round (no silent cap — chain-shaped components of any length
converge; ``max_rounds`` is only a runaway guard that raises).

Two per-round strategies, auto-selected by label-table size:

  ``broadcast``  the label table (pair-participating nodes only —
                 duplicate-fraction-sized) is collected once per round,
                 sorted, broadcast via ray.put, and each edge batch resolves
                 endpoint labels with a vectorized numpy searchsorted — no
                 per-row Python.

  ``join``       fully distributed: two bucketed label-lookup exchanges per
                 round (edge endpoints against the label table, searchsorted
                 inside each bucket) and a groupby-min; nothing is collected
                 on the driver. The path for unbroadcastable label maps at
                 100 TB duplicate rates. (Our own exchange rather than
                 ``Dataset.join``: Ray's hash-join aggregator crashes on
                 partitions that receive zero shards from one side.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ray.data.aggregate import Min

_EMPTY_LABELS = pa.table(
    {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
)


def _collect_labels(labels: "ray.data.Dataset") -> pa.Table:
    """Driver-side label table, sorted by node (bounded: pair-participating
    nodes only)."""
    batches = list(labels.iter_batches(batch_size=65536, batch_format="pyarrow"))
    if not batches:
        return _EMPTY_LABELS
    return pa.concat_tables(batches).combine_chunks().sort_by("node")


def _compress_labels(tbl: pa.Table) -> pa.Table:
    """Full path compression of the label forest (pointer jumping): iterate
    label <- label(label) to a fixpoint. Every label value is itself a node
    in the table, so the lookup is a vectorized searchsorted. Turns the
    O(diameter)-round propagation into O(log diameter) overall."""
    if tbl.num_rows == 0:
        return tbl
    nodes = tbl["node"].to_numpy()
    labs = tbl["label"].to_numpy().copy()
    while True:
        nl = labs[np.searchsorted(nodes, labs)]
        if np.array_equal(nl, labs):
            break
        labs = nl
    return pa.table({"node": nodes, "label": labs})


def _bucketed_label_lookup(
    rows: "ray.data.Dataset",
    labels: "ray.data.Dataset",
    key_col: str,
    out_col: str,
    num_buckets: int,
    row_cols: list,
) -> "ray.data.Dataset":
    """rows + ``out_col`` = label of rows[key_col], via one bucketed exchange
    (co-partition rows and label entries on the key's hash, vectorized
    searchsorted lookup inside each bucket). ``row_cols`` are the (int64)
    payload columns of ``rows``; every key is present in the label table by
    construction."""
    from qwen_ocr_ray.stages.bucketing import add_bucket_column

    # the lookup value travels in a shared "label" column; when the rows side
    # also carries a "label" payload column (the pointer-jump call), the two
    # share it — lookup() only reads it from side 1
    union_names = [*row_cols, "__key", "__side"]
    if "label" not in row_cols:
        union_names.append("label")

    def prep_rows(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in row_cols}
        cols["__key"] = t[key_col]
        cols["__side"] = pa.array([0] * t.num_rows, pa.int8())
        if "label" not in row_cols:
            cols["label"] = pa.nulls(t.num_rows, pa.int64())
        out = pa.table(cols).select(union_names)
        return add_bucket_column(out, "__key", num_buckets)

    def prep_labels(t: pa.Table) -> pa.Table:
        cols = {c: pa.nulls(t.num_rows, pa.int64()) for c in row_cols}
        cols["__key"] = t["node"]
        cols["__side"] = pa.array([1] * t.num_rows, pa.int8())
        cols["label"] = t["label"]
        out = pa.table(cols).select(union_names)
        return add_bucket_column(out, "__key", num_buckets)

    def lookup(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["bucket"]).combine_chunks()
        lab = t.filter(pc.equal(t["__side"], 1))
        rws = t.filter(pc.equal(t["__side"], 0))
        out_schema = pa.schema(
            [(c, pa.int64()) for c in row_cols] + [(out_col, pa.int64())]
        )
        if rws.num_rows == 0:
            return pa.table({n: [] for n in out_schema.names}, schema=out_schema)
        keys = lab["__key"].to_numpy()
        order = np.argsort(keys)
        vals = lab["label"].to_numpy()[order]
        found = vals[np.searchsorted(keys[order], rws["__key"].to_numpy())]
        cols = {c: rws[c] for c in row_cols}
        cols[out_col] = pa.array(found, pa.int64())
        return pa.table(cols, schema=out_schema)

    return (
        rows.map_batches(prep_rows, batch_format="pyarrow")
        .union(labels.map_batches(prep_labels, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(lookup, batch_format="pyarrow")
    )


def _bucketed_changed_count(
    old: "ray.data.Dataset", new: "ray.data.Dataset", num_buckets: int
) -> int:
    """|{node: old label != new label}| via one bucketed exchange."""
    from qwen_ocr_ray.stages.bucketing import add_bucket_column

    def prep(side: int):
        def fn(t: pa.Table) -> pa.Table:
            out = pa.table(
                {
                    "node": t["node"],
                    "label": t["label"],
                    "__side": pa.array([side] * t.num_rows, pa.int8()),
                }
            )
            return add_bucket_column(out, "node", num_buckets)

        return fn

    def diff(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["bucket"])
        o = t.filter(pc.equal(t["__side"], 0)).sort_by("node")
        n = t.filter(pc.equal(t["__side"], 1)).sort_by("node")
        if o.num_rows != n.num_rows:  # node sets differ: everything changed
            changed = max(o.num_rows, n.num_rows)
        elif o.num_rows == 0:
            changed = 0
        else:
            changed = int(
                pc.sum(
                    pc.cast(pc.not_equal(o["label"], n["label"]), pa.int64())
                ).as_py()
                or 0
            )
        return pa.table({"changed": pa.array([changed], pa.int64())})

    ds = (
        old.map_batches(prep(0), batch_format="pyarrow")
        .union(new.map_batches(prep(1), batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(diff, batch_format="pyarrow")
    )
    total = 0
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        total += int(pc.sum(b["changed"]).as_py() or 0)
    return total


def connected_components(
    pairs_ds: "ray.data.Dataset",
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    strategy: str = "auto",
    num_partitions: int = 32,
    broadcast_limit: int = 2_000_000,
    max_rounds: int = 64,
) -> "ray.data.Dataset":
    """Pair edges -> (node, component) where component = min node id reachable.

    Returns only nodes that appear in at least one pair (isolated corpus rows
    are their own components by definition and need no shuffle).
    """
    edges = pairs_ds.map_batches(
        lambda t: pa.table(
            {
                "a": pc.cast(t[a_col], pa.int64()),
                "b": pc.cast(t[b_col], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # edge set is duplicate-fraction-sized; reused every round

    def seed(t: pa.Table) -> pa.Table:
        m = pc.min_element_wise(t["a"], t["b"]).combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "label": pa.concat_arrays([m, m]),
            }
        )

    labels = (
        edges.map_batches(seed, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    if strategy == "auto":
        strategy = "broadcast" if labels.count() <= broadcast_limit else "join"

    if strategy == "broadcast":
        label_tbl = _compress_labels(_collect_labels(labels))
        for _ in range(max_rounds):
            ref = ray.put(label_tbl)

            def propagate(t: pa.Table) -> pa.Table:
                lm: pa.Table = ray.get(ref)
                nodes = lm["node"].to_numpy()
                labs = lm["label"].to_numpy()
                a = t["a"].to_numpy(zero_copy_only=False)
                b = t["b"].to_numpy(zero_copy_only=False)
                # every endpoint is present in the label table by construction
                m = np.minimum(
                    labs[np.searchsorted(nodes, a)],
                    labs[np.searchsorted(nodes, b)],
                )
                return pa.table(
                    {
                        "node": pa.array(np.concatenate([a, b]), pa.int64()),
                        "label": pa.array(np.concatenate([m, m]), pa.int64()),
                    }
                )

            labels = (
                edges.map_batches(propagate, batch_format="pyarrow")
                .groupby("node")
                .aggregate(Min("label", alias_name="label"))
                .materialize()
            )
            new_tbl = _compress_labels(_collect_labels(labels))
            if np.array_equal(
                new_tbl["label"].to_numpy(), label_tbl["label"].to_numpy()
            ):
                break
            label_tbl = new_tbl
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_rounds} rounds"
            )
    else:  # fully distributed join path
        for _ in range(max_rounds):
            la = _bucketed_label_lookup(
                edges, labels, "a", "la", num_partitions, ["a", "b"]
            )
            lab = _bucketed_label_lookup(
                la, labels, "b", "lb", num_partitions, ["a", "b", "la"]
            )

            def emit(t: pa.Table) -> pa.Table:
                m = pc.min_element_wise(t["la"], t["lb"]).combine_chunks()
                return pa.table(
                    {
                        "node": pa.concat_arrays(
                            [t["a"].combine_chunks(), t["b"].combine_chunks()]
                        ),
                        "label": pa.concat_arrays([m, m]),
                    }
                )

            new_labels = (
                lab.map_batches(emit, batch_format="pyarrow")
                .groupby("node")
                .aggregate(Min("label", alias_name="label"))
                .materialize()
            )
            # pointer jump (path halving): label <- label(label), turning
            # O(diameter) rounds into O(log diameter)
            jumped = _bucketed_label_lookup(
                new_labels, new_labels, "label", "ll", num_partitions,
                ["node", "label"],
            )
            new_labels = jumped.map_batches(
                lambda t: pa.table(
                    {
                        "node": t["node"],
                        "label": pc.min_element_wise(t["label"], t["ll"]),
                    }
                ),
                batch_format="pyarrow",
            ).materialize()
            n_changed = _bucketed_changed_count(
                labels, new_labels, num_partitions
            )
            labels = new_labels
            if n_changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_rounds} rounds"
            )

    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]), batch_format="pyarrow"
    )


def cluster_representatives(pairs_ds, **kw):
    """(component, representative=min node) per cluster — the keep-list for
    cluster-level dedup."""
    comp = connected_components(pairs_ds, **kw)
    return (
        comp.groupby("component")
        .aggregate(Min("node", alias_name="representative"))
    )
