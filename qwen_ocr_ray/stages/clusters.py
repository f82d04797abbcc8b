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

  ``join``       fully distributed: two native hash-partitioned joins per
                 round (edge endpoints against the label table) and a
                 groupby-min; nothing is collected on the driver. The path
                 for unbroadcastable label maps at 100 TB duplicate rates.
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
        label_tbl = _collect_labels(labels)
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
            new_tbl = _collect_labels(labels)
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
            la = edges.join(
                labels, "inner", num_partitions, on=("a",), right_on=("node",),
                right_suffix="_a",
            )
            lab = la.join(
                labels, "inner", num_partitions, on=("b",), right_on=("node",),
                right_suffix="_b",
            )

            def emit(t: pa.Table) -> pa.Table:
                ca = "label_a" if "label_a" in t.column_names else "label"
                cb = "label_b" if "label_b" in t.column_names else "label"
                m = pc.min_element_wise(t[ca], t[cb]).combine_chunks()
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
            n_changed = (
                labels.join(
                    new_labels, "inner", num_partitions, on=("node",),
                    right_suffix="_new",
                )
                .map_batches(
                    lambda t: t.filter(pc.not_equal(t["label"], t["label_new"])),
                    batch_format="pyarrow",
                )
                .count()
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
