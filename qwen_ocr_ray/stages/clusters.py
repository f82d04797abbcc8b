"""Connected components over near-duplicate pair edges (cluster formation).

Near-dup pipelines (minhash/simhash/embedding) emit PAIR edges; dedup wants
CLUSTERS (keep one representative per component). This is distributed
min-label propagation (the ray_guide pattern): every node starts labeled
with itself; each round, every node adopts the minimum label in its
neighbourhood; converges in O(component diameter) rounds. Each round broadcasts the
current label map (pair-participating nodes only — duplicate-fraction-sized,
same broadcastability assumption as the dedup winner maps) and reduces
candidate labels with one groupby-min; edges stay Arrow throughout. For
unbroadcastable label maps, substitute a bucketed join per round.

Dedup components are tiny and shallow in practice (pairs at high thresholds
form near-cliques), so the default max_rounds of 8 is generous; the
propagation stops early when a round changes nothing.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ray.data.aggregate import Min


def connected_components(
    pairs_ds: "ray.data.Dataset",
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 8,
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
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "label": pa.concat_arrays(
                    [
                        pc.min_element_wise(t["a"], t["b"]).combine_chunks(),
                        pc.min_element_wise(t["a"], t["b"]).combine_chunks(),
                    ]
                ),
            }
        )

    labels = edges.map_batches(seed, batch_format="pyarrow").groupby("node").aggregate(
        Min("label", alias_name="label")
    )

    for _ in range(max_rounds):
        labels = labels.materialize()
        label_map = {}
        for batch in labels.iter_batches(batch_size=65536, batch_format="pyarrow"):
            label_map.update(zip(batch["node"].to_pylist(), batch["label"].to_pylist()))
        ref = ray.put(label_map)

        def propagate(t: pa.Table) -> pa.Table:
            lm: dict = ray.get(ref)
            a = t["a"].to_pylist()
            b = t["b"].to_pylist()
            la = [lm[x] for x in a]
            lb = [lm[x] for x in b]
            m = [min(x, y) for x, y in zip(la, lb)]
            return pa.table(
                {
                    "node": pa.array(a + b, pa.int64()),
                    "label": pa.array(m + m, pa.int64()),
                }
            )

        new_labels = (
            edges.map_batches(propagate, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
        ).materialize()
        new_map = {}
        for batch in new_labels.iter_batches(batch_size=65536, batch_format="pyarrow"):
            new_map.update(zip(batch["node"].to_pylist(), batch["label"].to_pylist()))
        changed = new_map != label_map
        labels = new_labels
        if not changed:
            break
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
