"""Entity canonicalization: normalized keys → alias-cluster merge.

North-star stage: "canonicalization runs as a groupby on normalized
entity keys with connected-component merge".  No direct reference
analog (SURVEY.md A9) — the reference's nearest mechanism is the
implicit case-folding in ``DictionaryMatch`` and stable-id slugify.

Graph: bipartite surface-key ↔ qid edges from the linker.  Two keys
sharing a qid (alias variants) must land in one cluster; chains
key–qid–key–qid can be arbitrarily long in adversarial dictionaries, so
the merge is iterative min-label propagation over the DISTINCT edge
table (much smaller than the mention stream), each round one
hash-partitioned groupby-min + hash join — all Ray Data, no driver
union-find, converges in O(log(longest chain)) rounds; ``max_iter``
bounds it (normalized keys keep real clusters shallow; SURVEY.md §7
hard part (c)).

Unlinked keys (qid == "") become singleton clusters ``C:<key>``.
"""

from __future__ import annotations

import pyarrow as pa


def connected_components(edges, src: str = "src", dst: str = "dst",
                         *, max_iter: int = 4, num_partitions: int = 4):
    """edges Dataset (two string cols) → Dataset (node, label) where
    label = lexicographic min node id in the component.

    Label propagation on the edge list: alternate grouping the edge
    state by dst then by src, setting every edge's label to the group
    min — one hash-partitioned groupby per half-round, NO join (each
    round is a single shuffle of the edge table; ``Dataset.join`` is
    avoided deliberately — its hash-shuffle finalize breaks on empty
    partitions in ray 2.49, and a groupby-assign expresses the same
    semantics with one less all-to-all).

    The edge-state table is ``materialize()``d between rounds: it is
    the DISTINCT edge set (bounded, ≪ the corpus — callers dedup
    first), and pinning it keeps each round's plan to exactly one
    shuffle (stacked lazy shuffle rounds deadlocked a 4-CPU session).
    """
    # edge state: (src, dst, lbl) with lbl starting as min(src, dst)
    def _init(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lbl = pc.min_element_wise(b.column(src), b.column(dst))
        return pa.table({"src": b.column(src), "dst": b.column(dst), "lbl": lbl})

    import pandas as pd
    from ray.data.aggregate import Min

    state = edges.map_batches(_init, batch_format="pyarrow").materialize()

    def _prop(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["lbl"] = g["lbl"].min()
        return g

    for it in range(max_iter):
        side = "dst" if it % 2 == 0 else "src"
        state = state.groupby(side).map_groups(_prop, batch_format="pandas").materialize()

    # final node → label: min over both endpoints' rows
    def _explode(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays([b.column("src").combine_chunks(),
                                          b.column("dst").combine_chunks()]),
                "lbl": pa.concat_arrays([b.column("lbl").combine_chunks()] * 2),
            }
        )

    nodes = state.map_batches(_explode, batch_format="pyarrow")
    return nodes.groupby("node").aggregate(Min("lbl", alias_name="label"))


def canonical_entity_map(linked_mentions, *, num_partitions: int = 16):
    """linked mentions/candidates (entity_key, qid) → Dataset
    (entity_key, canonical_id): qid-anchored clusters for linked keys,
    ``C:<key>`` singletons for unlinked ones."""
    import pyarrow.compute as pc

    def _edges(b: pa.Table) -> pa.Table:
        keys = b.column("entity_key")
        qids = b.column("qid")
        linked = pc.not_equal(qids, "")
        t = pa.table({"entity_key": keys, "qid": qids}).filter(linked)
        # qid nodes get a "Q!" prefix sorting BEFORE any surface key so the
        # component min-label is always the (prefixed) qid — deterministic.
        return pa.table({"src": pc.binary_join_element_wise(
            pa.array(["!"] * t.num_rows, pa.string()), t.column("qid"), ""),
            "dst": t.column("entity_key")})

    from ray.data.aggregate import Count

    edges = linked_mentions.map_batches(_edges, batch_format="pyarrow")
    distinct = (
        edges.groupby(["src", "dst"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )  # dedup edge table
    comp = connected_components(distinct, num_partitions=num_partitions)

    def _to_map(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_key = pc.invert(pc.starts_with(b.column("node"), "!"))
        t = b.filter(is_key)
        canon = pc.replace_substring_regex(t.column("label"), "^!", "")
        return pa.table({"entity_key": t.column("node"), "canonical_id": canon})

    return comp.map_batches(_to_map, batch_format="pyarrow")
