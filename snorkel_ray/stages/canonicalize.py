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


def union_find_labels(edges_df, src: str = "src", dst: str = "dst"):
    """Driver-side union-find over a small edge DataFrame → DataFrame
    (node, label=min member).  The O(E α(E)) path for edge tables that
    fit the driver — the distributed label propagation below is the
    huge-edge-set regime."""
    import pandas as pd

    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(edges_df[src], edges_df[dst]):
        for n in (a, b):
            if n not in parent:
                parent[n] = n
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = list(parent)
    return pd.DataFrame({"node": nodes, "label": [find(n) for n in nodes]})


def connected_components(edges, src: str = "src", dst: str = "dst",
                         *, max_iter: int = 4, num_partitions: int = 4,
                         driver_threshold: int = 2_000_000):
    """edges Dataset (two string cols) → Dataset (node, label) where
    label = lexicographic min node id in the component.

    Edge sets up to ``driver_threshold`` rows short-circuit to driver
    union-find (exact, no shuffle rounds; callers pass the DISTINCT
    edge table which is ≪ the corpus); larger sets run distributed
    NODE-label propagation: each round, every node's label becomes the
    min over itself and both endpoints' labels of its incident edges —
    one exploded groupby-min per round, edges + label table
    ``materialize()``d between rounds (stacked lazy shuffle rounds
    deadlocked a 4-CPU session).  Min labels spread one hop per round,
    so ``max_iter`` must cover the component diameter; the round-1
    half-round edge-grouping variant only merged edges sharing an
    endpoint IN THE SAME ROLE and silently failed on path graphs
    (caught by test_cc_distributed_path_matches_union_find).
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    edges = edges.materialize()  # consumed by count + either CC path
    if edges.count() <= driver_threshold:
        df = edges.select_columns([src, dst]).to_pandas()
        return rd.from_pandas(union_find_labels(df, src, dst))

    from .joins import apply_mapping

    def _init_nodes(b: pa.Table) -> pa.Table:
        n = pa.concat_arrays([b.column(src).combine_chunks(),
                              b.column(dst).combine_chunks()])
        return pa.table({"node": n, "lbl": n})

    labels = (edges.map_batches(_init_nodes, batch_format="pyarrow")
              .groupby("node").aggregate(Min("lbl", alias_name="lbl"))
              .materialize())

    for _ in range(max_iter):
        # attach current labels to both endpoints, then each node takes
        # the min over (own label, neighbor labels)
        e = apply_mapping(edges, labels, src, "node", "lbl", "_src_lbl",
                          num_partitions=num_partitions)
        e = apply_mapping(e, labels, dst, "node", "lbl", "_dst_lbl",
                          num_partitions=num_partitions)

        def _cands(b: pa.Table) -> pa.Table:
            node = pa.concat_arrays([b.column(src).combine_chunks(),
                                     b.column(dst).combine_chunks()])
            lbl = pa.concat_arrays([b.column("_dst_lbl").combine_chunks(),
                                    b.column("_src_lbl").combine_chunks()])
            return pa.table({"node": node, "lbl": lbl})

        cand = e.map_batches(_cands, batch_format="pyarrow").union(labels)
        labels = (cand.groupby("node").aggregate(Min("lbl", alias_name="lbl"))
                  .materialize())

    return labels.map_batches(
        lambda b: pa.table({"node": b.column("node"), "label": b.column("lbl")}),
        batch_format="pyarrow")


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
