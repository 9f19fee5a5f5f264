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
                         *, max_iter: int = 64, num_partitions: int = 4,
                         driver_threshold: int = 2_000_000):
    """edges Dataset (two string cols) → Dataset (node, label) where
    label = lexicographic min node id in the component.

    Edge sets up to ``driver_threshold`` rows short-circuit to driver
    union-find (exact, no shuffle rounds; callers pass the DISTINCT
    edge table which is ≪ the corpus); larger sets run distributed
    NODE-label propagation WITH POINTER JUMPING: each round, every
    node's label becomes the min over itself and both endpoints' labels
    of its incident edges (one exploded groupby-min), then labels chase
    one level of indirection (label := label[label]), which doubles the
    propagation distance per round → convergence in O(log diameter)
    rounds instead of O(diameter).  Every round ends with an exact
    changed-row count (one bounded shuffle over the label table, ≪
    edges); the loop stops when a round changes nothing.  The round-2
    fixed-4-round variant silently split any component with diameter
    > 4 (round-2 ADVICE item 3) — ``max_iter`` is now a safety rail
    (2^64 hops at 64 rounds) and overrunning it RAISES rather than
    returning corrupt clusters.  Tables ``materialize()``d between
    rounds (stacked lazy shuffle rounds deadlocked a 4-CPU session).
    """
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

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
        # 1) neighbor-min: attach current labels to both endpoints, then
        #    each node takes the min over (own label, neighbor labels)
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
        new_labels = (cand.groupby("node")
                      .aggregate(Min("lbl", alias_name="lbl"))
                      .materialize())

        # 2) pointer jump: lbl := min(lbl, lbl[lbl]) — labels are node
        #    ids, so chasing them through the label table halves the
        #    remaining path length each round
        jumped = apply_mapping(new_labels, new_labels, "lbl", "node",
                               "lbl", "_jump", num_partitions=num_partitions)

        def _take_jump(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            j = pc.coalesce(b.column("_jump"), b.column("lbl"))
            return pa.table({"node": b.column("node"),
                             "lbl": pc.min_element_wise(b.column("lbl"), j)})

        new_labels = (jumped.map_batches(_take_jump, batch_format="pyarrow")
                      .materialize())

        # 3) exact convergence check: count nodes whose label changed
        with_old = apply_mapping(new_labels, labels, "node", "node",
                                 "lbl", "_old", num_partitions=num_partitions)

        def _changed(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ne = pc.cast(pc.not_equal(b.column("lbl"), b.column("_old")),
                         pa.int64())
            return pa.table({"n": pa.array(
                [pc.sum(ne).as_py() or 0], pa.int64())})

        changed = with_old.map_batches(
            _changed, batch_format="pyarrow").aggregate(Sum("n", alias_name="n"))
        labels = new_labels
        if (changed["n"] or 0) == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "returning partial labels would silently corrupt clusters")

    return labels.map_batches(
        lambda b: pa.table({"node": b.column("node"), "label": b.column("lbl")}),
        batch_format="pyarrow")


def canonical_entity_map(linked_mentions, *, num_partitions: int = 16):
    """linked mentions/candidates (entity_key, qid) → Dataset
    (entity_key, canonical_id): qid-anchored clusters for LINKED keys.

    Keys that only ever appear unlinked (qid == "") are ABSENT from
    the map — attach them with ``joins.apply_mapping(...,
    default_col=<key column>)`` so they fall back to themselves, as
    ``pipelines/kg.py`` does (round-4 review: the docstring used to
    promise C:<key> singleton rows that were never emitted)."""
    import pyarrow.compute as pc

    def _edges(b: pa.Table) -> pa.Table:
        keys = b.column("entity_key")
        qids = b.column("qid")
        linked = pc.not_equal(qids, "")
        t = pa.table({"entity_key": keys, "qid": qids}).filter(linked)
        # qid nodes carry a \x00 prefix, surface keys \x01: the
        # component min-label is ALWAYS a prefixed qid, for every
        # possible key charset (a bare "!" prefix lost to keys starting
        # with space/control chars < 0x21 — round-4 review)
        out = pa.table({"src": pc.binary_join_element_wise(
            pa.array(["\x00"] * t.num_rows, pa.string()), t.column("qid"), ""),
            "dst": pc.binary_join_element_wise(
            pa.array(["\x01"] * t.num_rows, pa.string()),
            t.column("entity_key"), "")})
        # per-batch distinct combiner: mentions repeat the same
        # (qid, key) edge constantly, so dedup BEFORE the edge shuffle
        # (CLAUDE.md perf rule 1 — don't feed the AllToAll the full
        # mention stream when a tiny distinct set suffices)
        # schema pinned: from_pandas on an all-unlinked (empty) batch
        # would infer null-typed columns (round-4 review)
        return pa.Table.from_pandas(
            out.to_pandas().drop_duplicates(), schema=out.schema,
            preserve_index=False)

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

        is_key = pc.starts_with(b.column("node"), "\x01")
        t = b.filter(is_key)
        # strip the one-char node prefixes; the min label is a
        # \x00-prefixed qid by construction (every edge has a qid src)
        return pa.table({
            "entity_key": pc.utf8_slice_codeunits(t.column("node"), 1),
            "canonical_id": pc.utf8_slice_codeunits(t.column("label"), 1)})

    return comp.map_batches(_to_map, batch_format="pyarrow")
