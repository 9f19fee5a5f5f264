"""Scale-aware key→value mapping application (broadcast or shuffle).

The reference resolves every lookup through SQLAlchemy FK traversal
(``snorkel/models/candidate.py`` ≈L100); here the two physical plans a
distributed engine actually needs are made explicit:

- **broadcast**: the mapping fits comfortably in the object store →
  ``ray.put`` once, vectorized pandas ``Series.map`` inside
  ``map_batches``.  Zero shuffle; every task reads the same plasma
  object (shared per node, NOT re-shipped per batch).
- **shuffle**: the mapping is itself huge (e.g. a canonical-entity map
  over 10^12 docs' distinct keys) → hash join via ``Dataset.join``,
  both sides shuffled on the key.

``apply_mapping`` picks automatically by counting the mapping side
(cheap: the mapping is always the small derived table of the two), with
an explicit ``broadcast_limit`` override.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

DEFAULT_BROADCAST_LIMIT = 2_000_000  # rows; ~100 MB of short strings


def apply_mapping(ds, mapping, key_col: str, map_key: str, map_value: str,
                  out_col: str, *, default_col: str | None = None,
                  broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
                  num_partitions: int = 32):
    """Append ``out_col`` = mapping[ds[key_col]] to ``ds``.

    ``mapping`` is a Dataset (or pyarrow Table / pandas DataFrame) with
    columns ``map_key`` → ``map_value``.  Rows whose key is absent get
    ``ds[default_col]`` when given, else null.

    Broadcast path when the mapping has ≤ ``broadcast_limit`` rows,
    hash-join shuffle path otherwise (partitioning assumption: keys
    hash-distribute evenly; salt upstream if one key dominates).
    """
    import ray
    import ray.data as rd

    if isinstance(mapping, pa.Table):
        mapping = rd.from_arrow(mapping)
    elif isinstance(mapping, pd.DataFrame):
        mapping = rd.from_pandas(mapping)

    # count() + consume would otherwise execute the mapping's lineage
    # twice; the mapping lives in the object store either way
    mapping = mapping.materialize()
    n = mapping.count()
    if n == 0:
        # empty Datasets lose their columns through to_pandas (known
        # ray 2.49 pitfall) — short-circuit: everything maps to default
        def _empty(b: pa.Table) -> pa.Table:
            col = (b.column(default_col) if default_col is not None
                   else pa.nulls(b.num_rows))
            return b.append_column(out_col, col)

        return ds.map_batches(_empty, batch_format="pyarrow")
    if n <= broadcast_limit:
        mdf = mapping.select_columns([map_key, map_value]).to_pandas()
        vals_src = mdf[map_value]
        if pd.api.types.is_integer_dtype(vals_src.dtype):
            # nullable-int lookup values: a plain int64 Series.map
            # upcasts to float64 when any key misses (NaN), silently
            # corrupting ids ≥ 2^53 — the stated 10^12-doc hash-id
            # design target (round-2 ADVICE item 2). The masked
            # extension array keeps misses as pd.NA at full precision.
            nullable = {"int8": "Int8", "int16": "Int16", "int32": "Int32",
                        "int64": "Int64", "uint8": "UInt8", "uint16": "UInt16",
                        "uint32": "UInt32", "uint64": "UInt64"}
            vals_src = vals_src.astype(nullable[str(vals_src.dtype)])
        lookup_ref = ray.put(pd.Series(vals_src.array
                                       if hasattr(vals_src, "array")
                                       else vals_src.values,
                                       index=mdf[map_key].values))

        def _apply(b: pa.Table) -> pa.Table:
            lookup = ray.get(lookup_ref)
            keys = b.column(key_col).to_pandas()
            vals = keys.map(lookup)
            if default_col is not None:
                vals = vals.fillna(b.column(default_col).to_pandas())
            return b.append_column(out_col, pa.Array.from_pandas(vals))

        return ds.map_batches(_apply, batch_format="pyarrow")

    # shuffle path: left outer hash join on the key (mapping columns
    # renamed to private names so they can never collide with ds's).
    # Partition count is clamped to the session CPUs: the hash-shuffle
    # aggregator pool otherwise starves task operators on small
    # sessions (the actor-pool deadlock pitfall — observed as a hang on
    # the 4-CPU test fixture with 32 partitions).
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    nparts = max(2, min(num_partitions, cpus))
    renamed = mapping.map_batches(
        lambda b: pa.table({"__map_key": b.column(map_key),
                            out_col: b.column(map_value)}),
        batch_format="pyarrow")
    joined = ds.join(renamed, join_type="left_outer",
                     num_partitions=nparts,
                     on=(key_col,), right_on=("__map_key",))

    import pyarrow.compute as pc

    def _finish(b: pa.Table) -> pa.Table:
        if default_col is not None:
            i = b.schema.get_field_index(out_col)
            b = b.set_column(i, out_col,
                             pc.coalesce(b.column(out_col), b.column(default_col)))
        if "__map_key" in b.schema.names:
            b = b.drop_columns(["__map_key"])
        return b

    return joined.map_batches(_finish, batch_format="pyarrow")
