"""Every bench micro must survive the bench's OWN consumption path.

Round-4 shipped a driver bench with a silently dead micro: a queries()
callable started returning a pandas DataFrame and bench.py's
unconditional ``.to_pandas()`` raised on every run (BENCH_r04
``embedding_topk: -1.0``).  This test runs each micro callable through
``bench.consume_micro`` at sf0.001 so a return-type change breaks CI,
not the public evidence channel.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def test_all_bench_micros_consumable(ray_session):
    import bench
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    missing = [m for m in bench.MICROS if m not in qs]
    assert not missing, f"bench micros absent from queries(): {missing}"
    for name in bench.MICROS:
        bench.consume_micro(qs[name](SF))  # must not raise


def test_consume_micro_duck_types():
    import pandas as pd
    import pyarrow as pa

    import bench

    # a DataFrame / Table (no .to_pandas() needed vs has one) both pass
    bench.consume_micro(pd.DataFrame({"a": [1]}))
    bench.consume_micro(pa.table({"a": [1]}))


def test_driver_gate_head_covers_every_family():
    """The driver's correctness gate verifies only the FIRST 50
    queries() entries; pin the curated head so a refactor can't
    silently push a family representative past the cut (review r5)."""
    import inspect
    import re

    import __ray_entry__ as e

    qs = list(e.queries())
    # a duplicate key LITERAL in the dict silently drops one entry and
    # shifts everything after it up one gate slot — dict identity can't
    # see it, so scan the source (review r5: the runtime-dict assert
    # was vacuous)
    src_keys = re.findall(r'^        "([a-z0-9_]+)": q_',
                          inspect.getsource(e.queries), re.M)
    dupes = {k for k in src_keys if src_keys.count(k) > 1}
    assert not dupes, f"duplicate key literals in queries(): {dupes}"
    assert src_keys == qs, "source key order disagrees with the dict"
    head = set(qs[:50])
    must_head = {
        "kg_pipeline", "minhash_dedup_clusters", "curation_funnel",
        "token_counts", "embedding_topk", "lineitem_agg",
        "customer_order_join", "exact_dedup_documents",
        "decontaminate_docs", "gopher_quality", "pii_redaction",
        # round-5 families promoted into the gate
        "chunk_documents", "open_not_failed_customers",
        "lineitem_grouping_sets", "tpch_q21",
    }
    missing = must_head - head
    assert not missing, f"gate head lost family heads: {sorted(missing)}"
    # every oracle key must have a queries() entry (queries without an
    # oracle are the documented rows-only set, so only this direction)
    orphan = set(e.oracle_sql()) - set(qs)
    assert not orphan, f"oracle_sql keys without queries(): {sorted(orphan)}"
