"""Distributed vs driver-side materialize paths + lf_stats + LSH pairs."""

import numpy as np
import pyarrow as pa


def _linked_ds(ray_session):
    import ray.data as rd

    rows = []
    rng = np.random.default_rng(3)
    for i in range(400):
        k = i % 25
        rows.append({
            "pred": "rel", "subj_text": f"S{k}", "obj_text": f"O{k}",
            "subj_qid": f"Q{k}", "obj_qid": f"R{k}",
            "p": float(rng.uniform(0.3, 1.0)),
            "url": f"u{i}", "sent_stable_id": f"s{i}",
        })
    return rd.from_items(rows).repartition(8)


def test_small_and_distributed_dedup_agree(ray_session):
    from snorkel_ray.stages.materialize import materialize_triples

    ds = _linked_ds(ray_session)

    small = materialize_triples(ds.map_batches(_rename, batch_format="pyarrow"),
                                threshold=0.5, small_output=True).to_pandas()
    dist = materialize_triples(ds.map_batches(_rename, batch_format="pyarrow"),
                               threshold=0.5, small_output=False).to_pandas()
    small_s = small.sort_values(["subj_qid", "pred", "obj_qid"]).reset_index(drop=True)
    dist_s = dist.sort_values(["subj_qid", "pred", "obj_qid"]).reset_index(drop=True)
    assert small_s[["subj_qid", "pred", "obj_qid", "p"]].equals(
        dist_s[["subj_qid", "pred", "obj_qid", "p"]])
    # exactly one row per key, max p kept
    assert small_s.groupby(["subj_qid", "pred", "obj_qid"]).size().max() == 1


def test_materialize_auto_switch(ray_session):
    """small_output=None (the default) must route on the combined
    partial count: tiny threshold → distributed path, default
    threshold → driver path, identical output either way (round-2
    verdict item 2)."""
    from snorkel_ray.stages.materialize import materialize_triples

    ds = _linked_ds(ray_session)

    def run(**kw):
        out = materialize_triples(
            ds.map_batches(_rename, batch_format="pyarrow"),
            threshold=0.5, **kw).to_pandas()
        return out.sort_values(["subj_qid", "pred", "obj_qid"]) \
            .reset_index(drop=True)

    auto_small = run()  # count << 5M → driver path
    auto_dist = run(small_output_threshold=1)  # forces distributed path
    cols = ["subj_qid", "pred", "obj_qid", "p", "url", "sent_stable_id"]
    assert auto_small[cols].equals(auto_dist[cols])
    assert auto_small.groupby(["subj_qid", "pred", "obj_qid"]).size().max() == 1


def _rename(b: pa.Table) -> pa.Table:
    # materialize_triples projects from candidate-style columns
    return pa.table({
        "pred": b.column("pred"),
        "subj_text": b.column("subj_text"),
        "obj_text": b.column("obj_text"),
        "subj_qid": b.column("subj_qid"),
        "obj_qid": b.column("obj_qid"),
        "p": b.column("p"),
        "url": b.column("url"),
        "sent_stable_id": b.column("sent_stable_id"),
    })


def test_lf_stats(ray_session):
    import ray.data as rd

    from snorkel_ray.stages.label_model import lf_stats

    rows = [
        {"cand_stable_id": "a", "L": [1, -1, 0]},
        {"cand_stable_id": "b", "L": [1, 0, 0]},
        {"cand_stable_id": "c", "L": [0, 0, 0]},
        {"cand_stable_id": "d", "L": [-1, -1, 0]},
    ]
    out = lf_stats(rd.from_items(rows), ["lf_a", "lf_b", "lf_c"])
    df = out.to_pandas().set_index("lf_name")
    cov = dict(zip(df.index, df["coverage"]))
    assert abs(cov["lf_a"] - 0.75) < 1e-9
    assert abs(cov["lf_b"] - 0.5) < 1e-9
    assert cov["lf_c"] == 0.0
    conf = dict(zip(df.index, df["conflict"]))
    assert abs(conf["lf_a"] - 0.25) < 1e-9  # row 'a' has both signs


def test_lsh_bucket_pairs_standalone(ray_session):
    import ray.data as rd

    from snorkel_ray.stages.dedup import lsh_bucket_pairs, minhash_signatures

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3)
    rows = [{"doc_id": 1, "text": base}, {"doc_id": 2, "text": base},
            {"doc_id": 3, "text": "totally different words entirely here now"}]
    sigs = minhash_signatures(rd.from_items(rows), "text", "doc_id",
                              num_perm=32, shingle_k=3)
    pairs = lsh_bucket_pairs(sigs, "doc_id", bands=8).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["a"], pairs["b"])}
    assert (1, 2) in got
    assert not any(3 in p for p in got)
    # dedup=True must not emit duplicate pairs
    assert len(pairs) == len(pairs.drop_duplicates(["a", "b"]))


def test_unlinked_triples_do_not_collapse(ray_session):
    """Round-4 review: distinct facts whose entities are all unlinked
    (qid '') used to collapse under the shared ('', pred, '') dedup
    key — the small and distributed paths must both keep them apart,
    keyed by surface text."""
    import pandas as pd
    import ray.data as rd

    from snorkel_ray.stages.materialize import materialize_triples

    rows = pd.DataFrame({
        "subj_text": ["Alice", "Bob", "Alice"],
        "pred": ["born_in"] * 3,
        "obj_text": ["Paris", "Tokyo", "Paris"],
        "subj_qid": [""] * 3,
        "obj_qid": [""] * 3,
        "p": [0.9, 0.8, 0.7],
        "url": ["u1", "u2", "u3"],
        "sent_stable_id": ["s1", "s2", "s3"],
    })
    ds = rd.from_pandas(rows).repartition(2)
    for force in (True, False):
        out = (materialize_triples(ds, threshold=0.5, small_output=force)
               .to_pandas().sort_values(["subj", "obj"]).reset_index(drop=True))
        assert len(out) == 2, (force, out)
        assert out.subj.tolist() == ["Alice", "Bob"]
        # max-p witness survives for the duplicated fact
        assert out[out.subj == "Alice"].url.tolist() == ["u1"]


def test_distributed_dedup_matches_small_path(ray_session):
    """The vectorized Min-aggregate distributed plan must emit exactly
    the driver-merge plan's rows (values AND deterministic order)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from snorkel_ray.stages.materialize import materialize_triples

    rng = np.random.default_rng(4)
    n = 300
    rows = pd.DataFrame({
        "subj_text": [f"e{i % 40}" for i in range(n)],
        "pred": [("likes", "knows")[i % 2] for i in range(n)],
        "obj_text": [f"e{(i * 7) % 23}" for i in range(n)],
        "subj_qid": [f"Q{i % 40}" for i in range(n)],
        "obj_qid": [f"Q{(i * 7) % 23}" for i in range(n)],
        "p": rng.uniform(0.4, 1.0, n).round(3),
        "url": [f"u{i % 9}" for i in range(n)],
        "sent_stable_id": [f"s{i}" for i in range(n)],
    })
    ds = rd.from_pandas(rows).repartition(5)
    small = materialize_triples(ds, threshold=0.5,
                                small_output=True).to_pandas()
    dist = materialize_triples(ds, threshold=0.5,
                               small_output=False).to_pandas()
    pd.testing.assert_frame_equal(small.reset_index(drop=True),
                                  dist.reset_index(drop=True))
