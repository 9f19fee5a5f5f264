"""E2E golden triples, resume, mentions/linking/canonicalization — the
Ray-session-backed tests (SURVEY.md §5 items 3/4)."""

import os
import shutil

import pyarrow as pa
import pytest

from snorkel_ray.pipelines.kg import run_kg_pipeline
from snorkel_ray.stages.materialize import evaluate_triples
from snorkel_ray.synth import alias_table, build_kb, expected_triples, pages_dataset

N_PAGES = 300
SEED = 42


@pytest.fixture(scope="module")
def kb():
    return build_kb(SEED)


def test_e2e_golden_triples(ray_session, kb):
    triples, info = run_kg_pipeline(pages_dataset(N_PAGES, SEED), alias_table(kb),
                                    kb["facts"])
    got = pa.Table.from_pandas(triples.to_pandas())
    res = evaluate_triples(got, expected_triples(N_PAGES, SEED))
    assert res["precision"] >= 0.95, res
    assert res["recall"] >= 0.95, res


def test_resume_skips_and_is_identical(ray_session, kb, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt)
    args = (pages_dataset(150, SEED), alias_table(kb), kb["facts"])
    t1, i1 = run_kg_pipeline(*args, checkpoint_dir=ckpt)
    df1 = t1.to_pandas().sort_values(["subj_qid", "pred", "obj_qid"]).reset_index(drop=True)
    assert all(not s["skipped"] for s in i1["stages"])

    # simulate a killed run resuming: manifests exist -> all stages skip
    t2, i2 = run_kg_pipeline(*args, checkpoint_dir=ckpt)
    df2 = t2.to_pandas().sort_values(["subj_qid", "pred", "obj_qid"]).reset_index(drop=True)
    assert all(s["skipped"] for s in i2["stages"]), i2["stages"]
    assert df1.equals(df2)

    # partial checkpoint (kill after stage 1): later stages recompute,
    # stage 1 skips, output identical
    shutil.rmtree(os.path.join(ckpt, "scored_linked"))
    shutil.rmtree(os.path.join(ckpt, "triples"))
    t3, i3 = run_kg_pipeline(*args, checkpoint_dir=ckpt)
    df3 = t3.to_pandas().sort_values(["subj_qid", "pred", "obj_qid"]).reset_index(drop=True)
    flags = {s["stage"]: s["skipped"] for s in i3["stages"]}
    assert flags["labeled"] is True and flags["triples"] is False
    assert df1.equals(df3)

    # param change invalidates downstream stage fingerprints
    t4, i4 = run_kg_pipeline(*args, checkpoint_dir=ckpt, threshold=0.6)
    flags = {s["stage"]: s["skipped"] for s in i4["stages"]}
    assert flags["labeled"] is True and flags["scored_linked"] is False


def test_mentions_and_linking(ray_session, kb):
    import ray

    from snorkel_ray.stages.extract import extract_docs
    from snorkel_ray.stages.linking import link_mentions
    from snorkel_ray.stages.mentions import detect_mentions
    from snorkel_ray.stages.sentences import split_docs_to_sentences

    pages = pages_dataset(60, SEED)
    alias_ref = ray.put(alias_table(kb))
    sents = split_docs_to_sentences(extract_docs(pages))
    mentions = detect_mentions(sents, alias_ref)
    linked = link_mentions(mentions, alias_ref)
    df = linked.to_pandas()
    assert len(df) > 50
    # every dictionary mention must link (dict-driven detection)
    assert (df["qid"] != "").all()
    # spans are offset-exact against their sentence text
    s_df = sents.to_pandas().set_index(["url", "sent_idx"])
    for _, r in df.head(100).iterrows():
        sent_text = s_df.loc[(r["url"], r["sent_idx"])]["text"]
        assert sent_text[r["char_start"]:r["char_end"]] == r["text"]


def test_linker_collision_tiebreak(ray_session, kb):
    from snorkel_ray.stages.linking import build_link_index

    idx = build_link_index(alias_table(kb))
    # "Springfield" collides (place owns it, org has prior 0.2)
    qid, prior = idx["springfield"]
    place_qid = next(e["qid"] for e in kb["entities"]
                     if e["type"] == "place" and e["name"] == "Springfield")
    assert qid == place_qid and prior == 1.0


def test_canonicalize_connected_components(ray_session):
    import ray.data as rd

    from snorkel_ray.stages.canonicalize import canonical_entity_map

    rows = [
        {"entity_key": "acme corp", "qid": "Q1"},
        {"entity_key": "acme corporation", "qid": "Q1"},
        {"entity_key": "acme", "qid": "Q1"},
        {"entity_key": "globex", "qid": "Q2"},
        {"entity_key": "unlinked thing", "qid": ""},
    ]
    ds = rd.from_items(rows)
    out = canonical_entity_map(ds).to_pandas().set_index("entity_key")["canonical_id"]
    assert out["acme corp"] == out["acme corporation"] == out["acme"] == "Q1"
    assert out["globex"] == "Q2"
    assert "unlinked thing" not in out.index  # unlinked stay out of the map


def test_canonicalize_and_diagnostics_modes(ray_session, kb):
    triples, info = run_kg_pipeline(pages_dataset(120, SEED), alias_table(kb),
                                    kb["facts"], canonicalize=True,
                                    diagnostics=True)
    got = pa.Table.from_pandas(triples.to_pandas())
    res = evaluate_triples(got, expected_triples(120, SEED))
    assert res["precision"] >= 0.95 and res["recall"] >= 0.95
    assert info["coverage"]["coverage"] > 0.9
    names = [r["lf_name"] for r in info["lf_stats"]]
    assert "lf_trigger" in names and "lf_negation" in names


def test_fused_candidates_parity(ray_session):
    """extract_candidates_fused(docs) must emit exactly the rows of
    extract_candidates(split_docs_to_sentences(docs)) — the fused path
    skips the intermediate Arrow sentence columns, nothing else."""
    from snorkel_ray.stages.candidates import extract_candidates, \
        extract_candidates_fused
    from snorkel_ray.stages.extract import extract_docs
    from snorkel_ray.stages.sentences import split_docs_to_sentences
    from snorkel_ray.synth import alias_table, build_kb, pages_dataset

    kb = build_kb(42)
    at = alias_table(kb)
    docs = extract_docs(pages_dataset(120, 42)).materialize()

    via_sentences = extract_candidates(split_docs_to_sentences(docs), at) \
        .to_pandas().sort_values("cand_stable_id").reset_index(drop=True)
    fused = extract_candidates_fused(docs, at) \
        .to_pandas().sort_values("cand_stable_id").reset_index(drop=True)
    assert len(fused) == len(via_sentences) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(fused, via_sentences)


def test_cc_distributed_path_matches_union_find(ray_session):
    """Both connected-components regimes (driver union-find below the
    threshold, distributed label propagation above) must label chains
    identically."""
    import ray.data as rd

    from snorkel_ray.stages.canonicalize import connected_components

    edges = [{"src": f"n{i}", "dst": f"n{i+1}"} for i in range(6)] + \
        [{"src": "x1", "dst": "x2"}, {"src": "z9", "dst": "z8"}]
    ds = rd.from_items(edges).repartition(3)
    small = connected_components(ds).to_pandas().set_index("node")["label"]
    dist = connected_components(ds, driver_threshold=0, max_iter=6) \
        .to_pandas().set_index("node")["label"]
    for n in small.index:
        assert small[n] == dist[n], n
    assert small["n6"] == "n0" and small["x2"] == "x1" and small["z8"] == "z8"


def test_giant_page_routing_preserves_output(ray_session, kb):
    """giant_page_bytes routes oversized pages through single-row
    batches; the triple set must be identical to the unrouted run."""
    base, _ = run_kg_pipeline(pages_dataset(150, SEED), alias_table(kb),
                              kb["facts"])
    routed, _ = run_kg_pipeline(pages_dataset(150, SEED), alias_table(kb),
                                kb["facts"], giant_page_bytes=600)
    a = base.to_pandas().sort_values(["subj_qid", "pred", "obj_qid"]) \
        .reset_index(drop=True)
    b = routed.to_pandas().sort_values(["subj_qid", "pred", "obj_qid"]) \
        .reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert a[["subj_qid", "pred", "obj_qid"]].equals(
        b[["subj_qid", "pred", "obj_qid"]])


def test_fit_sample_fraction_mode(ray_session, kb):
    """Unbiased one-pass fit: random_sample fraction instead of the
    prefix limit — quality unchanged on the synthetic corpus."""
    triples, _ = run_kg_pipeline(pages_dataset(200, SEED), alias_table(kb),
                                 kb["facts"], fit_sample_fraction=0.5)
    got = pa.Table.from_pandas(triples.to_pandas())
    res = evaluate_triples(got, expected_triples(200, SEED))
    assert res["precision"] >= 0.95 and res["recall"] >= 0.95


def test_cc_distributed_long_chain_converges(ray_session):
    """Round-2 ADVICE item 3: the distributed CC used a fixed 4 rounds
    of one-hop propagation and silently split components with diameter
    > 4. Pointer jumping + the changed-count exit must label a
    41-node path (diameter 40) exactly, in O(log d) rounds."""
    import pandas as pd
    import ray.data as rd

    from snorkel_ray.stages.canonicalize import (connected_components,
                                                 union_find_labels)

    nodes = [f"n{i:03d}" for i in range(41)]
    edf = pd.DataFrame({"src": nodes[:-1], "dst": nodes[1:]})
    dist = (connected_components(rd.from_pandas(edf).repartition(3),
                                 driver_threshold=0)
            .to_pandas().set_index("node")["label"].to_dict())
    exact = union_find_labels(edf, "src", "dst") \
        .set_index("node")["label"].to_dict()
    assert dist == exact
    assert all(v == "n000" for v in dist.values())


def test_checkpoint_invalidates_on_kb_change(ray_session, tmp_path):
    """Round-4 review: the labeled/scored checkpoints fingerprint the
    alias table and facts KB — editing either must recompute, not
    silently serve stale parquet."""
    from snorkel_ray.pipelines.kg import run_kg_pipeline
    from snorkel_ray.synth import alias_table, build_kb, pages_dataset

    kb = build_kb(42)
    root = str(tmp_path / "cp")
    _, info1 = run_kg_pipeline(pages_dataset(120, 42), alias_table(kb),
                               kb["facts"], checkpoint_dir=root)
    assert all(not s["skipped"] for s in info1["stages"])

    # unchanged rerun skips everything
    _, info2 = run_kg_pipeline(pages_dataset(120, 42), alias_table(kb),
                               kb["facts"], checkpoint_dir=root)
    assert all(s["skipped"] for s in info2["stages"])

    # a fact edit invalidates the labeled stage (and its descendants)
    facts2 = list(kb["facts"]) + [("Qx", "born_in", "Qy")]
    _, info3 = run_kg_pipeline(pages_dataset(120, 42), alias_table(kb),
                               facts2, checkpoint_dir=root)
    assert all(not s["skipped"] for s in info3["stages"])


def test_linker_null_keys(ray_session):
    """Null entity keys must link to '' (unlinked), not wrap to the
    batch's last factorized key (round-4 review)."""
    import ray

    from snorkel_ray.stages.linking import LinkerActor
    from snorkel_ray.synth import alias_table, build_kb

    linker = LinkerActor(ray.put(alias_table(build_kb(42))))
    real_key = None
    for k in linker.index:
        real_key = k
        break
    qids, _ = linker.link_keys([real_key, None, real_key])
    assert qids[0] != "" and qids[1] == "" and qids[2] == qids[0]
    assert linker.link_keys([None, None])[0] == ["", ""]
