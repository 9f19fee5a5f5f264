"""LF matrix values on crafted candidates (SURVEY.md A1 / §2.10)."""

import numpy as np
import pyarrow as pa

from snorkel_ray.stages.labeling import LFApplier, labeling_function, row_lf


def cand_batch():
    return pa.table(
        {
            "pred": ["founded_by", "", "acquired"],
            "between_text": ["was founded by", "and then", "never acquired"],
            "pre_text": ["", "", ""],
            "sent_text": ["A was founded by B.", "A and then B.", "A never acquired B."],
            "subj_key": ["a", "a", "a"],
            "obj_key": ["b", "b", "b"],
            "gap": pa.array([3, 2, 2], pa.int32()),
        }
    )


def test_builtin_lf_votes():
    applier = LFApplier(kb_ref={"facts": [("QA", "founded_by", "QB")],
                                "link_index": {"a": ("QA", 1.0), "b": ("QB", 1.0)}})
    out = applier(cand_batch())
    L = np.array(out.column("L").to_pylist())
    names = applier.lf_names
    i = {n: j for j, n in enumerate(names)}
    # row 0: positive fact
    assert L[0, i["lf_trigger"]] == 1
    assert L[0, i["lf_negation"]] == 0
    assert L[0, i["lf_ds_known_pair"]] == 1
    # row 1: no trigger
    assert L[1, i["lf_trigger"]] == 0
    assert L[1, i["lf_no_trigger"]] == -1
    # row 2: negated, pair not in KB
    assert L[2, i["lf_negation"]] == -1
    assert L[2, i["lf_ds_unknown_pair"]] == -1
    assert L[2, i["lf_ds_known_pair"]] == 0


def test_row_lf_adapter_and_registry():
    reg = {}

    @labeling_function("lf_custom", reg)
    @row_lf
    def lf_custom(c):
        return 1 if c.gap <= 2 else 0

    applier = LFApplier(kb_ref=None, extra_lfs=reg)
    out = applier(cand_batch())
    L = np.array(out.column("L").to_pylist())
    j = applier.lf_names.index("lf_custom")
    assert L[:, j].tolist() == [0, 1, 1]


def test_ds_lfs_abstain_without_kb():
    applier = LFApplier(kb_ref=None)
    out = applier(cand_batch())
    L = np.array(out.column("L").to_pylist())
    i = {n: j for j, n in enumerate(applier.lf_names)}
    assert not L[:, i["lf_ds_known_pair"]].any()
    assert not L[:, i["lf_ds_unknown_pair"]].any()


def test_both_orders_candidates(ray_session):
    import ray.data as rd

    from snorkel_ray.stages.candidates import extract_candidates
    from snorkel_ray.stages.extract import extract_batch
    from snorkel_ray.stages.sentences import sentences_batch
    import pyarrow as pa

    pages = pa.table({
        "url": ["u1"],
        "warc_ts": pa.array([0], pa.timestamp("us")),
        "html": [b"<p>Acme acquired Globex yesterday.</p>"],
        "lang": ["en"],
    })
    sents = rd.from_arrow(sentences_batch(extract_batch(pages)))
    alias = pa.table({"alias": ["Acme", "Globex"],
                      "entity_qid": ["Q1", "Q2"],
                      "prior": pa.array([1.0, 1.0], pa.float32())})
    fwd = extract_candidates(sents, alias).to_pandas()
    assert len(fwd) == 1 and fwd.iloc[0]["subj_text"] == "Acme"
    both = extract_candidates(sents, alias, both_orders=True).to_pandas()
    assert len(both) == 2
    assert set(zip(both["subj_text"], both["obj_text"])) == \
        {("Acme", "Globex"), ("Globex", "Acme")}
    assert len(set(both["cand_stable_id"])) == 2
