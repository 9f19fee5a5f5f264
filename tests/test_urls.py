"""URL canonicalization: each chain step, domain extraction,
per-domain stats aggregation."""

import pyarrow as pa
import ray

from snorkel_ray.stages.urls import (
    domain_stats,
    extract_domain,
    normalize_url,
    normalize_urls,
)


def test_normalize_steps():
    assert normalize_url("https://WWW.Site.com/A/b#frag") == \
        "https://site.com/A/b"
    assert normalize_url("HTTP://Host.org/p?utm_source=x&id=1") == \
        "http://host.org/p?id=1"
    # tracking param first: dangling & repaired to ?
    assert normalize_url("https://a.co/p?utm_campaign=c&q=2&fbclid=z") == \
        "https://a.co/p?q=2"
    assert normalize_url("https://a.co/p/?utm_source=s") == "https://a.co/p"
    assert normalize_url("https://a.co/") == "https://a.co"
    # path case preserved; only the scheme://host prefix lowercases
    assert normalize_url("https://A.co/CaseSensitive") == \
        "https://a.co/CaseSensitive"
    # non-URL strings pass through un-mangled
    assert normalize_url("not a url") == "not a url"
    # round-4 review regressions: a literal & in a query-less path is
    # NOT a dangling delimiter, and '?#frag' leaves no trailing '?'
    assert normalize_url("https://site.com/a&b=1") == "https://site.com/a&b=1"
    assert normalize_url("https://Site.com/a?#frag") == "https://site.com/a"
    assert normalize_url("https://a.co/p?a=1&utm_x=2&b=3") == \
        "https://a.co/p?a=1&b=3"
    assert normalize_url("https://a.co/p?a=1&utm_x=2") == "https://a.co/p?a=1"
    assert normalize_url("https://a.co/p?utm_a=1&utm_b=2") == "https://a.co/p"


def test_extract_domain():
    assert extract_domain("https://site.com:8080/x") == "site.com"
    assert extract_domain("https://www.site.com/x") == "site.com"
    assert extract_domain("plain text") == ""


def test_normalize_urls_dataset_and_domain_col():
    ds = ray.data.from_arrow(pa.table({
        "url": ["https://WWW.A.com/x/", "http://B.org/y#z"]}))
    out = normalize_urls(ds).to_pandas()
    assert out.url.tolist() == ["https://a.com/x", "http://b.org/y"]
    assert out.domain.tolist() == ["a.com", "b.org"]


def test_domain_stats_collapses_duplicates():
    urls = [
        "https://www.a.com/p1",
        "https://A.com/p1#frag",          # same canonical as above
        "https://a.com/p2",
        "http://b.org/q?utm_source=s",
        "http://b.org/q",                 # same canonical as above
    ]
    ds = ray.data.from_arrow(pa.table({"url": urls})).repartition(2)
    out = domain_stats(ds).to_pandas().set_index("domain")
    assert out.loc["a.com", "n_unique_urls"] == 2
    assert out.loc["a.com", "n_pages"] == 3
    assert out.loc["b.org", "n_unique_urls"] == 1
    assert out.loc["b.org", "n_pages"] == 2


def test_track_mid_only_inside_query():
    """Round-4 ADVICE: a literal '&utm_x=...' in a QUERY-LESS path is
    not a tracking param — _TRACK_MID applies only after the first '?'
    (the oracle SQL s2b mirrors the same split)."""
    assert normalize_url("https://a.co/a&utm_x=2") == "https://a.co/a&utm_x=2"
    # path segment with &utm BEFORE a real query: path untouched,
    # query param stripped
    assert normalize_url("https://a.co/a&utm_x=2/p?a=1&utm_y=3") == \
        "https://a.co/a&utm_x=2/p?a=1"
