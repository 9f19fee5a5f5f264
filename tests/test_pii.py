"""PII redaction: pattern coverage, redaction order, stats columns."""

import pyarrow as pa
import ray

from snorkel_ray.stages.pii import PiiRedactor, redact_pii


def _ds(texts):
    return ray.data.from_arrow(pa.table({"text": texts}))


def test_redacts_all_kinds_and_counts():
    out = redact_pii(_ds([
        "mail a.b+c@foo-bar.org now",
        "server at 192.168.0.1 and 10.0.0.255",
        "call +1-555-123-4567 or 555-123 4567",
        "clean text stays clean",
    ]), "text", stats=True).to_pandas()
    assert out.text.tolist() == [
        "mail <EMAIL> now",
        "server at <IP> and <IP>",
        "call <PHONE> or <PHONE>",
        "clean text stays clean",
    ]
    assert out.n_email.tolist() == [1, 0, 0, 0]
    assert out.n_ipv4.tolist() == [0, 2, 0, 0]
    assert out.n_phone.tolist() == [0, 0, 2, 0]


def test_order_email_ip_before_phone():
    # digit runs inside an email/IP must be consumed before the phone
    # pattern sees them
    r = PiiRedactor(stats=True)
    out = r(pa.table({"text": ["x 123.45.67.89 y 555 123@q.co z"]}))
    assert out.column("text").to_pylist() == ["x <IP> y 555 <EMAIL> z"]
    assert out.column("n_phone").to_pylist() == [0]


def test_no_stats_keeps_schema():
    out = redact_pii(_ds(["a@b.co"]), "text").to_pandas()
    assert list(out.columns) == ["text"]
    assert out.text.tolist() == ["<EMAIL>"]


def test_custom_patterns():
    out = redact_pii(_ds(["ssn 123-45-6789 ok"]), "text",
                     patterns={"ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>")},
                     stats=True).to_pandas()
    assert out.text.tolist() == ["ssn <SSN> ok"]
    assert out.n_ssn.tolist() == [1]
