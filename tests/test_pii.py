"""Planted-case tests for PII scrubbing."""

from __future__ import annotations

from dedupe_spark.operators.pii import scrub_pii


def _docs(spark):
    rows = [
        (1, "mail a.user+tag@sub.example.co.uk and bob@x.io today"),
        (2, "server at 10.0.0.1 and 192.168.255.254, port 8080"),
        (3, "call 555-123-4567 or 555.987.6543 now"),
        (4, "mixed: eve@corp.net from 172.16.0.9 dialed 800-555-0100"),
        (5, "clean text with no contact information at all"),
        (6, "version 1.2.3 is not an IP; 12-34-5678 is not a phone"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_scrub_and_counts(spark):
    out = {r["doc_id"]: r for r in scrub_pii(_docs(spark)).collect()}
    assert out[1]["text"] == "mail <EMAIL> and <EMAIL> today"
    assert out[1]["n_emails"] == 2 and out[1]["n_ips"] == 0
    assert out[2]["text"] == "server at <IP> and <IP>, port 8080"
    assert out[2]["n_ips"] == 2 and out[2]["n_phones"] == 0
    assert out[3]["text"] == "call <PHONE> or <PHONE> now"
    assert out[3]["n_phones"] == 2
    assert out[4]["text"] == "mixed: <EMAIL> from <IP> dialed <PHONE>"
    assert (out[4]["n_emails"], out[4]["n_ips"], out[4]["n_phones"]) == (1, 1, 1)
    assert out[5]["text"].startswith("clean text") and out[5]["n_emails"] == 0


def test_non_pii_lookalikes_survive(spark):
    out = {r["doc_id"]: r for r in scrub_pii(_docs(spark)).collect()}
    # three dot-groups is not an IPv4; 2-2-4 digits is not a phone
    assert out[6]["text"] == "version 1.2.3 is not an IP; 12-34-5678 is not a phone"
    assert (out[6]["n_emails"], out[6]["n_ips"], out[6]["n_phones"]) == (0, 0, 0)


def test_schema_and_rowcount_preserved(spark):
    df = _docs(spark)
    out = scrub_pii(df)
    assert out.count() == df.count()
    assert out.columns == ["doc_id", "text", "n_emails", "n_ips", "n_phones"]
