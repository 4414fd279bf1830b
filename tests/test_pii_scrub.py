"""scrub_pii: redaction + counts on constructed rows (the fixture
corpus is digit-free, so this operator is library-tested rather than
driver-oracled — see operators/text.py docstring)."""

from kafka_parquet_writer_spark.operators.text import scrub_pii


def test_scrub_pii_redacts_and_counts(spark):
    rows = [
        (1, "contact me at alice@example.com or bob.smith@sub.domain.org"),
        (2, "server at 192.168.1.100 and 10.0.0.1 responded"),
        (3, "call +1 555 123 4567 today"),
        (4, "nothing sensitive here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in scrub_pii(df).collect()}

    assert out[1]["n_email"] == 2
    assert out[1]["text_scrubbed"].count("<EMAIL>") == 2
    assert "@" not in out[1]["text_scrubbed"]

    assert out[2]["n_ipv4"] == 2
    assert out[2]["text_scrubbed"].count("<IP>") == 2
    assert "192.168" not in out[2]["text_scrubbed"]

    assert out[3]["n_phone"] == 1
    assert "<PHONE>" in out[3]["text_scrubbed"]
    assert "555" not in out[3]["text_scrubbed"]

    assert out[4]["n_email"] == out[4]["n_ipv4"] == out[4]["n_phone"] == 0
    assert out[4]["text_scrubbed"] == out[4]["text"]
