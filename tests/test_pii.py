"""PII scrub semantics on hand-built strings (operators/pii.py); sf-scale
DuckDB-oracle parity rides the ``pii_scrub`` registry entry."""

from __future__ import annotations

from starchart_spark.operators import pii


def _run(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return pii.pii_features(df).first()


def test_scrubs_all_three_classes(spark):
    r = _run(
        spark,
        "mail a.b-c_d@ex-1.org or 10.0.255.7 or 25-989-741-2988 done",
    )
    assert r.clean_text == "mail <EMAIL> or <IP> or <PHONE> done"
    assert (r.n_emails, r.n_ipv4, r.n_phones) == (1, 1, 1)


def test_email_scrub_runs_before_ip(spark):
    # digit-dotted email local parts are legal; if the IP pass ran first it
    # would clip '1.2.3.4' out of the address — order is fixed email-first
    r = _run(spark, "mail 1.2.3.4@x.com end")
    assert r.clean_text == "mail <EMAIL> end"
    assert (r.n_emails, r.n_ipv4) == (1, 1)  # counts audit raw patterns


def test_multiple_matches_and_word_boundaries(spark):
    r = _run(spark, "a@b.co c@d.io and 1.2.3.4 5.6.7.8 but v1.2.3.4000 no")
    assert r.n_emails == 2
    # 'v1.2.3.4000': no \b between 'v' and '1', and the trailing \b fails
    # inside '4000' — not an IP
    assert r.n_ipv4 == 2
    assert r.clean_text == "<EMAIL> <EMAIL> and <IP> <IP> but v1.2.3.4000 no"


def test_clean_text_idempotent(spark):
    once = _run(spark, "p q@r.st 9.9.9.9 88-123-456-7890 z")
    r2 = _run(spark, once.clean_text)
    assert r2.clean_text == once.clean_text
    assert (r2.n_emails, r2.n_ipv4, r2.n_phones) == (0, 0, 0)
