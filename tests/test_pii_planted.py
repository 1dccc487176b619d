"""pii_scrub must DETECT and REDACT exactly the planted PII.

The gate row proves Spark/DuckDB parity; this test makes the detectors
falsifiable (cf. test_lang_planted.py): the planted emails/phones/IPs
are derived from doc_id in closed form, so expected per-class counts
and redaction cut lengths are computable exactly — any false positive
on the base text or missed plant breaks equality.
"""

MASKS = {"email": "<EMAIL>", "phone": "<PHONE>", "ipv4": "<IP>"}
# the exact substring the regex should match inside each planted arm
MATCHED = {
    ("email", 0): "alice.k@examples-mail.com",
    ("email", 1): "bob_1%tmp@sub.host.org",
    ("phone", 0): "+49 151 2345 678",
    ("phone", 1): "+1 202-555-0144",
    ("ipv4", 0): "192.168.4.27",
    ("ipv4", 1): "10.0.73.9",
}


def _expected(doc_id):
    # function-local import: the registry modules are circular at
    # module scope (cf. test_lang_planted.py)
    from gpiv_spark.queries_text import _PII_PLANTS

    n = {"email": 0, "phone": 0, "ipv4": 0}
    cut = 0
    for cls, mod, arm_a, arm_b in _PII_PLANTS:
        if doc_id % mod == 0:
            n[cls] += 1
            matched = MATCHED[(cls, doc_id % 2)]
            arm = arm_a if doc_id % 2 == 0 else arm_b
            assert matched in arm  # fixture self-check
            cut += len(matched) - len(MASKS[cls])
    return n["email"], n["phone"], n["ipv4"], cut


def test_pii_detection_and_redaction_exact(spark):
    from gpiv_spark.queries_text import q_pii_scrub

    rows = q_pii_scrub(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    mism = []
    for r in rows:
        want = _expected(r["doc_id"])
        got = (r["n_email"], r["n_phone"], r["n_ipv4"], r["n_cut"])
        if got != want:
            mism.append((r["doc_id"], want, got))
    assert not mism, f"{len(mism)} docs mismatch, first: {mism[:3]}"


def test_pii_clean_docs_untouched(spark):
    """Docs with no planted PII must come back with zero cuts — the
    scrubber may not rewrite clean text."""
    from gpiv_spark.queries_text import _PII_PLANTS, q_pii_scrub

    rows = q_pii_scrub(spark, "/root/testdata/sf0.001").collect()
    clean = [r for r in rows
             if all(r["doc_id"] % mod for _, mod, _, _ in _PII_PLANTS)]
    assert clean, "fixture has no clean docs"
    assert all(r["n_cut"] == 0 and
               r["n_email"] == r["n_phone"] == r["n_ipv4"] == 0
               for r in clean)
