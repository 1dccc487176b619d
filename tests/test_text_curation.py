"""Planted-behavior tests for the training-mix curation queries.

`repetition_score` and `sample_stratified` are oracle-checked for
engine parity (tools/check_oracles.py + the driver gate); these tests
make the SEMANTICS falsifiable:
- a doc that is one phrase repeated must score rep_frac near 1, a
  diverse doc near 0 (the Gopher-style filter actually discriminates);
- the stratified sample must be invariant to the phase-1 salt (the
  two-phase top-k is an optimization, not a semantics change) and
  exactly k-per-stratum deterministic.
"""

import pandas as pd

SF = "/root/testdata/sf0.01"


def _rep_scores(spark, texts):
    import gpiv_spark.queries  # noqa: F401  (registry before queries_text)
    from gpiv_spark.dialect import SPARK as D
    from gpiv_spark.queries_text import _repetition_sql

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["t"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        )
    )
    df.createOrReplaceTempView("documents")
    out = spark.sql(_repetition_sql(D))
    return {r["doc_id"]: r for r in out.collect()}


def test_repetition_discriminates(spark):
    repeated = ("the cat sat on the mat " * 40).strip()  # one phrase, looped
    diverse = " ".join(f"tok{i}x unique{i*7}y w{i*13}z" for i in range(40))
    rows = _rep_scores(spark, [repeated, diverse])
    assert rows[0]["rep_frac"] > 0.9, rows[0]
    assert rows[1]["rep_frac"] < 0.05, rows[1]
    # bookkeeping exact: n_tri = n_tokens - 2
    assert rows[0]["n_tri"] == 40 * 6 - 2


def test_repetition_short_docs_excluded(spark):
    rows = _rep_scores(spark, ["one two", "a b c"])
    assert 0 not in rows            # < 3 tokens -> filtered
    assert rows[1]["n_tri"] == 1 and rows[1]["rep_frac"] == 0.0


def test_stratified_sample_salt_invariant(spark):
    """The salted phase-1 must not change the result: compare against a
    single-phase rank over the same hash, and pin k-per-stratum."""
    import gpiv_spark.queries  # noqa: F401  (registry before queries_text)
    from gpiv_spark.queries_text import (
        _SAMPLE_K,
        _SAMPLE_P,
        q_sample_stratified,
    )

    got = q_sample_stratified(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    p = _SAMPLE_P
    docs["h"] = (((docs.doc_id % p) * 131071 + 12345) % p * 8191 + 777) % p
    expect = (
        docs.sort_values(["h", "doc_id"])
        .groupby("lang", sort=False)
        .head(_SAMPLE_K)
    )
    assert len(got) == len(expect)
    assert set(map(tuple, got[["doc_id", "lang"]].values)) == set(
        map(tuple, expect[["doc_id", "lang"]].values)
    )
    # exactly k per stratum (every lang has >= k docs at this SF)
    assert (got.groupby("lang").size() == _SAMPLE_K).all()
    # ranks are 1..k within each stratum
    assert (
        got.sort_values(["lang", "samp_rank"]).groupby("lang")["samp_rank"]
        .apply(lambda s: list(s) == list(range(1, _SAMPLE_K + 1)))
        .all()
    )
    # the salt is a SCALE knob, not a semantics knob: a 16x wider
    # phase-1 fan-out must produce the identical sample
    from gpiv_spark.queries_text import _sample_sql

    wide = spark.sql(_sample_sql(salt=256)).toPandas()
    key = ["lang", "samp_rank", "doc_id"]
    assert (
        wide.sort_values(key).reset_index(drop=True)[key]
        .equals(got.sort_values(key).reset_index(drop=True)[key])
    )
