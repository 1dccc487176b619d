"""Training-data pipeline queries: text analysis, dedup family, ANN.

Registered into gpiv_spark.queries.REGISTRY. These are the operators a
100 TB training-data pipeline needs beyond the reference's own set
(tasked as first-class in this build): token counting, quality
scoring, language ID, fingerprinting, exact + minhash + simhash +
n-gram-jaccard dedup, and embedding cosine top-k.

Scale notes (100 TB):
- every per-doc op here is a single map-side pass (no shuffle);
- minhash/simhash signatures shuffle only the k-int signature, not
  text — the LSH band join groups by (band, bucket) with salting
  available for hot buckets;
- cosine top-k broadcasts the query set and computes dot products
  JVM-side via zip_with/aggregate (no Python, no UDF), then a
  partial top-k per partition before the final window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpiv_spark.dialect import DUCKDB, SPARK
from gpiv_spark.functions import text as tx
from gpiv_spark.queries import register, _docs, _run_both


# --- token stats ------------------------------------------------------------

def _token_stats_sql(d) -> str:
    nt = d.ntokens("text")
    return f"""
    SELECT doc_id, CAST({nt} AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS len_chars,
           (CAST(length(text) AS DOUBLE) - ({nt} - 1)) / {nt} AS mean_token_len
    FROM documents WHERE length(text) > 0
    """


@register("token_stats", _token_stats_sql(DUCKDB))
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _token_stats_sql(SPARK))


# --- BPE-ish regex token counting --------------------------------------------
# The whitespace count above is the cheap path; this is the "BPE-ish
# regex" variant the pipeline spec calls for: word runs and punctuation
# become separate tokens, plus a subword estimate (ceil(len/4) per word
# — the ~4-chars-per-token rule of byte-pair vocabularies). Pure list
# expressions — JVM-side higher-order functions in Spark, list_* in
# DuckDB; the regex stays in the char-class subset Java and RE2 parse
# identically.

_WORD_RE = "[A-Za-z0-9]+"
_PUNCT_RE = "[^A-Za-z0-9 ]"


def _token_regex_sql(d) -> str:
    words = d.regex_matches("text", _WORD_RE)
    punct = d.regex_matches("text", _PUNCT_RE)
    sub = d.fold_sum_big(words, "w", "ceil(length(w) / 4.0)")
    return f"""
    SELECT doc_id,
           CAST({d.list_len(words)} AS BIGINT) AS n_word_tokens,
           CAST({d.list_len(punct)} AS BIGINT) AS n_punct_tokens,
           CAST({sub} AS BIGINT) AS n_subword_est
    FROM documents WHERE length(text) > 0
    """


# gate=False (round 4): near-twin of the gated token_stats (same scan,
# BPE-ish regex variant of the same counting template) — retired to
# free a gate slot for the media resize/frame-sample operators. Still
# verified by tools/check_oracles.py + tests/test_retired_oracles.py.
@register("token_regex", _token_regex_sql(DUCKDB), gate=False)
def q_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _token_regex_sql(SPARK))


# --- quality score ----------------------------------------------------------

def _quality_sql(d) -> str:
    nt = d.ntokens("text")
    the_ratio = tx.marker_count_expr("text", " the ")
    return f"""
    SELECT doc_id,
           CAST({nt} AS BIGINT) AS n_tokens,
           round(CAST({the_ratio} AS DOUBLE) / {nt}, 9) AS stopword_ratio,
           round(least(1.0, CAST({nt} AS DOUBLE) / 64.0)
                 * (1.0 - abs((CAST(length(text) AS DOUBLE) - ({nt} - 1)) / {nt} - 4.5) / 10.0),
                 9) AS quality
    FROM documents WHERE length(text) > 0
    """


@register("quality_score", _quality_sql(DUCKDB))
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _quality_sql(SPARK))


# --- language ID heuristic ---------------------------------------------------

def _lang_sql(d) -> str:
    scores = tx.lang_score_exprs("(' ' || text || ' ')")
    langs = list(scores)
    best = f"greatest({', '.join(scores.values())})"
    pred = "CASE " + " ".join(
        f"WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in langs
    ) + " ELSE 'und' END"
    return f"""
    SELECT doc_id, ({pred}) AS pred_lang, CAST({best} AS BIGINT) AS best_score,
           lang AS true_lang
    FROM documents
    """


# gate=False (round 4): parity-only twin — the TESTDATA text is
# English-ish under every label, so this row only pins the dual-dialect
# scoring math; the FALSIFIABLE check is lang_id_planted below. Still
# verified by tools/check_oracles.py + tests/test_retired_oracles.py.
@register("lang_id", _lang_sql(DUCKDB), gate=False)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _lang_sql(SPARK))


# --- lang_id_planted: the heuristic must DISCRIMINATE ------------------------
# The testdata's text is English-ish under every `lang` label, so the
# plain lang_id gate can only prove parity. This fixture PLANTS the
# language: each doc gets marker-rich text in one of en/de/es/fr
# (derived from doc_id, rendered identically in both dialects), so the
# marker heuristic is falsifiable — tests/test_lang_planted.py asserts
# accuracy 1.0 against the planted labels, and the gate hashes the
# per-language confusion counts.

PLANT_SENT = {
    "en": "the cat and the dog of the house ",
    "de": "der hund und die katze der stadt ",
    "es": "el perro los gatos de la casa ",
    "fr": "le chien les chats des villes ",
}


def _planted_sql(d) -> str:
    langs = list(PLANT_SENT)
    lang_case = ("CASE doc_id % 4 " + " ".join(
        f"WHEN {i} THEN '{lang}'" for i, lang in enumerate(langs)
    ) + " END")
    text_case = ("CASE doc_id % 4 " + " ".join(
        f"WHEN {i} THEN repeat('{PLANT_SENT[lang]}', "
        f"CAST(1 + doc_id % 3 AS INT))" for i, lang in enumerate(langs)
    ) + " END")
    scores = tx.lang_score_exprs("(' ' || text || ' ')")
    best = f"greatest({', '.join(scores.values())})"
    pred = "CASE " + " ".join(
        f"WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in scores
    ) + " ELSE 'und' END"
    return f"""
    WITH planted AS (
      SELECT doc_id, {lang_case} AS true_lang, {text_case} AS text
      FROM documents
    )
    SELECT true_lang, ({pred}) AS pred_lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM planted GROUP BY true_lang, ({pred})
    """


@register("lang_id_planted", _planted_sql(DUCKDB))
def q_lang_id_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _planted_sql(SPARK))


# --- pii_scrub: detection + redaction over planted PII -----------------------
# A 100-TB training corpus must be scrubbed of emails/phones/IPs before
# the tokenizer sees it. The testdata text is clean lowercase words, so
# (as with lang_id_planted) the PII is PLANTED deterministically from
# doc_id — identical construction in both dialects, closed-form
# expected counts, so the detectors are falsifiable
# (tests/test_pii_planted.py demands per-class accuracy 1.0). Patterns
# stay in the bracket-class subset Java regex and RE2 parse AND match
# identically ([.] instead of escapes; maximal-munch classes agree
# between leftmost-first and leftmost-longest engines). Map-side only:
# one scan, no shuffle, JVM-side regex — the redacted length replays
# the substitutions so the gate hash covers the rewrite, not just the
# counts.

_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
_PII_PHONE = "[+][0-9][0-9 -]+[0-9]"
_PII_IPV4 = "[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"

_PII_PLANTS = [
    # (modulus, arm SQL by doc_id % 2 — finite literals, no casts)
    ("email", 3, " contact alice.k@examples-mail.com today",
     " write bob_1%tmp@sub.host.org soon"),
    ("phone", 5, " call +49 151 2345 678 now", " dial +1 202-555-0144 ok"),
    ("ipv4", 7, " host 192.168.4.27 up", " node 10.0.73.9 down"),
]


def _pii_sql(d) -> str:
    plant = "text"
    for _, mod, a, b in _PII_PLANTS:
        plant = (f"({plant} || CASE WHEN doc_id % {mod} = 0 THEN "
                 f"CASE WHEN doc_id % 2 = 0 THEN '{a}' ELSE '{b}' END "
                 f"ELSE '' END)")
    red = "planted"
    for pat, mask in ((_PII_EMAIL, "<EMAIL>"), (_PII_PHONE, "<PHONE>"),
                      (_PII_IPV4, "<IP>")):
        red = d.regex_replace_all(red, pat, mask)
    n = {k: d.list_len(d.regex_matches("planted", p))
         for k, p in (("email", _PII_EMAIL), ("phone", _PII_PHONE),
                      ("ipv4", _PII_IPV4))}
    return f"""
    WITH planted_docs AS (
      SELECT doc_id, {plant} AS planted FROM documents
    )
    SELECT doc_id,
           CAST({n['email']} AS BIGINT) AS n_email,
           CAST({n['phone']} AS BIGINT) AS n_phone,
           CAST({n['ipv4']} AS BIGINT) AS n_ipv4,
           CAST(length({red}) AS BIGINT) AS red_len,
           CAST(length(planted) - length({red}) AS BIGINT) AS n_cut
    FROM planted_docs
    """


@register("pii_scrub", _pii_sql(DUCKDB))
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _pii_sql(SPARK))


# --- document fingerprint (order-sensitive rolling hash) ---------------------

def _fp_sql(d) -> str:
    return f"""
    SELECT doc_id, {tx.fingerprint_reduce(d, d.split_ws("text"))} AS fingerprint
    FROM documents WHERE length(text) > 0
    """


@register("fingerprint", _fp_sql(DUCKDB))
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _fp_sql(SPARK))


# --- exact dedup (hash-groupBy on a prefix key to force collisions) ----------

_DEDUP_SQL = """
    WITH keyed AS (
      SELECT doc_id, substr(text, 1, 24) AS dkey FROM documents
    ),
    canon AS (
      SELECT dkey, min(doc_id) AS canonical_id, count(*) AS group_size
      FROM keyed GROUP BY dkey
    )
    SELECT k.doc_id, c.canonical_id, c.group_size,
           CAST(k.doc_id <> c.canonical_id AS INT) AS is_dup
    FROM keyed k JOIN canon c ON k.dkey = c.dkey
"""


@register("dedup_exact", _DEDUP_SQL)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _DEDUP_SQL)


# --- minhash signatures -------------------------------------------------------

def _minhash_sql(d) -> str:
    th = tx.token_hash_expr("tok")
    mh = tx.minhash_exprs("th")
    mins = ", ".join(f"min({m}) AS m{i}" for i, m in enumerate(mh))
    if d.name == "spark":
        tok_src = "SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents WHERE length(text) > 0"
    else:
        tok_src = "SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents WHERE length(text) > 0"
    return f"""
    WITH toks AS ({tok_src}),
    hashed AS (
      SELECT doc_id, CAST({th} AS BIGINT) AS th FROM toks WHERE length(tok) > 0
    )
    SELECT doc_id, {mins} FROM hashed GROUP BY doc_id
    """


@register("minhash_sig", _minhash_sql(DUCKDB), gate=False)  # signatures re-verified inside minhash_lsh_pairs
def q_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _minhash_sql(SPARK))


# --- simhash ------------------------------------------------------------------

def _simhash_sql(d) -> str:
    th = tx.token_hash_expr("tok")
    votes = tx.simhash_vote_exprs(d, "th")
    vote_sums = ", ".join(f"sum({v}) AS v{j}" for j, v in enumerate(votes))
    asm = tx.simhash_assemble_expr(d, [f"v{j}" for j in range(tx.SIMHASH_BITS)])
    if d.name == "spark":
        tok_src = "SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents WHERE length(text) > 0"
    else:
        tok_src = "SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents WHERE length(text) > 0"
    return f"""
    WITH toks AS ({tok_src}),
    hashed AS (SELECT doc_id, CAST({th} AS BIGINT) AS th FROM toks WHERE length(tok) > 0),
    votes AS (SELECT doc_id, {vote_sums} FROM hashed GROUP BY doc_id)
    SELECT doc_id, CAST({asm} AS BIGINT) AS simhash FROM votes
    """


@register("simhash", _simhash_sql(DUCKDB))
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _simhash_sql(SPARK))


# --- n-gram (3-token shingle) Jaccard near-dup scoring -------------------------

def _jaccard_sql(d) -> str:
    if d.name == "spark":
        shingles = (
            "transform(sequence(1, greatest(size(split(text,' ')) - 2, 0)),"
            " i -> concat_ws(' ', element_at(split(text,' '), i),"
            " element_at(split(text,' '), i+1), element_at(split(text,' '), i+2)))"
        )
        inter = "size(array_intersect(s1, s2))"
        uni = "size(array_union(s1, s2))"
    else:
        shingles = (
            "list_transform(range(1, greatest(len(string_split(text,' ')) - 1, 1)),"
            " i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]"
            " || ' ' || string_split(text,' ')[i+2])"
        )
        inter = "len(array_intersect(list_distinct(s1), list_distinct(s2)))"
        uni = "len(list_distinct(list_concat(s1, s2)))"
    return f"""
    WITH sh AS (
      SELECT doc_id, {shingles} AS s FROM documents WHERE length(text) > 0
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.s AS s1, b.s AS s2
      FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 250
      WHERE a.doc_id < 250
    )
    SELECT doc_a, doc_b,
           CAST({inter} AS BIGINT) AS n_inter,
           CAST({uni} AS BIGINT) AS n_union,
           CAST({inter} AS DOUBLE) / {uni} AS jaccard
    FROM pairs
    """


@register("ngram_jaccard", _jaccard_sql(DUCKDB), gate=False)  # fixed-offset demo join; dedup ops gated via minhash/simhash/LSH
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _jaccard_sql(SPARK))


# --- benchmark decontamination: eval-set n-gram hit flags ----------------------
#
# The training-pipeline op the dedup family does NOT cover: before a
# corpus trains anything, documents sharing n-grams with an evaluation
# set must be flagged (decontamination). The eval set here is a
# deterministic held-out slice of the corpus itself (doc_id % 101 = 0
# — no external data, per the driver's input rule); production swaps
# in the real benchmark suite. Shape at 100 TB: the eval shingle set
# is metadata-sized next to the corpus, so Catalyst broadcasts it and
# the scan stays map-side; counts are int64 — the oracle is bit-exact.

_EVAL_MOD = 101
_DECONTAM_MIN_HITS = 3


def _decontam_sql(d) -> str:
    # shingles come from the SAME trigram template as repetition_score
    # (dialect discipline: one definition per op — a tokenizer change
    # cannot desynchronize the two gated queries). Spark's
    # sequence(1, 0) is DESCENDING ([1, 0]), not empty like DuckDB's
    # range — docs under 3 tokens must be filtered, not clamped.
    tg = tx.trigram_exprs(d, d.split_ws("text"), f"({d.ntokens('text')})")
    ex = "explode" if d.name == "spark" else "unnest"
    src = (
        f"SELECT doc_id, {ex}({tg}) AS s"
        f" FROM documents WHERE {d.ntokens('text')} >= 3"
    )
    return f"""
    WITH sh AS ({src}),
    eval_sh AS (
      SELECT DISTINCT s FROM sh WHERE doc_id % {_EVAL_MOD} = 0
    ),
    hits AS (
      SELECT sh.doc_id, COUNT(DISTINCT sh.s) AS n_hits
      FROM sh JOIN eval_sh ON sh.s = eval_sh.s
      WHERE sh.doc_id % {_EVAL_MOD} <> 0
      GROUP BY sh.doc_id
    )
    SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits,
           CAST(CASE WHEN n_hits >= {_DECONTAM_MIN_HITS} THEN 1 ELSE 0 END
                AS BIGINT) AS contaminated
    FROM hits
    """


@register("decontam_flags", _decontam_sql(DUCKDB))
def q_decontam_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _decontam_sql(SPARK))


# --- embedding cosine top-k (brute-force exact baseline) -----------------------

_TOPK = 5
_NQ = 5  # vec_id < 5 are the query vectors


def _topk_sql(d) -> str:
    if d.name == "spark":
        dot = (
            "aggregate(zip_with(q.embedding, c.embedding,"
            " (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        nrm = (
            lambda e: f"sqrt(aggregate({e}, CAST(0.0 AS DOUBLE),"
            f" (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
        )
        table = "embeddings"
    else:
        dot = (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
            " list_transform(range(1, len(q.embedding) + 1),"
            " i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))),"
            " (acc, v) -> acc + v)"
        )
        nrm = (
            lambda e: f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
            f" list_transform({e}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))),"
            f" (acc, v) -> acc + v))"
        )
        table = "embeddings"
    cos = f"({dot} / ({nrm('q.embedding')} * {nrm('c.embedding')}))"
    return f"""
    SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rnk, round(cosine, 6) AS cosine FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             {cos} AS cosine,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY {cos} DESC, c.vec_id) AS rnk
      FROM {table} q CROSS JOIN {table} c
      WHERE q.vec_id < {_NQ} AND c.vec_id <> q.vec_id
    ) t WHERE rnk <= {_TOPK}
    """


@register("embed_topk", _topk_sql(DUCKDB))
def q_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    return spark.sql(_topk_sql(SPARK))


# --- repetition score (Gopher-style duplicate-trigram fraction) --------------
# Rae et al. 2021 ("Scaling Language Models: ... Gopher") filter docs whose
# duplicate n-gram fraction is high; this is the trigram variant over the
# whitespace tokenizer. Map-side only: tokens never leave their row, the
# output is 3 small columns per doc — at 100 TB this is a pure scan+project.
# rep_frac is ONE int64/int64 divide -> bit-exact in both engines.

def _repetition_sql(d) -> str:
    tg = tx.trigram_exprs(d, "tk", "n")
    return f"""
    WITH toks AS (
      SELECT doc_id, {d.split_ws("text")} AS tk,
             CAST({d.ntokens("text")} AS BIGINT) AS n
      FROM documents WHERE length(text) > 0
    ), tri AS (
      SELECT doc_id, n - 2 AS n_tri,
             CAST({tx.distinct_len(d, tg)} AS BIGINT) AS n_uniq_tri
      FROM toks WHERE n >= 3
    )
    SELECT doc_id, n_tri, n_uniq_tri,
           (n_tri - n_uniq_tri) / n_tri AS rep_frac
    FROM tri
    """


@register("repetition_score", _repetition_sql(DUCKDB))
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _repetition_sql(SPARK))


# --- stratified sample (deterministic hash, two-phase salted top-k) ----------
# Training-mix curation: a fixed-size uniform sample per lang stratum, chosen
# by an arithmetic hash (no rand() — reproducible across engines and runs).
# The top-k is TWO-PHASE: phase 1 ranks within (stratum, doc_id%16 salt) and
# keeps k per salt, phase 2 ranks the <=16k survivors per stratum. The salt
# never changes the result (phase-1 top-k per salt is a superset of the
# global top-k) but bounds every sort partition: at 10^12 docs a single
# stratum never funnels through one task. Affine-mod chain stays < 2^63:
# (doc_id % P) * 131071 < 2^53, h1 * 8191 < 2^49 (P prime ~2^36).

_SAMPLE_P = 68_718_952_447
_SAMPLE_K = 40


_SAMPLE_SALT = 16  # phase-1 fan-out: the SCALE knob, not a semantics knob.
# Each phase-1 sort task handles ~n/(strata*salt) rows and phase 2 sees
# salt*k rows per stratum, so at 10^12 docs you raise the salt (e.g. 4096
# -> ~50M-row sort tasks, 160k-row phase-2 strata) and the result is
# PROVABLY unchanged: per-salt top-k is a superset of the global top-k
# (tests/test_text_curation.py pins 16 vs 256 equality).


def _sample_sql(salt: int = _SAMPLE_SALT) -> str:
    p, k = _SAMPLE_P, _SAMPLE_K
    return f"""
    WITH h AS (
      SELECT doc_id, lang, source,
             (((doc_id % {p}) * 131071 + 12345) % {p} * 8191 + 777) % {p} AS h
      FROM documents
    ), local AS (
      SELECT doc_id, lang, source, h,
             row_number() OVER (PARTITION BY lang, doc_id % {salt}
                                ORDER BY h, doc_id) AS lrn
      FROM h
    ), ranked AS (
      SELECT doc_id, lang, source, h,
             row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
      FROM local WHERE lrn <= {k}
    )
    SELECT doc_id, lang, source, h, CAST(rn AS BIGINT) AS samp_rank
    FROM ranked WHERE rn <= {k}
    """


@register("sample_stratified", _sample_sql())
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _sample_sql())
