"""Text-analysis + dedup expression templates (training-data ops).

Large-scale training-pipeline operators over the documents table:
token counting, quality scoring, language-ID heuristic, document
fingerprinting, minhash/simhash signatures. All pure column
arithmetic / built-in string functions — JVM-side in Spark, identical
semantics in the DuckDB oracle.

The per-token hash is a documented pure function (length + first/last
char codes) chosen to be expressible in BOTH dialects without
per-character loops; it feeds minhash (k independent affine rehashes
mod a Mersenne prime — the standard MinHash construction) and simhash
(bitwise votes). At 100 TB these all stay single-pass map-side ops:
explode -> partial agg; no row ever leaves the JVM.
"""

from __future__ import annotations

from gpiv_spark.dialect import Dialect

MERSENNE = 2_147_483_647  # 2^31 - 1

# Affine rehash constants (a_i, b_i) for minhash signatures.
MINHASH_AB = [
    (1_000_000_007, 12_345),
    (998_244_353, 67_891),
    (754_974_721, 13_579),
    (167_772_161, 24_680),
    (469_762_049, 11_111),
    (998_244_853, 22_222),
    (1_004_535_809, 33_333),
    (985_661_441, 44_444),
]

SIMHASH_BITS = 16

# Marker substrings per language for the n-gram language-ID heuristic.
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " los ", " de "],
    "fr": [" le ", " les ", " des "],
    "zh": [" zh", "zh "],
}


def token_hash_expr(tok: str) -> str:
    """Per-token hash: 31*len + 7*first-char + last-char (dialect-free)."""
    return (
        f"(length({tok}) * 31 + ascii(substr({tok}, 1, 1)) * 7"
        f" + ascii(substr({tok}, length({tok}), 1)))"
    )


def minhash_exprs(th: str, k: int = len(MINHASH_AB)) -> list[str]:
    """k affine rehashes of a token hash; min-aggregate per doc outside."""
    return [f"(({a} % {MERSENNE}) * {th} + {b}) % {MERSENNE}" for a, b in MINHASH_AB[:k]]


def simhash_vote_exprs(d: Dialect, th: str) -> list[str]:
    """Per-token +-1 vote for each of SIMHASH_BITS bits of the token hash."""
    return [
        f"({d.band(d.shr(th, j), '1')} * 2 - 1)" for j in range(SIMHASH_BITS)
    ]


def simhash_assemble_expr(d: Dialect, vote_cols: list[str]) -> str:
    """Combine per-bit vote sums into the simhash integer."""
    terms = [
        f"(CASE WHEN {c} > 0 THEN {1 << j} ELSE 0 END)"
        for j, c in enumerate(vote_cols)
    ]
    return "(" + " + ".join(terms) + ")"


def marker_count_expr(text: str, marker: str) -> str:
    """Occurrence count of a literal substring via length arithmetic."""
    m = marker.replace("'", "''")
    return (
        f"((length({text}) - length(replace({text}, '{m}', ''))) / {len(marker)})"
    )


def lang_score_exprs(text: str) -> dict[str, str]:
    return {
        lang: "(" + " + ".join(marker_count_expr(text, m) for m in ms) + ")"
        for lang, ms in LANG_MARKERS.items()
    }


def fingerprint_reduce(d: Dialect, tokens: str) -> str:
    """Order-sensitive polynomial rolling hash over the token list.

    foldl(h -> (h*131 + token_hash) % 2^43-ish prime); int64-exact in
    both engines (h < 8.8e12, *131 + 5e3 < 1.2e15 < 2^63).
    """
    p = 8_796_093_022_151  # prime < 2^43
    th = token_hash_expr("t")
    if d.name == "spark":
        return (
            f"aggregate({tokens}, CAST(7 AS BIGINT),"
            f" (h, t) -> (h * 131 + {th}) % {p})"
        )
    return (
        f"list_reduce(list_prepend(CAST(7 AS BIGINT),"
        f" list_transform({tokens}, t -> CAST({th} AS BIGINT))),"
        f" (h, t) -> (h * 131 + t) % {p})"
    )


def trigram_exprs(d: Dialect, tokens: str, n: str) -> str:
    """Per-position token TRIGRAM STRINGS (order-sensitive, exact).

    The actual 3-token string joined by a space — no hashing, so
    distinct-counting is collision-free (the cheap token_hash used for
    minhash collides badly on structured vocabularies). Position range
    is 1..n-2 (1-based); identical in both engines.
    """
    if d.name == "spark":
        # sequence() over BIGINT bounds yields BIGINT lambda vars;
        # element_at requires INT. The n < 3 case is guarded IN the
        # template: Spark's sequence(1, 0) is DESCENDING ([1, 0]) and
        # element_at(_, 0) throws, while DuckDB's range(1, n-1) is
        # empty — without the CASE the two dialects would disagree on
        # short docs and the divergence would hide in each caller's
        # WHERE filter.
        el = lambda idx: f"element_at({tokens}, CAST({idx} AS INT))"
        body = f"concat_ws(' ', {el('i')}, {el('i + 1')}, {el('i + 2')})"
        return (f"CASE WHEN {n} >= 3 THEN "
                f"transform(sequence(1, {n} - 2), i -> {body}) "
                f"ELSE CAST(array() AS array<string>) END")
    el = lambda idx: f"list_extract({tokens}, {idx})"
    body = f"concat_ws(' ', {el('i')}, {el('i + 1')}, {el('i + 2')})"
    # duckdb range(a, b) is end-exclusive: [1, n-2] (empty for n < 3)
    return f"list_transform(range(1, ({n} - 2) + 1), i -> {body})"


def distinct_len(d: Dialect, lst: str) -> str:
    if d.name == "spark":
        return f"size(array_distinct({lst}))"
    return f"length(list_distinct({lst}))"
