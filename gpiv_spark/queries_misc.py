"""Batch-4 queries: raster assembly, display aggs, LSH dedup pairs,
k-ring kNN, sessionization, ANN bucketing, multimodal stub.

Registered into gpiv_spark.queries.REGISTRY (driver correctness gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gpiv_spark.dialect import DUCKDB, SPARK
from gpiv_spark.functions import geocode
from gpiv_spark.functions import text as tx
from gpiv_spark.queries import register, _run_both
from gpiv_spark.sources.raster import hash_value_expr

# --- raster_flip (P8): north-up flip + sqrt(variance)->std ------------------
# Mirrors run_test_v1.py:120-121,129-130: reshape + np.flipud + np.sqrt.
# Raster derived from the hash field so both engines synthesize it.

_RD = 32  # 32x32 derived raster


def _flip_sql(d) -> str:
    v = hash_value_expr(d, "r.i", "c.i")
    return f"""
    SELECT ({_RD - 1} - r.i) AS row, c.i AS col,
           sqrt({v} + 1.0) AS std_value
    FROM {d.range_sql(_RD, "r")} CROSS JOIN {d.range_sql(_RD, "c")}
    """


# r5 rotation: long-stable index projection, pinned by the geotiff
# golden tests — retired so round-4 work gets driver rows
@register("raster_flip", _flip_sql(DUCKDB), gate=False)
def q_raster_flip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(_flip_sql(SPARK))


# --- display_norm (A7): percentile clip + median (show_functions.py:45-46,70)

_PCT_SQL_SPARK = """
    SELECT l_returnflag,
           round(percentile(l_extendedprice, 0.01), 6) AS p01,
           round(percentile(l_extendedprice, 0.99), 6) AS p99,
           round(percentile(l_extendedprice, 0.5), 6) AS med
    FROM lineitem GROUP BY l_returnflag
"""
_PCT_SQL_DUCK = """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.01), 6) AS p01,
           round(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS med
    FROM lineitem GROUP BY l_returnflag
"""


# r5 rotation: bare percentile agg, math re-verified every round in
# the retired tier — swapped out for manifest_mor
@register("display_norm", _PCT_SQL_DUCK, gate=False)
def q_display_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )
    return spark.sql(_PCT_SQL_SPARK)


# --- minhash_lsh_pairs: banded LSH candidate generation ---------------------
# 8 minhashes -> 4 bands of 2; candidate pair = any band collides.
# Spark runs the SCALABLE plan (explode bands -> equi-join -> dedup);
# DuckDB oracle uses the equivalent quadratic formulation (fine at sf).


def _sig_cte(d) -> str:
    th = tx.token_hash_expr("tok")
    mh = tx.minhash_exprs("th")
    mins = ", ".join(f"min({m}) AS m{i}" for i, m in enumerate(mh))
    if d.name == "spark":
        tok_src = ("SELECT doc_id, explode(split(text, ' ')) AS tok "
                   "FROM documents WHERE length(text) > 0")
    else:
        tok_src = ("SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
                   "FROM documents WHERE length(text) > 0")
    return f"""
    toks AS ({tok_src}),
    hashed AS (SELECT doc_id, CAST({th} AS BIGINT) AS th FROM toks
               WHERE length(tok) > 0),
    sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id)
    """


_BANDS = [(0, 1), (2, 3), (4, 5), (6, 7)]

_LSH_DUCK = f"""
    WITH {_sig_cte(DUCKDB)}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({' + '.join(f"CAST(a.m{i} = b.m{i} AS INT)" for i in range(8))}
                AS DOUBLE) / 8 AS sig_sim
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
     AND ({' OR '.join(f"(a.m{i} = b.m{i} AND a.m{j} = b.m{j})" for i, j in _BANDS)})
"""


@register("minhash_lsh_pairs", _LSH_DUCK)
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    bands_expr = ", ".join(
        f"struct({bi} AS band, m{i} AS h1, m{j} AS h2)"
        for bi, (i, j) in enumerate(_BANDS)
    )
    sigs = spark.sql(f"WITH {_sig_cte(SPARK)} SELECT * FROM sig")
    sigs.cache()
    banded = sigs.select(
        "doc_id", F.explode(F.expr(f"array({bands_expr})")).alias("b")
    ).select("doc_id", "b.band", "b.h1", "b.h2")
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h1") == F.col("b.h1"))
            & (F.col("a.h2") == F.col("b.h2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sim = sum(
        F.when(F.col(f"sa.m{i}") == F.col(f"sb.m{i}"), 1).otherwise(0)
        for i in range(8)
    )
    return (
        cand.join(sigs.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sigs.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a", "doc_b", (sim.cast("double") / 8).alias("sig_sim")
        )
    )


# --- knn_kring: doc-to-doc kNN bounded to the 3x3 cell neighborhood ---------
# The H3-pattern scale path: candidates only from adjacent cells.

_KRES = 5  # 32x32 cells


def _kring_sql(d) -> str:
    x = geocode.x_expr(d, "doc_id")
    y = geocode.y_expr(d, "doc_id")
    n = 1 << _KRES
    ix = f"greatest(0, least({n - 1}, {d.big(f'floor((x - {geocode.X0!r}) / {geocode.EXTENT!r} * {n})')}))"
    iy = f"greatest(0, least({n - 1}, {d.big(f'floor((y - {geocode.Y0!r}) / {geocode.EXTENT!r} * {n})')}))"
    return f"""
    WITH geo AS (
      SELECT doc_id, x, y, {ix} AS ix, {iy} AS iy
      FROM (SELECT doc_id, {x} AS x, {y} AS y FROM documents) g0
    ),
    cand AS (
      SELECT a.doc_id, b.doc_id AS nbr,
             (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS dist_sq
      FROM geo a JOIN geo b
        ON abs(a.ix - b.ix) <= 1 AND abs(a.iy - b.iy) <= 1
       AND a.doc_id <> b.doc_id
    )
    SELECT doc_id, nbr, CAST(rnk AS BIGINT) AS rnk, dist_sq FROM (
      SELECT doc_id, nbr, dist_sq,
             row_number() OVER (PARTITION BY doc_id ORDER BY dist_sq, nbr) AS rnk
      FROM cand
    ) t WHERE rnk <= 3
    """


@register("knn_kring", _kring_sql(DUCKDB), gate=False)  # r5: cell-bounded math subsumed by the gated knn_kring_adaptive (+ completeness bound); slot freed for decontam_flags
def q_knn_kring(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _kring_sql(SPARK))


# --- pip_cells: equi+refine PIP for MANY polygons (J2 at scale) -------------
# pip_triangles uses a broadcast nested-loop join — right for 32 ROIs,
# quadratic in the polygon count. This is the Raptor equi+refine shape
# the module docstring promises for big polygon sets: polygons explode
# to their bbox's covering cells, docs equi-join on the cell, and the
# exact sign test refines. One synthetic triangle per doc_id%5 doc
# (100 at gate SF); the oracle is the brute-force quadratic join, so
# the gate proves the bucketed plan loses no pairs.

_PIPC_RES = 5  # 32x32 cells, ~15 m


def _pipc_polys(d) -> str:
    px = geocode.x_expr(d, "doc_id")
    py = geocode.y_expr(d, "doc_id")
    r = "(5.0 + CAST(doc_id % 7 AS DOUBLE))"
    m = "CAST(doc_id % 3 AS DOUBLE)"
    return f"""
      SELECT doc_id AS poly_id,
             ({px} - {r}) AS x1, ({py} - {r}) AS y1,
             ({px} + {r} + {m}) AS x2, ({py} - {r} + 1.0) AS y2,
             {px} AS x3, ({py} + {r} + 2.0) AS y3
      FROM documents WHERE doc_id % 5 = 0"""


def _pipc_refine() -> str:
    from gpiv_spark.operators import pip as pip_op

    return pip_op.inside_triangle_pred(
        "d.x", "d.y",
        {k: f"p.{k}" for k in ("x1", "y1", "x2", "y2", "x3", "y3")},
    )


def _pipc_oracle(d) -> str:
    x = geocode.x_expr(d, "doc_id")
    y = geocode.y_expr(d, "doc_id")
    return f"""
    WITH polys AS ({_pipc_polys(d)}),
    docs AS (SELECT doc_id, {x} AS x, {y} AS y FROM documents)
    SELECT d.doc_id, p.poly_id
    FROM docs d JOIN polys p ON {_pipc_refine()}
    """


def _pipc_spark_sql() -> str:
    d = SPARK
    n = 1 << _PIPC_RES
    cs = geocode.EXTENT / n

    def cix(c: str, o: float) -> str:
        return (f"greatest(0, least({n - 1}, "
                f"CAST(floor(({c} - {o!r}) / {cs!r}) AS BIGINT)))")

    x = geocode.x_expr(d, "doc_id")
    y = geocode.y_expr(d, "doc_id")
    return f"""
    WITH polys AS ({_pipc_polys(d)}),
    pcell AS (
      SELECT poly_id, x1, y1, x2, y2, x3, y3, iy * {n} + ix AS icell
      FROM polys
      LATERAL VIEW explode(sequence({cix('least(y1, y2, y3)', geocode.Y0)},
                                    {cix('greatest(y1, y2, y3)', geocode.Y0)})) t1 AS iy
      LATERAL VIEW explode(sequence({cix('least(x1, x2, x3)', geocode.X0)},
                                    {cix('greatest(x1, x2, x3)', geocode.X0)})) t2 AS ix
    ),
    docs AS (
      SELECT doc_id, x, y, {cix('y', geocode.Y0)} * {n} + {cix('x', geocode.X0)} AS icell
      FROM (SELECT doc_id, {x} AS x, {y} AS y FROM documents) g
    )
    SELECT d.doc_id, p.poly_id
    FROM docs d JOIN pcell p ON d.icell = p.icell AND {_pipc_refine()}
    """


# gate=False (round 5): PIP twin — the containment math stays
# gate-verified every round by pip_triangles and the TIN kernels;
# rotated out to gate pii_scrub (rotation policy, CLAUDE.md). Still
# verified by tools/check_oracles.py + tests/test_retired_oracles.py.
@register("pip_cells", _pipc_oracle(DUCKDB), gate=False)
def q_pip_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _pipc_spark_sql())


# --- knn_kring_adaptive: ring growth until k guaranteed neighbors -----------
# Sparse fixture (1 in 7 docs, 32x32 cells => most cells empty) where the
# fixed 1-ring is insufficient for many queries; the adaptive operator
# doubles the ring per round until every query's k-th neighbor is
# provably inside the explored shell. Oracle: exact quadratic kNN.


def _kring_adaptive_oracle(d) -> str:
    x = geocode.x_expr(d, "doc_id")
    y = geocode.y_expr(d, "doc_id")
    return f"""
    WITH geo AS (
      SELECT doc_id, {x} AS x, {y} AS y FROM documents
      WHERE doc_id % 7 = 0
    )
    SELECT doc_id, nbr, CAST(rnk AS BIGINT) AS rnk, dist_sq FROM (
      SELECT a.doc_id, b.doc_id AS nbr,
             (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS dist_sq,
             row_number() OVER (
               PARTITION BY a.doc_id
               ORDER BY (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y), b.doc_id
             ) AS rnk
      FROM geo a JOIN geo b ON a.doc_id <> b.doc_id
    ) t WHERE rnk <= 3
    """


@register("knn_kring_adaptive", _kring_adaptive_oracle(DUCKDB))
def q_knn_kring_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gpiv_spark.operators import knn as knn_op

    d = SPARK
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pts = docs.filter("doc_id % 7 = 0").select(
        "doc_id",
        F.expr(geocode.x_expr(d, "doc_id")).alias("x"),
        F.expr(geocode.y_expr(d, "doc_id")).alias("y"),
    )
    return knn_op.knn_kring_adaptive(pts, k=3, res=_KRES, id_col="doc_id")


# --- sessionize: gap-based sessionization over the events stream table ------
# (SURVEY §2.8 windows; lag + conditional cumsum, the batch sessionizer.)

_SESS_SQL = """
    WITH marked AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR CAST(ts AS TIMESTAMP) > CAST(lag(ts) OVER w AS TIMESTAMP)
                          + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events, round(sum(value), 6) AS total_value
    FROM sess GROUP BY user_id, session_id
"""


@register("sessionize", _SESS_SQL)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(_SESS_SQL)


# --- stream_sessions: Structured Streaming in the driver gate ---------------
# The custom STATEFUL operator (applyInPandasWithState sessionizer,
# streaming/stateful.py) driven over a bounded two-micro-batch input:
# batch 1 = the real events, batch 2 = one far-future flush event per
# user that closes every open session via the gap rule. Per-user
# session summaries of the CLOSED sessions must hash-match the batch
# window-function sessionizer — the oracle is the same _SESS_SQL math
# aggregated per user in DuckDB.

_STREAM_SESS_ORACLE = f"""
    WITH base AS ({_SESS_SQL.replace("FROM events", "FROM (SELECT * FROM events WHERE user_id < 40) events")})
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           round(sum(total_value), 6) AS total_value
    FROM base GROUP BY user_id
"""


@register("stream_sessions", _STREAM_SESS_ORACLE)
def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    from pathlib import Path

    import pandas as pd

    from gpiv_spark.streaming.stateful import stream_sessionize

    schema = "user_id long, event_id long, ts timestamp, value double"
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_id",
                F.col("ts").cast("timestamp").alias("ts"), "value")
        .filter("user_id < 40")
    )
    epdf = events.toPandas()
    work = Path(tempfile.mkdtemp(prefix="gate_stream_"))
    try:
        indir = work / "in"
        indir.mkdir()
        events.repartition(4).write.mode("overwrite").parquet(str(indir))
        stream = spark.readStream.schema(schema).parquet(str(indir))
        q = (
            stream_sessionize(stream, gap="30 minutes")
            .writeStream.outputMode("append").format("memory")
            .queryName("gate_sessions")
            .option("checkpointLocation", str(work / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        flush = epdf.groupby("user_id", as_index=False).agg(ts=("ts", "max"))
        flush["ts"] = pd.to_datetime(flush["ts"]) + pd.Timedelta(days=365)
        flush["event_id"] = -1
        flush["value"] = 0.0
        spark.createDataFrame(
            flush[["user_id", "event_id", "ts", "value"]], schema
        ).write.mode("append").parquet(str(indir))
        q.processAllAvailable()
        q.stop()
        flush_ms = int(pd.to_datetime(flush["ts"]).min().value // 1_000_000)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return (
        spark.table("gate_sessions")
        .filter(F.col("start_ms") < flush_ms)  # drop flush-opened sessions
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("total_value"), 6).alias("total_value"),
        )
    )


# --- ann_lsh_buckets: random-hyperplane LSH over embeddings -----------------
# Deterministic pseudo-hyperplanes h_j[i] = ((j*311 + i*127) % 1009)/1009 - 0.5;
# bucket = sign bits of 6 dot products. The scale path for ANN: candidates
# only within a bucket.

_NH = 6


def _hyper(d, j: int) -> str:
    # dot(embedding, h_j) rendered per dialect
    comp = f"(CAST(((({j} * 311) + (i - 1) * 127) % 1009) AS DOUBLE) / 1009.0 - 0.5)"
    if d.name == "spark":
        return (
            "aggregate(zip_with(embedding, "
            f"transform(sequence(1, size(embedding)), i -> {comp}), "
            "(a, b) -> CAST(a AS DOUBLE) * b), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    return (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(range(1, len(embedding) + 1), "
        f"i -> CAST(embedding[i] AS DOUBLE) * {comp})), (acc, v) -> acc + v)"
    )


def _ann_sql(d) -> str:
    bucket = " + ".join(
        f"(CASE WHEN {_hyper(d, j)} > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(_NH)
    )
    return f"""
    SELECT CAST(({bucket}) AS BIGINT) AS bucket,
           count(*) AS n_vecs,
           CAST(min(vec_id) AS BIGINT) AS min_vec,
           CAST(max(vec_id) AS BIGINT) AS max_vec
    FROM embeddings GROUP BY 1
    """


@register("ann_lsh_buckets", _ann_sql(DUCKDB))
def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    return spark.sql(_ann_sql(SPARK))


# --- media_features: multimodal stub pipeline --------------------------------
# Spans-shaped docs -> explode media spans -> attach container bytes
# (deterministic fixture standing in for the Iceberg binary column) ->
# mapInPandas REAL decode: RIFF/PCM WAV and 24-bit BMP parsed from
# actual bytes in pure NumPy (sources/media.py — no codec library
# needed for these formats). The fixture SIGNAL is a pure integer
# function of the media id, so the oracle replays every decoded
# feature — container byte counts included — in closed-form SQL; a
# header-parsing bug on either side breaks the hash.

# Shared fixture-replay CTE: the media spans of fixtures.spans_documents
# as (i=doc index, j=span index, kind, mnum) — the oracle-side stand-in
# for "documents -> explode media spans".
_MEDIA_CTE = """
    WITH nn AS (
      SELECT least(greatest(200, count(*) // 2), 1000) AS n FROM documents
    ),
    d AS (SELECT CAST(r.range AS BIGINT) AS i
          FROM range(1000) r
          WHERE CAST(r.range AS BIGINT) < (SELECT n FROM nn)),
    s AS (SELECT d.i, CAST(j.range AS BIGINT) AS j
          FROM d CROSS JOIN range(8) j
          WHERE CAST(j.range AS BIGINT) < 1 + (d.i * 7919) % 8),
    m AS (SELECT i, j,
                 CASE WHEN (i + j * 13) % 3 = 1 THEN 'image'
                      ELSE 'audio' END AS kind,
                 (i * 131 + j) % 9973 AS mnum
          FROM s WHERE (i + j * 13) % 3 <> 0),
    a AS (SELECT i, j, mnum, 800 + mnum % 1600 AS n
          FROM m WHERE kind = 'audio'),
    im AS (SELECT i, j, mnum, 8 + mnum % 24 AS w, 8 + (mnum // 7) % 24 AS h
           FROM m WHERE kind = 'image')
"""

_MEDIA_ORACLE = _MEDIA_CTE + """,
    audio_feat AS (
      SELECT a.i, a.j, 44 + 2 * a.n AS n_bytes,
             sqrt(CAST(sum(
               ((a.mnum * 31 + CAST(t.range AS BIGINT) * 17) % 2001 - 1000)
               * ((a.mnum * 31 + CAST(t.range AS BIGINT) * 17) % 2001 - 1000)
             ) AS DOUBLE) / a.n) AS feat
      FROM a JOIN range(2400) t ON CAST(t.range AS BIGINT) < a.n
      GROUP BY a.i, a.j, a.n
    ),
    image_feat AS (
      SELECT im.i, im.j,
             54 + im.h * ((3 * im.w + 3) // 4 * 4) AS n_bytes,
             CAST(sum((im.mnum + CAST(r.range AS BIGINT) * 7
                       + CAST(c.range AS BIGINT) * 3) % 256) AS DOUBLE)
               / (im.w * im.h) AS feat
      FROM im
      JOIN range(32) r ON CAST(r.range AS BIGINT) < im.h
      JOIN range(32) c ON CAST(c.range AS BIGINT) < im.w
      GROUP BY im.i, im.j, im.w, im.h
    )
    SELECT kind, CAST(count(*) AS BIGINT) AS n_media,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           round(avg(feat), 6) AS avg_feat
    FROM (
      SELECT 'audio' AS kind, n_bytes, feat FROM audio_feat
      UNION ALL
      SELECT 'image' AS kind, n_bytes, feat FROM image_feat
    ) u GROUP BY kind
"""


def _media_n_docs(spark: SparkSession, sf_dir: str) -> int:
    """The one sizing formula every media query AND _MEDIA_CTE's nn CTE
    share: least(greatest(200, count // 2), 1000)."""
    cnt = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    return min(max(200, cnt // 2), 1000)


def _blob_fetcher(fixed_kind: str | None = None):
    """mapInPandas kernel factory: synthesize the container bytes for
    each media_ref (deterministic fixture, sources/media.py — the
    Iceberg-binary-column stand-in; a real deployment selects the blob
    column off the table here). ``fixed_kind`` skips the per-row kind
    column for single-kind streams."""
    import numpy as np
    import pandas as pd

    from gpiv_spark.sources import media as md

    def fetch(batches):
        for pdf in batches:
            mnum = (
                pdf["media_ref"].astype(str)
                .str.extract(r"/(\d+)\.bin$")[0]
                .fillna("0").astype(np.int64)
            )
            kinds = ([fixed_kind] * len(pdf) if fixed_kind
                     else list(pdf["kind"]))
            cols = {"doc_id": pdf["doc_id"]}
            if fixed_kind is None:
                cols["kind"] = pdf["kind"]
            cols["media_ref"] = pdf["media_ref"]
            cols["blob"] = [md.synth_media_blob(k, int(m))
                            for k, m in zip(kinds, mnum)]
            yield pd.DataFrame(cols)

    return fetch


def _media_blob_df(spark: SparkSession, sf_dir: str,
                   kind: str | None = None) -> DataFrame:
    """documents -> exploded media spans -> REAL container bytes."""
    from gpiv_spark import fixtures

    docs = fixtures.spans_documents(spark,
                                    n_docs=_media_n_docs(spark, sf_dir))
    media = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") != "text")
        .select("doc_id", "s.kind", "s.media_ref")
    )
    if kind is not None:
        media = media.filter(F.col("kind") == kind)
    return media.mapInPandas(
        _blob_fetcher(),
        "doc_id string, kind string, media_ref string, blob binary",
    )


@register("media_features", _MEDIA_ORACLE)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gpiv_spark.sources import media as md

    blobs = _media_blob_df(spark, sf_dir)
    feats = blobs.drop("media_ref").mapInPandas(
        md.decode_features_batches,
        "doc_id string, kind string, n_bytes long, feat double",
    )
    return feats.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("feat"), 6).alias("avg_feat"),
    )


# --- media_resize: bilinear thumbnail resize in exact q10 fixed point -------
# decode BMP -> channel-mean luma -> 16x16 bilinear resize (the
# thumbnail / embedding-input prep step of a multimodal training
# pipeline). align_corners=False positions are dyadics /32, so the
# whole kernel is exact int64 at x1024 scale (sources/media.py
# resize_q10) and the oracle replays every output pixel bit-for-bit
# from the fixture formula v(r,c) = (mnum + r*7 + c*3) % 256.

_RESIZE_ORACLE = _MEDIA_CTE + """,
    op AS (SELECT im.*, CAST(oi.range AS BIGINT) AS oi,
                  CAST(oj.range AS BIGINT) AS oj
           FROM im CROSS JOIN range(16) oi CROSS JOIN range(16) oj),
    g AS (SELECT i, j, mnum, w, h, oi, oj,
            least(greatest(h * (2 * oi + 1) - 16, 0), 32 * (h - 1)) AS y32,
            least(greatest(w * (2 * oj + 1) - 16, 0), 32 * (w - 1)) AS x32
          FROM op),
    bl AS (SELECT i, j, mnum, w, h, oi, oj,
             y32 // 32 AS y0, y32 % 32 AS fa,
             x32 // 32 AS x0, x32 % 32 AS fb,
             least(y32 // 32 + 1, h - 1) AS y1,
             least(x32 // 32 + 1, w - 1) AS x1
           FROM g),
    v AS (SELECT i, j, mnum, oi, oj,
            (32 - fa) * (32 - fb) * ((mnum + y0 * 7 + x0 * 3) % 256)
          + (32 - fa) * fb        * ((mnum + y0 * 7 + x1 * 3) % 256)
          + fa * (32 - fb)        * ((mnum + y1 * 7 + x0 * 3) % 256)
          + fa * fb               * ((mnum + y1 * 7 + x1 * 3) % 256) AS val
          FROM bl)
    SELECT 'doc-' || lpad(CAST(i AS VARCHAR), 8, '0') AS doc_id,
           'image://bucket/' || CAST(i % 97 AS VARCHAR) || '/'
             || CAST(mnum AS VARCHAR) || '.bin' AS media_ref,
           CAST(sum(val) AS BIGINT) AS sum_q10,
           CAST(max(CASE WHEN oi = 0 AND oj = 0 THEN val END) AS BIGINT)
             AS p00_q10,
           CAST(max(CASE WHEN oi = 8 AND oj = 8 THEN val END) AS BIGINT)
             AS p88_q10,
           CAST(max(CASE WHEN oi = 15 AND oj = 15 THEN val END) AS BIGINT)
             AS p1515_q10
    FROM v GROUP BY i, j, mnum
"""


@register("media_resize", _RESIZE_ORACLE)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilinear 16x16 thumbnail over the image spans, exact q10 ints."""
    from gpiv_spark.sources import media as md

    blobs = _media_blob_df(spark, sf_dir, kind="image")
    return blobs.mapInPandas(
        md.resize_features_batches,
        "doc_id string, media_ref string, sum_q10 long, p00_q10 long, "
        "p88_q10 long, p1515_q10 long",
    )


# --- audio_frames: PCM frame-sampling (STFT framing), exact int64 -----------
# decode WAV -> frames of 256 samples / hop 128 -> per-frame energy;
# per clip: frame count, total energy, first peak frame + its energy.
# All int64 (energy <= 256 * 1000^2), so the oracle replay of
# s_t = ((mnum*31 + t*17) % 2001) - 1000 is bit-exact.

_FRAMES_ORACLE = _MEDIA_CTE + """,
    fr AS (SELECT a.*, CAST(f.range AS BIGINT) AS frame
           FROM a JOIN range(17) f
             ON CAST(f.range AS BIGINT) < 1 + (a.n - 256) // 128),
    fe AS (SELECT i, j, mnum, frame,
             CAST(sum(
               ((mnum * 31 + (frame * 128 + CAST(t.range AS BIGINT)) * 17)
                  % 2001 - 1000)
             * ((mnum * 31 + (frame * 128 + CAST(t.range AS BIGINT)) * 17)
                  % 2001 - 1000)
             ) AS BIGINT) AS energy
           FROM fr CROSS JOIN range(256) t
           GROUP BY i, j, mnum, frame),
    pk AS (SELECT i, j, mnum,
             CAST(count(*) AS BIGINT) AS n_frames,
             CAST(sum(energy) AS BIGINT) AS total_energy,
             CAST(max(energy) AS BIGINT) AS peak_energy
           FROM fe GROUP BY i, j, mnum),
    sel AS (SELECT fe.i, fe.j, CAST(min(fe.frame) AS BIGINT) AS peak_frame
            FROM fe JOIN pk ON fe.i = pk.i AND fe.j = pk.j
                           AND fe.energy = pk.peak_energy
            GROUP BY fe.i, fe.j)
    SELECT 'doc-' || lpad(CAST(pk.i AS VARCHAR), 8, '0') AS doc_id,
           'audio://bucket/' || CAST(pk.i % 97 AS VARCHAR) || '/'
             || CAST(pk.mnum AS VARCHAR) || '.bin' AS media_ref,
           pk.n_frames, pk.total_energy, sel.peak_frame, pk.peak_energy
    FROM pk JOIN sel ON pk.i = sel.i AND pk.j = sel.j
"""


@register("audio_frames", _FRAMES_ORACLE)
def q_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STFT-style frame sampling over the audio spans, exact int64."""
    from gpiv_spark.sources import media as md

    blobs = _media_blob_df(spark, sf_dir, kind="audio")
    return blobs.mapInPandas(
        md.frame_features_batches,
        "doc_id string, media_ref string, n_frames long, "
        "total_energy long, peak_frame long, peak_energy long",
    )


# --- manifest_mor: equality-delete merge-on-read lifecycle ------------------
# The dedup endgame's table-maintenance step: append documents, commit
# the canonicalizer's losers as an EQUALITY DELETE file (no data
# rewrite), re-append some deleted keys, read back merge-on-read. The
# oracle states the expected live set in closed form; a wrong
# sequence-number rule (deletes hitting newer files, or not hitting
# older ones) breaks the hash. Gated since r5 (rotation: new work
# ships with driver rows; stable twins moved to the retired tier).

_MOR_ORACLE = """
    SELECT doc_id, n_chars
    FROM documents
    WHERE ((doc_id < 300 AND doc_id % 7 <> 0)
       OR (doc_id >= 300 AND doc_id < 400)
       OR (doc_id < 50 AND doc_id % 7 = 0))
      AND doc_id % 97 <> 5
"""


@register("manifest_mor", _MOR_ORACLE)
def q_manifest_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import shutil
    import tempfile

    from gpiv_spark.sources.manifest import (
        append_equality_deletes,
        read_snapshot,
        write_snapshot,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    table_dir = tempfile.mkdtemp(prefix="gate_mor_")
    atexit.register(shutil.rmtree, table_dir, ignore_errors=True)
    # seq 1: the first 300 docs
    write_snapshot(docs.filter("doc_id < 300"), table_dir,
                   stats_cols=["doc_id"])
    # seq 2: delete every 7th doc (no data rewrite)
    append_equality_deletes(
        docs.filter("doc_id < 300 AND doc_id % 7 = 0").select("doc_id"),
        table_dir, ["doc_id"],
    )
    # seq 3: append fresh docs AND re-insert some deleted keys — the
    # sequence rule must resurrect exactly these
    write_snapshot(
        docs.filter("(doc_id >= 300 AND doc_id < 400) "
                    "OR (doc_id < 50 AND doc_id % 7 = 0)"),
        table_dir, stats_cols=["doc_id"],
    )
    # seq 4: POSITIONAL delete of doc_id % 97 = 5 — surgical row
    # removal addressed by (_file_path, _pos) from a live scan
    from gpiv_spark.sources.manifest import append_positional_deletes

    scan = read_snapshot(spark, table_dir, with_pos=True)
    append_positional_deletes(
        scan.filter("doc_id % 97 = 5").select(
            F.col("_file_path").alias("file_path"),
            F.col("_pos").alias("pos"),
        ),
        table_dir,
    )
    return read_snapshot(spark, table_dir)


# --- video_frames: AVI frame-sampling (stride keyframes), exact int64 ------
# decode uncompressed AVI (RIFF walk + DIB frames, sources/media.py) ->
# keep every 2nd frame -> exact int64 luma sum per sampled frame. One
# clip per document (the spans fixture carries image/audio spans only;
# a real deployment reads the video binary column off the table).
# Gated since r5 (rotation: new work ships with driver rows).

_VIDEO_ORACLE = _MEDIA_CTE + """,
    vm AS (SELECT i, (i * 167) % 9973 AS mnum FROM d),
    dims AS (SELECT i, mnum, 8 + mnum % 16 AS w,
                    8 + (mnum // 5) % 16 AS h, 4 + mnum % 13 AS nf
             FROM vm),
    fr AS (SELECT dims.*, CAST(f.range AS BIGINT) AS frame_idx
           FROM dims JOIN range(17) f
             ON CAST(f.range AS BIGINT) < nf
            AND CAST(f.range AS BIGINT) % 2 = 0),
    lum AS (SELECT i, mnum, nf, w, h, frame_idx,
              CAST(sum((mnum + frame_idx * 11
                        + CAST(r.range AS BIGINT) * 7
                        + CAST(c.range AS BIGINT) * 3) % 256) AS BIGINT)
                AS luma_sum
            FROM fr
            JOIN range(24) r ON CAST(r.range AS BIGINT) < h
            JOIN range(24) c ON CAST(c.range AS BIGINT) < w
            GROUP BY i, mnum, nf, w, h, frame_idx)
    SELECT 'doc-' || lpad(CAST(i AS VARCHAR), 8, '0') AS doc_id,
           'video://bucket/' || CAST(i % 97 AS VARCHAR) || '/'
             || CAST(mnum AS VARCHAR) || '.bin' AS media_ref,
           nf AS n_frames, w AS width, h AS height, frame_idx, luma_sum
    FROM lum
"""


@register("video_frames", _VIDEO_ORACLE)
def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-2 keyframe sampling over per-doc AVI clips, exact int64."""
    from gpiv_spark.sources import media as md

    refs = spark.range(_media_n_docs(spark, sf_dir)).select(
        F.format_string("doc-%08d", F.col("id")).alias("doc_id"),
        F.format_string(
            "video://bucket/%d/%d.bin",
            F.col("id") % 97, (F.col("id") * 167) % 9973,
        ).alias("media_ref"),
    )
    blobs = refs.mapInPandas(
        _blob_fetcher("video"),
        "doc_id string, media_ref string, blob binary",
    )
    return blobs.mapInPandas(
        md.video_features_batches,
        "doc_id string, media_ref string, n_frames long, width long, "
        "height long, frame_idx long, luma_sum long",
    )


# --- ann_ivf_topk: IVF-style ANN (coarse quantize -> search in-list) --------
# 8 deterministic anchor "centroids" c_a[i] = ((a*53 + i*19) % 211)/211 - 0.5;
# every vector is assigned to its nearest anchor (the IVF list), queries
# search ONLY their own list — the scale path that avoids the full cross
# product. Exact top-k within the list; both engines share the arithmetic.

_NANCH = 8


def _adot(d, a: int) -> str:
    comp = f"(CAST((({a} * 53) + (i - 1) * 19) % 211 AS DOUBLE) / 211.0 - 0.5)"
    if d.name == "spark":
        return (
            "aggregate(zip_with(embedding, "
            f"transform(sequence(1, size(embedding)), i -> {comp}), "
            "(x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    return (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(range(1, len(embedding) + 1), "
        f"i -> CAST(embedding[i] AS DOUBLE) * {comp})), (acc, v) -> acc + v)"
    )


def _ivf_assign(d) -> str:
    """argmax dot-product anchor id as nested CASE (greatest of 8)."""
    dots = [f"({_adot(d, a)})" for a in range(_NANCH)]
    best = f"greatest({', '.join(dots)})"
    return ("CASE " + " ".join(
        f"WHEN {dots[a]} = {best} THEN {a}" for a in range(_NANCH)
    ) + " ELSE -1 END")


def _ivf_sql(d) -> str:
    if d.name == "spark":
        dot = ("aggregate(zip_with(q.embedding, c.embedding, "
               "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
               "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    else:
        dot = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
               "list_transform(range(1, len(q.embedding) + 1), "
               "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))), "
               "(acc, v) -> acc + v)")
    assign = _ivf_assign(d)
    return f"""
    WITH lists AS (
      SELECT vec_id, embedding, CAST(({assign}) AS BIGINT) AS ivf_list
      FROM embeddings
    )
    SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rnk, round(dot, 6) AS dot FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id, {dot} AS dot,
             row_number() OVER (PARTITION BY q.vec_id ORDER BY {dot} DESC, c.vec_id)
               AS rnk
      FROM lists q JOIN lists c
        ON q.ivf_list = c.ivf_list AND c.vec_id <> q.vec_id
      WHERE q.vec_id < 5
    ) t WHERE rnk <= 3
    """


@register("ann_ivf_topk", _ivf_sql(DUCKDB))
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    return spark.sql(_ivf_sql(SPARK))


# --- cosine_neardup: embedding-cosine near-duplicate pairs ------------------
# The last of the dedup family (exact / minhash / LSH / simhash / jaccard /
# EMBEDDING-COSINE): all pairs above a cosine threshold. Exact quadratic
# formulation here (fine at the gate SF); the scale path reuses
# ann_lsh_buckets to restrict candidates to a bucket.

_NEARDUP_T = 0.30


def _neardup_sql(d) -> str:
    if d.name == "spark":
        dot = ("aggregate(zip_with(a.embedding, b.embedding, "
               "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
               "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
        nrm = (lambda e: f"sqrt(aggregate({e}, CAST(0.0 AS DOUBLE), "
               f"(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")
    else:
        dot = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
               "list_transform(range(1, len(a.embedding) + 1), "
               "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), "
               "(acc, v) -> acc + v)")
        nrm = (lambda e: f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
               f"list_transform({e}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), "
               f"(acc, v) -> acc + v))")
    cos = f"({dot} / ({nrm('a.embedding')} * {nrm('b.embedding')}))"
    return f"""
    SELECT vec_a, vec_b, round(cosine, 6) AS cosine FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ) t WHERE cosine >= {_NEARDUP_T!r}
    """


@register("cosine_neardup", _neardup_sql(DUCKDB), gate=False)  # exact O(n^2) baseline; gate op is cosine_neardup_lsh
def q_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    return spark.sql(_neardup_sql(SPARK))


# --- cosine_neardup_lsh: the SCALE path for embedding near-dup --------------
# Banded hyperplane LSH (operators/embed_lsh.py: 8 bands x 16 bits,
# NumPy X @ H signatures inside mapInPandas): equi-join on (band, bits)
# -> distinct candidate pairs -> vectorized exact-cosine refine.
# Near-duplicates are PLANTED (a deterministically perturbed copy of
# each vec_id < 50, cosine ~0.999 to its source; the background tops
# out at ~0.51), so recall at the 0.9 threshold is 1 with overwhelming
# margin (per-pair miss 1-(1-(1-p^16)^8) ~ 3e-6 at per-plane agreement
# p~0.986, verified empirically at gate and bench SF) and the gate can
# demand EQUALITY with the quadratic baseline — which is hereby demoted
# to oracle-only. Background pairs collide in a band with prob ~2^-16,
# so candidates stay per-mille of the cross product; at 10^12 docs the
# plan never materializes that cross product — only same-band buckets
# join (cf. minhash_lsh_pairs). Round 2 used 6 bands x 2 bits rendered
# as interpreted HOF lambdas: the bands admitted ~80% of ALL pairs and
# the query cost 8.3 s at bench SF; this kernel form runs the same
# contract in well under a second.

_NEARDUP_LSH_T = 0.9


def _neardup_allv_cte(d) -> str:
    if d.name == "spark":
        pert = (
            "transform(sequence(1, size(embedding)), i -> "
            "CAST(element_at(embedding, i) AS DOUBLE) * "
            "(1.0 + 0.05 * (CAST((vec_id * 31 + i * 17) % 7 AS DOUBLE) - 3.0)"
            " / 3.0))"
        )
    else:
        pert = (
            "list_transform(range(1, len(embedding) + 1), i -> "
            "CAST(embedding[i] AS DOUBLE) * "
            "(1.0 + 0.05 * (CAST((vec_id * 31 + i * 17) % 7 AS DOUBLE) - 3.0)"
            " / 3.0))"
        )
    return f"""
    allv AS (
      SELECT CAST(vec_id AS BIGINT) AS vec_id, embedding FROM embeddings
      UNION ALL
      SELECT CAST(vec_id + 10000 AS BIGINT) AS vec_id, {pert} AS embedding
      FROM embeddings WHERE vec_id < 50
    )"""


def _neardup_lsh_oracle() -> str:
    d = DUCKDB
    dot = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
           "list_transform(range(1, len(a.embedding) + 1), "
           "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), "
           "(acc, v) -> acc + v)")
    nrm = (lambda e: f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
           f"list_transform({e}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), "
           f"(acc, v) -> acc + v))")
    cos = f"({dot} / ({nrm('a.embedding')} * {nrm('b.embedding')}))"
    return f"""
    WITH {_neardup_allv_cte(DUCKDB)}
    SELECT vec_a, vec_b, round(cosine, 6) AS cosine FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine
      FROM allv a JOIN allv b ON a.vec_id < b.vec_id
    ) t WHERE cosine >= {_NEARDUP_LSH_T!r}
    """


@register("cosine_neardup_lsh", _neardup_lsh_oracle())
def q_cosine_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gpiv_spark.operators.embed_lsh import cosine_refine, lsh_candidate_pairs

    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    # the planted-copy union shares its perturbation math with the oracle
    allv = spark.sql(f"WITH {_neardup_allv_cte(SPARK)} SELECT * FROM allv")
    cand = lsh_candidate_pairs(allv, n_bands=8, bits=16)
    # threshold on the RAW cosine, round only for output — exactly the
    # oracle's filter-then-round order (a pre-rounded value within
    # 5e-7 of the threshold would otherwise pass/fail differently)
    return (
        cosine_refine(cand, allv, round_to=None)
        .filter(F.col("cosine") >= _NEARDUP_LSH_T)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )


# --- span_roundtrip: the north-rule span-sequence invariant at the gate ------
# Spans-shaped docs ride through geocode -> cell -> PIP join; the output
# re-derives a structural checksum FROM the spans that came out the other
# side. The expected result is one deterministic row (every doc intact,
# span count = the fixture's generative formula), so the oracle is that
# formula in SQL: sum over doc index i of (1 + (i*7919) % 8).

_SPAN_RT_ORACLE = """
    SELECT true AS intact, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(1 + (CAST(r.range AS BIGINT) * 7919) % 8) AS BIGINT)
             AS n_spans
    FROM range(500) r
"""


@register("span_roundtrip", _SPAN_RT_ORACLE, gate=False)  # invariant subsumed by span_stats
def q_span_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gpiv_spark import fixtures
    from gpiv_spark.dialect import SPARK as d
    from gpiv_spark.functions import cells
    from gpiv_spark.operators import pip as pip_op

    docs = fixtures.spans_documents(spark, n_docs=500)
    span_sig = (
        "xxhash64(to_json(spans))"  # order- and content-sensitive signature
    )
    nid = "CAST(substr(doc_id, 5) AS BIGINT)"
    x = geocode.x_expr(d, nid)
    y = geocode.y_expr(d, nid)
    before = docs.select("doc_id", F.expr(span_sig).alias("sig_in"), "spans")
    geo = before.select(
        "doc_id", "sig_in", "spans",
        F.expr(x).alias("x"), F.expr(y).alias("y"),
        F.expr(cells.zcell_expr(d, x, y, 5)).alias("cell_id"),
    )
    roi = spark.createDataFrame(
        pip_op.roi_triangles(),
        "roi_id int, x1 double, y1 double, x2 double, y2 double, "
        "x3 double, y3 double",
    ).alias("r")
    pred = pip_op.inside_triangle_pred(
        "g.x", "g.y", {k: f"r.{k}" for k in ("x1", "y1", "x2", "y2", "x3", "y3")}
    )
    out = geo.alias("g").join(F.broadcast(roi), F.expr(pred), "left")
    # re-derive the signature from the spans THAT CAME THROUGH the join
    return (
        out.select(
            "g.doc_id", "g.sig_in",
            F.expr(span_sig).alias("sig_out"),
            F.expr("size(spans)").alias("n_spans"),
        )
        .withColumn("intact", F.col("sig_in") == F.col("sig_out"))
        .groupBy("intact")
        .agg(F.count("*").alias("n_docs"), F.sum("n_spans").alias("n_spans"))
    )


# --- tile_rollup: hierarchical aggregation (ROLLUP) over tile grid ----------
# Multi-level tile summaries (per-tile, per-tile-row, grand total) in one
# pass — the cube/rollup pattern for dashboard-style consumers.


def _rollup_sql(d) -> str:
    from gpiv_spark.functions import geocode as _gc
    from gpiv_spark.operators import tiling as _tl

    x = _gc.x_expr(d, "doc_id")
    y = _gc.y_expr(d, "doc_id")
    cfg = _tl.PivConfig()
    tr = _tl.tile_k_expr(d, "px_row", cfg)
    tc = _tl.tile_k_expr(d, "px_col", cfg)
    return f"""
    WITH geo AS (
      SELECT doc_id, {_gc.px_row_expr(d, y)} AS px_row,
             {_gc.px_col_expr(d, x)} AS px_col
      FROM documents
    ),
    t AS (
      SELECT CAST({tr} AS BIGINT) AS tile_r, CAST({tc} AS BIGINT) AS tile_c,
             doc_id
      FROM geo
    )
    SELECT coalesce(tile_r, -999) AS tile_r, coalesce(tile_c, -999) AS tile_c,
           count(*) AS n_docs,
           CAST(grouping(tile_r) AS INT) AS g_r,
           CAST(grouping(tile_c) AS INT) AS g_c
    FROM t GROUP BY ROLLUP (tile_r, tile_c)
    """


@register("tile_rollup", _rollup_sql(DUCKDB))
def q_tile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_both(spark, sf_dir, _rollup_sql(SPARK))


# --- salted_cell_stats: hot-cell skew through the salted kernel path --------
# SURVEY §7.3's skew promise, made falsifiable: 50% of docs (even ids)
# collapse onto ONE point -> one hot fine cell holding half the table.
# The two-stage salted applyInPandas kernel (operators/salting.py) must
# split that group into n_salt bounded Python calls and still merge to
# EXACT per-cell statistics; the physical plan shows the salted
# groupBy(cell, _salt) ahead of the merge groupBy(cell).

_HOT_DX, _HOT_DY = 100.25, 200.75  # extent-relative hot point


def _skew_xy(d, id_col: str) -> tuple[str, str]:
    x = geocode.x_expr(d, id_col)
    y = geocode.y_expr(d, id_col)
    xs = f"(CASE WHEN {id_col} % 2 = 0 THEN {geocode.X0 + _HOT_DX!r} ELSE {x} END)"
    ys = f"(CASE WHEN {id_col} % 2 = 0 THEN {geocode.Y0 + _HOT_DY!r} ELSE {y} END)"
    return xs, ys


def _salted_oracle(d) -> str:
    from gpiv_spark.functions import cells as _cells

    xs, ys = _skew_xy(d, "doc_id")
    cell = _cells.zcell_expr(d, xs, ys, 5)
    return f"""
    SELECT cell, count(*) AS n_docs,
           round(sum(dx), 5) AS sum_dx, round(sum(dy), 5) AS sum_dy
    FROM (
      SELECT {cell} AS cell, {xs} - {geocode.X0!r} AS dx,
             {ys} - {geocode.Y0!r} AS dy
      FROM documents
    ) t GROUP BY cell
    """


@register("salted_cell_stats", _salted_oracle(DUCKDB))
def q_salted_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gpiv_spark.functions import cells as _cells
    from gpiv_spark.operators.salting import salted_cell_stats

    d = SPARK
    xs, ys = _skew_xy(d, "doc_id")
    cell = _cells.zcell_expr(d, xs, ys, 5)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.expr(cell).alias("cell"),
        F.expr(f"{xs} - {geocode.X0!r}").alias("dx"),
        F.expr(f"{ys} - {geocode.Y0!r}").alias("dy"),
    )
    out = salted_cell_stats(docs, n_salt=16)
    return out.select(
        "cell", "n_docs",
        F.round("sum_dx", 5).alias("sum_dx"),
        F.round("sum_dy", 5).alias("sum_dy"),
    )


# --- asof_join: latest-quote-per-trade over the events stream ---------------
# The classic time-series join Spark has no built-in for: split events
# into quotes (even event_id) and trades (odd), and give every trade
# the LATEST same-user quote with quote.ts <= trade.ts. Physical shape
# is the distributed as-of merge: ONE window per user over the merged
# stream (quotes sort before trades at equal ts; latest quote wins by
# event_id) — no per-key loop, no range cross-join; at 100 TB this is
# a single shuffle on user_id with the sessionize salting caveat.
# tests/test_asof.py cross-checks the template against DuckDB's NATIVE
# ASOF JOIN — an independent implementation of the semantics.


def _asof_sql(d) -> str:
    over = ("(PARTITION BY user_id ORDER BY ts, event_id % 2, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    qid = d.last_ignore_nulls(
        "CASE WHEN event_id % 2 = 0 THEN event_id END", over)
    qval = d.last_ignore_nulls(
        "CASE WHEN event_id % 2 = 0 THEN value END", over)
    return f"""
    WITH w AS (
      SELECT user_id, event_id, ts, event_id % 2 AS tag,
             {qid} AS quote_id, {qval} AS quote_value
      FROM events
    )
    SELECT user_id, event_id AS trade_id, quote_id, quote_value
    FROM w WHERE tag = 1
    """


@register("asof_join", _asof_sql(DUCKDB))
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    return spark.sql(_asof_sql(SPARK))


# --- range_join_events: interval-containment join, bucketed at scale --------
# Spark has no native range join either: even events open an interval
# [ts, ts + (1 + event_id % 20) minutes], odd events probe it (same
# user, probe.ts inside). The engine runs the BUCKETED plan — intervals
# explode to the epoch-minute buckets they cover (bounded fan-out
# <= 21), probes carry their single bucket, equi-join on (user_id,
# minute) then exact-refine — the same equi+refine discipline as
# pip_cells; no theta join ever forms. A probe owns exactly one bucket,
# so the bucketed join yields each (interval, probe) pair at most once
# — no dedup pass. The oracle is the brute theta join on the SAME
# shared interval arithmetic (exact int64 microseconds). At 100 TB the
# shuffle carries (user, minute) keys only.

_RJ_BUCKET_US = 60_000_000  # 1-minute buckets


def _rj_ctes(d) -> str:
    e = d.epoch_us("ts")
    return f"""
    ivals AS (
      SELECT user_id, event_id AS interval_id, {e} AS s_us,
             {e} + (1 + event_id % 20) * 60000000 AS e_us
      FROM events WHERE event_id % 2 = 0
    ),
    probes AS (
      SELECT user_id, event_id AS probe_id, {e} AS p_us
      FROM events WHERE event_id % 2 = 1
    )
    """


_RJ_ORACLE = f"""
    WITH {_rj_ctes(DUCKDB)}
    SELECT i.user_id, p.probe_id, i.interval_id
    FROM ivals i JOIN probes p
      ON i.user_id = p.user_id AND p.p_us BETWEEN i.s_us AND i.e_us
"""


@register("range_join_events", _RJ_ORACLE)
def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = SPARK
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView(
        "events"
    )
    b = _RJ_BUCKET_US
    return spark.sql(f"""
    WITH {_rj_ctes(d)},
    ibuck AS (
      SELECT user_id, interval_id, s_us, e_us,
             explode(sequence(s_us div {b}, e_us div {b})) AS m
      FROM ivals
    ),
    pbuck AS (
      SELECT user_id, probe_id, p_us, (p_us div {b}) AS m FROM probes
    )
    SELECT i.user_id, p.probe_id, i.interval_id
    FROM ibuck i JOIN pbuck p
      ON i.user_id = p.user_id AND i.m = p.m
     AND p.p_us BETWEEN i.s_us AND i.e_us
    """)


# --- dedup_components: near-dup clusters from LSH pairs (CC) -----------------
# Pairs are not the dedup endgame — clusters are: every doc needs a
# canonical id = min doc id reachable through the near-dup edge set.
# The engine runs distributed min-label propagation over the SAME
# banded-LSH edges as minhash_lsh_pairs (operators/components.py,
# O(diameter) rounds, per-round localCheckpoint); the oracle computes
# the identical fixpoint with a recursive CTE — an independent
# formulation of reachability, not a replay of the engine's loop.

_CC_ORACLE = f"""
    WITH RECURSIVE {_sig_cte(DUCKDB)},
    edges AS (
      SELECT a.doc_id AS ea, b.doc_id AS eb
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       AND ({' OR '.join(f"(a.m{i} = b.m{i} AND a.m{j} = b.m{j})" for i, j in _BANDS)})
    ),
    sym AS (
      SELECT ea AS src, eb AS dst FROM edges
      UNION
      SELECT eb AS src, ea AS dst FROM edges
    ),
    walk(node, comp) AS (
      SELECT DISTINCT src, src FROM sym
      UNION
      SELECT s.src, w.comp FROM walk w JOIN sym s ON s.dst = w.node
    )
    SELECT node AS doc_id, min(comp) AS component
    FROM walk GROUP BY node
"""


@register("dedup_components", _CC_ORACLE)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gpiv_spark.operators.components import connected_components

    pairs = q_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs, a="doc_a", b="doc_b").select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )

# --- dedup_canonical: the dedup ENDGAME — keep-best per cluster --------------
# Components alone don't dedup; the pipeline must pick which document
# SURVIVES each near-dup cluster. Canonical = highest quality_score
# (queries_text._quality_sql — the SAME dialect template, so both
# engines rank by bit-identical float math), ties broken by doc_id;
# docs in no cluster are their own canonical. Engine: distributed CC
# labels + a per-component window. Oracle: the recursive-CTE
# reachability fixpoint + the same window in DuckDB. At 10^12 docs the
# window partitions by component (clusters are small by construction),
# so no skew beyond what the salted-window path already handles.

def _canon_oracle() -> str:
    from gpiv_spark.queries_text import _quality_sql

    return f"""
    WITH RECURSIVE {_sig_cte(DUCKDB)},
    edges AS (
      SELECT a.doc_id AS ea, b.doc_id AS eb
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       AND ({' OR '.join(f"(a.m{i} = b.m{i} AND a.m{j} = b.m{j})" for i, j in _BANDS)})
    ),
    sym AS (
      SELECT ea AS src, eb AS dst FROM edges
      UNION
      SELECT eb AS src, ea AS dst FROM edges
    ),
    walk(node, comp) AS (
      SELECT DISTINCT src, src FROM sym
      UNION
      SELECT s.src, w.comp FROM walk w JOIN sym s ON s.dst = w.node
    ),
    comp AS (SELECT node, min(comp) AS component FROM walk GROUP BY node),
    q AS (SELECT doc_id, quality FROM ({_quality_sql(DUCKDB)}) t),
    labeled AS (
      SELECT q.doc_id, COALESCE(c.component, q.doc_id) AS component, q.quality
      FROM q LEFT JOIN comp c ON c.node = q.doc_id
    )
    SELECT doc_id, component,
           first_value(doc_id) OVER (
             PARTITION BY component ORDER BY quality DESC, doc_id
           ) AS canonical_id,
           doc_id = first_value(doc_id) OVER (
             PARTITION BY component ORDER BY quality DESC, doc_id
           ) AS is_canonical
    FROM labeled
    """


@register("dedup_canonical", _canon_oracle())
def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gpiv_spark.operators.components import connected_components
    from gpiv_spark.queries_text import _quality_sql

    pairs = q_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, a="doc_a", b="doc_b")
    quality = spark.sql(_quality_sql(SPARK)).select("doc_id", "quality")
    labeled = (
        quality.join(comp, quality["doc_id"] == comp["node"], "left")
        .select(
            "doc_id",
            F.coalesce("comp", "doc_id").alias("component"),
            "quality",
        )
    )
    # argmax by (quality DESC, doc_id ASC) as min_by over the struct
    # (-quality, doc_id): a map-side-combinable AGGREGATE, not a window
    # — a boilerplate mega-cluster at 10^12 docs partial-aggregates on
    # every map task instead of sorting one giant window partition.
    # (The oracle keeps its first_value window: independent formulation.)
    winners = labeled.groupBy("component").agg(
        F.min_by(
            "doc_id", F.struct((-F.col("quality")).alias("nq"), "doc_id")
        ).alias("canonical_id")
    )
    return labeled.join(winners, "component").select(
        "doc_id", "component", "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
    )

# --- stream_dedup: stateful streaming exact-dedup in the driver gate ---------
# A later-arriving duplicate is PLANTED for every third document (ts
# strictly after every original); the stateful operator
# (streaming/dedup.py) must pick the ORIGINAL doc as first-seen — by
# event time, not microbatch luck — and count the duplicate. State
# closes via event-time watermark timeout (a far-future flush row
# advances the watermark); the oracle is the closed form of the plant,
# grouped by text because natural text collisions also merge.

_STREAM_DEDUP_ORACLE = """
    SELECT CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(count(*) + sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs,
           CAST(length(text) AS BIGINT) AS len_chars
    FROM documents GROUP BY text
"""


@register("stream_dedup", _STREAM_DEDUP_ORACLE)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    from pathlib import Path

    from gpiv_spark.streaming.dedup import stream_dedup_first

    schema = "doc_id long, text string, ts timestamp"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    epoch = "TIMESTAMP '2026-01-01 00:00:00'"
    originals = docs.select(
        "doc_id", "text",
        F.expr(f"{epoch} + make_interval(0, 0, 0, 0, 0, 0, doc_id)").alias("ts"),
    )
    # the +1_000_000 plant offset must not collide with real doc_ids
    # (at >=1M docs the planted ids would alias originals and corrupt
    # both the first-seen winner and the counts) — fail loudly instead
    max_id = docs.agg(F.max("doc_id")).first()[0]
    if max_id is None or max_id >= 1_000_000:
        # a raise, not assert: python -O must not strip a data-
        # corruption guard
        raise ValueError(
            f"stream_dedup plant offset collides: max doc_id {max_id}"
        )
    dups = docs.filter("doc_id % 3 = 0").select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text",
        F.expr(
            f"{epoch} + make_interval(0, 0, 0, 0, 0, 0, doc_id + 1000000)"
        ).alias("ts"),
    )
    flush = spark.sql(
        f"SELECT CAST(-1 AS BIGINT) AS doc_id, '__flush__' AS text, "
        f"{epoch} + INTERVAL 400 DAYS AS ts"
    )
    work = Path(tempfile.mkdtemp(prefix="gate_sdedup_"))
    try:
        indir = work / "in"
        originals.unionByName(dups).repartition(4).write.mode(
            "overwrite"
        ).parquet(str(indir))
        stream = spark.readStream.schema(schema).parquet(str(indir))
        q = (
            stream_dedup_first(stream, horizon="1 hour")
            .writeStream.outputMode("append").format("memory")
            .queryName("gate_stream_dedup")
            .option("checkpointLocation", str(work / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        flush.write.mode("append").parquet(str(indir))
        q.processAllAvailable()
        q.stop()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.table("gate_stream_dedup").filter("first_doc >= 0")

# --- span_stats: per-document interleaved text+media span analytics ---------
# The north-rule payload is INTERLEAVED spans (axes A+B): per doc,
# kind mix, per-kind char totals, and the structural invariant that
# every offset equals the reconstruction from the preceding spans
# (offset_j = sum_{<j} (1 + len(text) + len(media_ref))). The engine
# computes all of it from the ACTUAL span structs (posexplode + one
# running-sum window); the oracle replays the fixture's generative
# formula relationally — word lengths as a VALUES table, media-ref
# lengths by digit counting — so a broken explode order, a mangled
# offset, or a dropped span breaks the hash (cf. media_features).

def _span_stats_oracle(n_docs: int = 500) -> str:
    from gpiv_spark.fixtures import WORDS

    wl = ", ".join(f"({i}, {len(w)})" for i, w in enumerate(WORDS))
    return f"""
    WITH wl(idx, wlen) AS (VALUES {wl}),
    d AS (SELECT CAST(r.range AS BIGINT) AS i FROM range({n_docs}) r),
    s AS (SELECT d.i, CAST(j.range AS BIGINT) AS j
          FROM d CROSS JOIN range(8) j
          WHERE CAST(j.range AS BIGINT) < 1 + (d.i * 7919) % 8),
    t AS (SELECT i, j, (i * 31 + j * 17) % 16 AS k, (i + j) % 5 + 2 AS cnt
          FROM s WHERE (i + j * 13) % 3 = 0),
    tlen AS (
      SELECT t.i, t.j, CAST(sum(w.wlen) + t.cnt - 1 AS BIGINT) AS text_len
      FROM t JOIN range(6) tt ON CAST(tt.range AS BIGINT) < t.cnt
             JOIN wl w ON w.idx = (t.k + CAST(tt.range AS BIGINT)) % 16
      GROUP BY t.i, t.j, t.cnt
    ),
    m AS (
      SELECT i, j,
             20 + (CASE WHEN i % 97 < 10 THEN 1 ELSE 2 END)
                + (CASE WHEN (i * 131 + j) % 9973 < 10 THEN 1
                        WHEN (i * 131 + j) % 9973 < 100 THEN 2
                        WHEN (i * 131 + j) % 9973 < 1000 THEN 3
                        ELSE 4 END) AS media_len
      FROM s WHERE (i + j * 13) % 3 <> 0
    ),
    per AS (
      SELECT s.i, s.j,
             COALESCE(tl.text_len, 0) AS text_len,
             COALESCE(m.media_len, 0) AS media_len
      FROM s LEFT JOIN tlen tl ON tl.i = s.i AND tl.j = s.j
             LEFT JOIN m ON m.i = s.i AND m.j = s.j
    )
    SELECT printf('doc-%08d', i) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN (i + j * 13) % 3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_text,
           CAST(sum(CASE WHEN (i + j * 13) % 3 <> 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_media,
           CAST(sum(text_len) AS BIGINT) AS text_chars,
           CAST(sum(media_len) AS BIGINT) AS media_chars,
           CAST(sum(1 + text_len + media_len) AS BIGINT) AS end_offset,
           true AS offsets_valid
    FROM per GROUP BY i
    """


@register("span_stats", _span_stats_oracle())
def q_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from gpiv_spark import fixtures

    docs = fixtures.spans_documents(spark, n_docs=500)
    ex = docs.select(
        "doc_id", F.posexplode("spans").alias("pos", "s")
    ).select(
        "doc_id", "pos",
        F.col("s.kind").alias("kind"),
        F.length("s.text").alias("text_len"),
        F.length("s.media_ref").alias("media_len"),
        F.col("s.offset").alias("offset"),
    )
    w = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ex = ex.withColumn(
        "expected_off",
        F.coalesce(
            F.sum(F.lit(1) + F.col("text_len") + F.col("media_len")).over(w),
            F.lit(0),
        ),
    )
    return ex.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum((F.col("kind") == "text").cast("long")).alias("n_text"),
        F.sum((F.col("kind") != "text").cast("long")).alias("n_media"),
        F.sum("text_len").alias("text_chars"),
        F.sum("media_len").alias("media_chars"),
        F.sum(F.lit(1) + F.col("text_len") + F.col("media_len")).alias(
            "end_offset"
        ),
        F.every(F.col("offset") == F.col("expected_off")).alias(
            "offsets_valid"
        ),
    )

# --- span_chunk: budget-bounded training-window chunking --------------------
# A training pipeline over interleaved docs re-chunks them into bounded
# windows WITHOUT splitting a span (spans are atomic: a media ref or a
# text run). Policy: offset-bucketed chunking — a span belongs to chunk
# floor(start_offset / budget), so chunk assignment is one stateless
# projection (no sequential accumulator, no per-doc scan: the policy
# that actually runs at 10^12 docs). A chunk can exceed the budget by
# at most one span's length minus 1; single oversized spans get their
# own chunk. The engine computes from the ACTUAL stored span structs;
# the oracle replays the fixture's generative formula — so the stored
# offsets are cross-validated against their closed-form reconstruction
# (same discipline as span_stats).

_CHUNK_BUDGET = 48


def _span_chunk_oracle(n_docs: int = 500, budget: int = _CHUNK_BUDGET) -> str:
    from gpiv_spark.fixtures import WORDS

    wl = ", ".join(f"({i}, {len(w)})" for i, w in enumerate(WORDS))
    return f"""
    WITH wl(idx, wlen) AS (VALUES {wl}),
    d AS (SELECT CAST(r.range AS BIGINT) AS i FROM range({n_docs}) r),
    s AS (SELECT d.i, CAST(j.range AS BIGINT) AS j
          FROM d CROSS JOIN range(8) j
          WHERE CAST(j.range AS BIGINT) < 1 + (d.i * 7919) % 8),
    t AS (SELECT i, j, (i * 31 + j * 17) % 16 AS k, (i + j) % 5 + 2 AS cnt
          FROM s WHERE (i + j * 13) % 3 = 0),
    tlen AS (
      SELECT t.i, t.j, CAST(sum(w.wlen) + t.cnt - 1 AS BIGINT) AS text_len
      FROM t JOIN range(6) tt ON CAST(tt.range AS BIGINT) < t.cnt
             JOIN wl w ON w.idx = (t.k + CAST(tt.range AS BIGINT)) % 16
      GROUP BY t.i, t.j, t.cnt
    ),
    m AS (
      SELECT i, j,
             20 + (CASE WHEN i % 97 < 10 THEN 1 ELSE 2 END)
                + (CASE WHEN (i * 131 + j) % 9973 < 10 THEN 1
                        WHEN (i * 131 + j) % 9973 < 100 THEN 2
                        WHEN (i * 131 + j) % 9973 < 1000 THEN 3
                        ELSE 4 END) AS media_len
      FROM s WHERE (i + j * 13) % 3 <> 0
    ),
    per AS (
      SELECT s.i, s.j,
             (s.i + s.j * 13) % 3 = 0 AS is_text,
             1 + COALESCE(tl.text_len, 0) + COALESCE(m.media_len, 0) AS cost
      FROM s LEFT JOIN tlen tl ON tl.i = s.i AND tl.j = s.j
             LEFT JOIN m ON m.i = s.i AND m.j = s.j
    ),
    offs AS (
      SELECT i, j, is_text, cost,
             COALESCE(sum(cost) OVER (
               PARTITION BY i ORDER BY j
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS start_off
      FROM per
    )
    SELECT printf('doc-%08d', i) AS doc_id,
           CAST(start_off // {budget} AS BIGINT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN is_text THEN 1 ELSE 0 END) AS BIGINT)
               AS n_text,
           CAST(sum(CASE WHEN is_text THEN 0 ELSE 1 END) AS BIGINT)
               AS n_media,
           CAST(sum(cost) AS BIGINT) AS chunk_chars,
           CAST(min(start_off) AS BIGINT) AS start_offset
    FROM offs GROUP BY i, start_off // {budget}
    """


@register("span_chunk", _span_chunk_oracle())
def q_span_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gpiv_spark import fixtures

    docs = fixtures.spans_documents(spark, n_docs=500)
    ex = docs.select(
        "doc_id", F.posexplode("spans").alias("pos", "s")
    ).select(
        "doc_id",
        (F.col("s.kind") == "text").alias("is_text"),
        (F.lit(1) + F.length("s.text") + F.length("s.media_ref"))
        .cast("long").alias("cost"),
        F.col("s.offset").cast("long").alias("start_off"),
        # offset-bucketed chunk id straight off the stored offset —
        # one stateless projection, no window, no per-doc scan
        F.floor(F.col("s.offset") / _CHUNK_BUDGET).cast("long")
        .alias("chunk_id"),
    )
    return ex.groupBy("doc_id", "chunk_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("is_text").cast("long")).alias("n_text"),
        F.sum((~F.col("is_text")).cast("long")).alias("n_media"),
        F.sum("cost").alias("chunk_chars"),
        F.min("start_off").alias("start_offset"),
    )


# --- manifest_prune: Iceberg-style snapshot scan in the driver gate ----------
# Documents geocoded to Z-order cells land in a snapshot/manifest table
# (sources/manifest.py) range-clustered by cell, then are read back
# through driver-side manifest pruning with a cell-range predicate.
# The oracle computes the same aggregate straight from the documents
# table with the shared zcell template — if pruning ever dropped or
# duplicated a live file, the hash breaks. File-skipping behavior
# itself (files_skipped > 0, time travel, residual filters) is pinned
# by tests/test_manifest.py.

_MPRUNE_RES = 4          # 16x16 Z-order cells
_MPRUNE_RANGE = (64, 191)  # middle half of the 0..255 cell space


def _mprune_oracle() -> str:
    from gpiv_spark.functions import cells as _cells

    zc = _cells.zcell_expr(
        DUCKDB, geocode.x_expr(DUCKDB, "doc_id"),
        geocode.y_expr(DUCKDB, "doc_id"), _MPRUNE_RES,
    )
    lo, hi = _MPRUNE_RANGE
    return f"""
    SELECT cell, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM (SELECT {zc} AS cell, n_chars FROM documents) t
    WHERE cell BETWEEN {lo} AND {hi}
    GROUP BY cell
    """


@register("manifest_prune", _mprune_oracle())
def q_manifest_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from gpiv_spark.functions import cells as _cells
    from gpiv_spark.sources.manifest import read_snapshot, write_snapshot

    d = SPARK
    zc = _cells.zcell_expr(
        d, geocode.x_expr(d, "doc_id"), geocode.y_expr(d, "doc_id"),
        _MPRUNE_RES,
    )
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars", F.expr(zc).alias("cell"))
        .repartitionByRange(8, "cell")
    )
    # the table dir must outlive this function (the returned DataFrame
    # is a lazy scan over the snapshot's parquet files), so it is
    # reaped at process exit instead of leaking per invocation
    import atexit
    import shutil

    table_dir = tempfile.mkdtemp(prefix="gate_manifest_")
    atexit.register(shutil.rmtree, table_dir, ignore_errors=True)
    write_snapshot(docs, table_dir, stats_cols=["cell"])
    lo, hi = _MPRUNE_RANGE
    return (
        read_snapshot(spark, table_dir, ranges={"cell": (lo, hi)})
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )

# --- dedup_components_star: same clusters via the star algorithm -------------
# The hub-robust large-star/small-star CC must produce byte-identical
# components to label propagation — both gate rows share the
# recursive-CTE reachability oracle, so the two distributed algorithms
# are pinned against the same independent fixpoint.


@register("dedup_components_star", _CC_ORACLE)
def q_dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gpiv_spark.operators.components import connected_components_star

    pairs = q_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components_star(pairs, a="doc_a", b="doc_b").select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )

# --- stream_cell_counts: windowed streaming aggregation in the gate ----------
# The third streaming shape (after the stateful sessionizer and the
# first-seen dedup): readStream -> geocode -> Z-order cell ->
# watermark + event-time window -> grouped counts (streaming/ingest.py,
# the exact plan a continuously-growing 10^12-doc table needs for
# live per-cell stats). Event times are a pure function of doc_id and
# the 5-minute windows are epoch-aligned, so the oracle is integer
# arithmetic — window_s = EPOCH + (doc_id mod 7200 div 300)*300 —
# over the same shared zcell template.

_SCC_EPOCH = 1767225600  # 2026-01-01 UTC; divisible by the 300 s window


def _scc_oracle() -> str:
    from gpiv_spark.functions import cells as _cells

    zc = _cells.zcell_expr(
        DUCKDB, geocode.x_expr(DUCKDB, "doc_id"),
        geocode.y_expr(DUCKDB, "doc_id"), 6,
    )
    return f"""
    SELECT CAST({zc} AS BIGINT) AS cell_id,
           CAST({_SCC_EPOCH} + ((doc_id % 7200) // 300) * 300 AS BIGINT)
             AS window_s,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents GROUP BY 1, 2
    """


@register("stream_cell_counts", _scc_oracle())
def q_stream_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    from pathlib import Path

    from gpiv_spark.streaming.ingest import run_to_memory, stream_cell_counts

    schema = "doc_id long, event_time timestamp"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.expr(
            f"to_timestamp({_SCC_EPOCH} + doc_id % 7200)"
        ).alias("event_time"),
    )
    work = Path(tempfile.mkdtemp(prefix="gate_scc_"))
    try:
        indir = work / "in"
        docs.repartition(4).write.mode("overwrite").parquet(str(indir))
        agg = stream_cell_counts(spark, str(indir), schema, res=6)
        q = run_to_memory(agg, name="gate_cell_counts")
        q.stop()
        out = spark.table("gate_cell_counts").select(
            "cell_id",
            F.unix_timestamp("window.start").alias("window_s"),
            "n_docs", "max_doc",
        )
        out = spark.createDataFrame(out.toPandas())  # detach from files
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out
