"""North-rule per-row invariant: span-sequence equality.

The documents' ``spans`` array (kind, text, media_ref, offset, and
ORDER) must pass through the engine byte- and order-identical
(BASELINE.json input_hint). The pipeline here is the milestone-1
slice: geocode -> cell encode -> broadcast PIP join -> tile assign.
"""

import pyspark.sql.functions as F

from gpiv_spark import fixtures
from gpiv_spark.dialect import SPARK as SD
from gpiv_spark.functions import cells, geocode
from gpiv_spark.operators import pip as pip_op
from gpiv_spark.operators import tiling


def _pipeline(spark, docs):
    d = SD
    nid = "CAST(substr(doc_id, 5) AS BIGINT)"
    x = geocode.x_expr(d, nid)
    y = geocode.y_expr(d, nid)
    geo = docs.select(
        "doc_id",
        "spans",
        F.expr(x).alias("x"),
        F.expr(y).alias("y"),
        F.expr(cells.zcell_expr(d, x, y, 6)).alias("cell_id"),
        F.expr(geocode.px_row_expr(d, y)).alias("px_row"),
        F.expr(geocode.px_col_expr(d, x)).alias("px_col"),
    )
    geo = tiling.assign_tiles(geo, tiling.PivConfig())
    roi = spark.createDataFrame(
        pip_op.roi_triangles(),
        "roi_id int, x1 double, y1 double, x2 double, y2 double, x3 double, y3 double",
    ).alias("r")
    pred = pip_op.inside_triangle_pred(
        "g.x", "g.y", {k: f"r.{k}" for k in ("x1", "y1", "x2", "y2", "x3", "y3")}
    )
    return geo.alias("g").join(F.broadcast(roi), F.expr(pred), "left").select(
        "g.doc_id", "g.spans", "g.cell_id", "g.tile_r", "g.tile_c", "r.roi_id"
    )


def test_span_sequence_equality(spark):
    docs = fixtures.spans_documents(spark, n_docs=400)
    before = {r["doc_id"]: r["spans"] for r in docs.collect()}
    out = _pipeline(spark, docs).collect()
    assert len(out) == 400  # left join: no doc lost, none duplicated
    for row in out:
        inp = before[row["doc_id"]]
        got = row["spans"]
        assert len(got) == len(inp)
        for a, b in zip(got, inp):  # order AND content identical
            assert (a["kind"], a["text"], a["media_ref"], a["offset"]) == (
                b["kind"], b["text"], b["media_ref"], b["offset"]
            )


def test_offsets_strictly_increasing(spark):
    docs = fixtures.spans_documents(spark, n_docs=100)
    bad = docs.select(
        F.exists(
            F.expr(
                "zip_with(slice(spans, 1, size(spans) - 1), "
                "slice(spans, 2, size(spans) - 1), "
                "(a, b) -> b.offset <= a.offset)"
            ),
            lambda v: v,
        ).alias("bad")
    ).filter("bad").count()
    assert bad == 0
