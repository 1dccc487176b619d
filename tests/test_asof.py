"""As-of join semantics: the engine's window-merge template must agree
with DuckDB's NATIVE ASOF JOIN — an independent implementation of the
latest-quote-per-trade semantics, not the shared dialect template."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.01"


def test_window_merge_equals_native_asof(spark):
    from gpiv_spark.queries_misc import q_asof_join

    got = (
        q_asof_join(spark, SF)
        .toPandas().sort_values(["user_id", "trade_id"]).reset_index(drop=True)
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    # dedup quotes to one per (user, ts) — native ASOF picks an
    # arbitrary row among equal-ts matches, the template picks the
    # max event_id; align them explicitly
    want = con.execute(
        """
        WITH quotes AS (
          SELECT user_id, ts, max(event_id) AS quote_id,
                 arg_max(value, event_id) AS quote_value
          FROM events WHERE event_id % 2 = 0 GROUP BY user_id, ts
        ),
        trades AS (
          SELECT user_id, event_id AS trade_id, ts
          FROM events WHERE event_id % 2 = 1
        )
        SELECT t.user_id, t.trade_id, q.quote_id, q.quote_value
        FROM trades t ASOF LEFT JOIN quotes q
          ON t.user_id = q.user_id AND t.ts >= q.ts
        ORDER BY t.user_id, t.trade_id
        """
    ).df().reset_index(drop=True)

    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # sanity: some trades precede any quote (NULL arm exercised)
    assert got["quote_id"].isna().any()
    assert got["quote_id"].notna().mean() > 0.9
