"""Dual-dialect SQL expression builder.

Every SQL-expressible operator in this engine is defined ONCE as a
Python function that renders an expression string for either dialect:

- ``SPARK``  -> used via ``F.expr(...)`` so the expression runs JVM-side
  inside whole-stage codegen (no Python in the hot path);
- ``DUCKDB`` -> used verbatim in ``__spark_entry__.oracle_sql()``.

This makes engine/oracle parity *structural*: the same template cannot
disagree with itself. Only spelling differences between the dialects
live here (shift operators, integer division, list functions).
"""

from __future__ import annotations


class Dialect:
    name: str

    # --- bit ops -------------------------------------------------------
    def shl(self, x: str, n: int) -> str:
        raise NotImplementedError

    def shr(self, x: str, n: int) -> str:
        raise NotImplementedError

    def band(self, x: str, y: str) -> str:
        return f"({x} & {y})"

    def bor(self, x: str, y: str) -> str:
        return f"({x} | {y})"

    def bxor(self, x: str, y: str) -> str:
        raise NotImplementedError

    # --- arithmetic ----------------------------------------------------
    def idiv(self, x: str, y: str) -> str:
        """Integer (floor-toward-zero) division of non-negative ints."""
        raise NotImplementedError

    def imod(self, x: str, y: str) -> str:
        return f"({x} % {y})"

    def dbl(self, x: str) -> str:
        """Cast to float64."""
        return f"CAST({x} AS DOUBLE)"

    def big(self, x: str) -> str:
        """Cast to int64."""
        return f"CAST({x} AS BIGINT)"

    # --- strings / lists ------------------------------------------------
    def split_ws(self, x: str) -> str:
        """Split on single spaces (testdata tokens are space-joined)."""
        raise NotImplementedError

    def ntokens(self, x: str) -> str:
        raise NotImplementedError

    def regex_matches(self, x: str, pattern: str) -> str:
        """List of all full regex matches. Patterns must stay in the
        char-class + alternation subset both Java regex and RE2 parse
        identically."""
        raise NotImplementedError

    def regex_replace_all(self, x: str, pattern: str, rep: str) -> str:
        """Replace EVERY match (Spark's default; DuckDB needs 'g').
        Same pattern-subset rule as regex_matches."""
        raise NotImplementedError

    def list_len(self, lst: str) -> str:
        raise NotImplementedError

    def fold_sum_big(self, lst: str, var: str, term: str) -> str:
        """sum over list elements of an int64 ``term`` in variable ``var``."""
        raise NotImplementedError

    def last_ignore_nulls(self, expr: str, over: str) -> str:
        """last_value(expr) IGNORE NULLS OVER over — spelling differs."""
        raise NotImplementedError

    def epoch_us(self, ts: str) -> str:
        """Timestamp -> int64 microseconds since epoch (exact)."""
        raise NotImplementedError

    def range_sql(self, n: int, alias: str, col: str = "i") -> str:
        """Derived table of integers 0..n-1 named alias(col)."""
        raise NotImplementedError


class SparkDialect(Dialect):
    name = "spark"

    def shl(self, x, n):
        return f"shiftleft({x}, {n})"

    def shr(self, x, n):
        return f"shiftright({x}, {n})"

    def bxor(self, x, y):
        return f"({x} ^ {y})"

    def idiv(self, x, y):
        return f"({x} div {y})"

    def split_ws(self, x):
        return f"split({x}, ' ')"

    def ntokens(self, x):
        return f"size(split({x}, ' '))"

    def regex_matches(self, x, pattern):
        return f"regexp_extract_all({x}, '{pattern}', 0)"

    def regex_replace_all(self, x, pattern, rep):
        return f"regexp_replace({x}, '{pattern}', '{rep}')"

    def list_len(self, lst):
        return f"size({lst})"

    def fold_sum_big(self, lst, var, term):
        return (f"aggregate({lst}, CAST(0 AS BIGINT), "
                f"(acc, {var}) -> acc + CAST({term} AS BIGINT))")

    def last_ignore_nulls(self, expr, over):
        return f"last_value({expr}, true) OVER {over}"

    def epoch_us(self, ts):
        # parquet timestamps arrive as TIMESTAMP_NTZ; the session tz is
        # pinned to UTC (session.py) so the cast matches DuckDB's
        # naive-as-UTC epoch_us exactly
        return f"unix_micros(CAST({ts} AS TIMESTAMP))"

    def range_sql(self, n, alias, col="i"):
        return f"(SELECT CAST(id AS BIGINT) AS {col} FROM range({n})) {alias}"


class DuckDialect(Dialect):
    name = "duckdb"

    def shl(self, x, n):
        return f"({x} << {n})"

    def shr(self, x, n):
        return f"({x} >> {n})"

    def bxor(self, x, y):
        return f"xor({x}, {y})"

    def idiv(self, x, y):
        return f"({x} // {y})"

    def split_ws(self, x):
        return f"string_split({x}, ' ')"

    def ntokens(self, x):
        return f"len(string_split({x}, ' '))"

    def regex_matches(self, x, pattern):
        return f"regexp_extract_all({x}, '{pattern}')"

    def regex_replace_all(self, x, pattern, rep):
        return f"regexp_replace({x}, '{pattern}', '{rep}', 'g')"

    def list_len(self, lst):
        return f"len({lst})"

    def fold_sum_big(self, lst, var, term):
        return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
                f"list_transform({lst}, {var} -> CAST({term} AS BIGINT))), "
                f"(acc, v) -> acc + v)")

    def last_ignore_nulls(self, expr, over):
        return f"last_value({expr} IGNORE NULLS) OVER {over}"

    def epoch_us(self, ts):
        return f"epoch_us({ts})"

    def range_sql(self, n, alias, col="i"):
        return f"(SELECT CAST(range AS BIGINT) AS {col} FROM range({n})) {alias}"


SPARK = SparkDialect()
DUCKDB = DuckDialect()
