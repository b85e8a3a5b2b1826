"""Randomized differential testing (SQLancer-style, seeded): generate
queries in the ANSI subset BOTH engines parse identically, run each
through Spark SQL and DuckDB over the same parquet, and compare. The
hand-written oracle pairs pin the 236 curated operators; this harness
probes the combinatorial space BETWEEN them — predicate nesting,
group-by subsets, aggregate mixes — where engine bugs actually live.

Determinism: a fixed seed per test run (so failures reproduce); floats
compare exactly after the same parity rounding the curated oracles use,
except SUM/AVG over computed expressions which get a 1e-9 relative
tolerance (summation order across 32 partitions is not contractual).
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from sap_cta_data_pipeline_spark.catalog import register_views, table_path

SF = "/root/testdata/sf0.01"

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
NUM_DOMAIN = {
    "l_quantity": (1, 50),
    "l_extendedprice": (900, 105000),
    "l_discount": (0.0, 0.1),
    "l_tax": (0.0, 0.08),
}
STR_COLS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]}
GROUP_COLS = ["l_returnflag", "l_linestatus"]


def _atom(rng: random.Random) -> str:
    kind = rng.random()
    if kind < 0.5:
        c = rng.choice(NUM_COLS)
        lo, hi = NUM_DOMAIN[c]
        v = round(rng.uniform(lo, hi), 4)
        op = rng.choice(["<", "<=", ">", ">="])
        return f"{c} {op} {v}"
    if kind < 0.8:
        c = rng.choice(list(STR_COLS))
        v = rng.choice(STR_COLS[c])
        op = rng.choice(["=", "!=", "IN"])
        if op == "IN":
            vals = rng.sample(STR_COLS[c], k=min(2, len(STR_COLS[c])))
            return f"{c} IN ({', '.join(repr(x) for x in vals)})"
        return f"{c} {op} {v!r}"
    d = f"1995-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
    op = rng.choice(["<", ">="])
    return f"l_shipdate {op} DATE '{d}'"


def _predicate(rng: random.Random) -> str:
    atoms = [_atom(rng) for _ in range(rng.randint(1, 3))]
    joiner = f" {rng.choice(['AND', 'OR'])} "
    return joiner.join(f"({a})" for a in atoms)


def _query(rng: random.Random) -> tuple[str, list[str]]:
    groups = rng.sample(GROUP_COLS, k=rng.randint(0, 2))
    aggs = ["count(*) AS n"]
    approx_cols = []
    for i in range(rng.randint(1, 3)):
        c = rng.choice(NUM_COLS)
        fn = rng.choice(["sum", "avg", "min", "max"])
        alias = f"a{i}"
        if fn in ("sum", "avg"):
            aggs.append(f"round({fn}({c}), 6) AS {alias}")
            approx_cols.append(alias)
        else:
            aggs.append(f"{fn}({c}) AS {alias}")
    sel = ", ".join(groups + aggs)
    sql = f"SELECT {sel} FROM lineitem WHERE {_predicate(rng)}"
    if groups:
        sql += f" GROUP BY {', '.join(groups)}"
    sql += (
        f" ORDER BY {', '.join(groups)}" if groups else ""
    )
    return sql, approx_cols


def _compare(spark_rows, duck_rows, cols, approx_cols):
    assert len(spark_rows) == len(duck_rows)
    for s_row, d_row in zip(spark_rows, duck_rows):
        for name, sv, dv in zip(cols, s_row, d_row):
            if sv is None or dv is None:
                assert sv is None and dv is None
                continue
            if name in approx_cols:
                assert math.isclose(float(sv), float(dv), rel_tol=1e-9, abs_tol=1e-9), (
                    name,
                    sv,
                    dv,
                )
            else:
                assert sv == dv, (name, sv, dv)


@pytest.mark.parametrize("seed", [42, 1337, 20260813])
def test_random_queries_agree(spark, seed):
    rng = random.Random(seed)
    register_views(spark, SF, ("lineitem",))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{table_path(SF, 'lineitem')}')"
    )
    for i in range(25):
        sql, approx_cols = _query(rng)
        try:
            sdf = spark.sql(sql)
            s_rows = [tuple(r) for r in sdf.collect()]
            cols = sdf.columns
            d_rows = [tuple(r) for r in con.execute(sql).fetchall()]
        except Exception as e:  # pragma: no cover - aid reproduction
            raise AssertionError(f"seed={seed} i={i} sql={sql!r}: {e}") from e
        try:
            _compare(s_rows, d_rows, cols, approx_cols)
        except AssertionError as e:
            raise AssertionError(f"seed={seed} i={i} sql={sql!r}: {e}") from e


O_NUM = {"o_totalprice": (850, 560000)}
O_STR = {
    "o_orderstatus": ["F", "O", "P"],
    "o_orderpriority": [
        "1-URGENT",
        "2-HIGH",
        "3-MEDIUM",
        "4-NOT SPECIFIED",
        "5-LOW",
    ],
}


def _join_query(rng: random.Random) -> tuple[str, list[str]]:
    groups = rng.sample(["o_orderstatus", "l_returnflag"], k=rng.randint(0, 2))
    aggs = ["count(*) AS n"]
    approx = []
    for i in range(rng.randint(1, 2)):
        c = rng.choice(NUM_COLS + list(O_NUM))
        fn = rng.choice(["sum", "avg", "min", "max"])
        alias = f"a{i}"
        if fn in ("sum", "avg"):
            aggs.append(f"round({fn}({c}), 6) AS {alias}")
            approx.append(alias)
        else:
            aggs.append(f"{fn}({c}) AS {alias}")
    lc = rng.choice(NUM_COLS)
    lo, hi = NUM_DOMAIN[lc]
    oc = rng.choice(list(O_STR))
    preds = [
        f"{lc} {rng.choice(['<', '>='])} {round(rng.uniform(lo, hi), 4)}",
        f"{oc} = {rng.choice(O_STR[oc])!r}",
    ]
    sel = ", ".join(groups + aggs)
    sql = (
        f"SELECT {sel} FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        f" WHERE ({preds[0]}) {rng.choice(['AND', 'OR'])} ({preds[1]})"
    )
    if groups:
        sql += f" GROUP BY {', '.join(groups)} ORDER BY {', '.join(groups)}"
    return sql, approx


@pytest.mark.parametrize("seed", [7, 2024])
def test_random_join_queries_agree(spark, seed):
    rng = random.Random(seed)
    register_views(spark, SF, ("lineitem", "orders"))
    con = duckdb.connect()
    for tbl in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{table_path(SF, tbl)}')"
        )
    for i in range(15):
        sql, approx_cols = _join_query(rng)
        try:
            sdf = spark.sql(sql)
            s_rows = [tuple(r) for r in sdf.collect()]
            cols = sdf.columns
            d_rows = [tuple(r) for r in con.execute(sql).fetchall()]
            _compare(s_rows, d_rows, cols, approx_cols)
        except AssertionError as e:
            raise AssertionError(f"seed={seed} i={i} sql={sql!r}: {e}") from e


UNIQ = "l_orderkey, l_linenumber, l_partkey, l_suppkey"  # verified unique


def _window_query(rng: random.Random) -> tuple[str, list[str]]:
    """Window-function fuzz: every ORDER BY ends with the verified-unique
    4-column line key ((orderkey, linenumber) alone is NOT unique in this
    synthetic data — 45832 distinct over 60000 rows), so rank/lag results
    are total-order deterministic in both engines and the final result
    order is too."""
    part = rng.choice(["l_returnflag", "l_linestatus", "l_returnflag, l_linestatus"])
    oc = rng.choice(NUM_COLS)
    fn = rng.choice(["row_number()", "rank()", "dense_rank()", "lag"])
    order = f"{oc} {rng.choice(['ASC', 'DESC'])}, {UNIQ}"
    approx = []
    if fn == "lag":
        expr = f"coalesce(round(lag({oc}) OVER w, 6), -1.0) AS wv"
        approx.append("wv")
    else:
        expr = f"CAST({fn} OVER w AS BIGINT) AS wv"
    sql = (
        f"SELECT {UNIQ}, {expr}"
        f" FROM lineitem"
        f" WHERE l_quantity >= {rng.randint(40, 48)}"
        f" WINDOW w AS (PARTITION BY {part} ORDER BY {order})"
        f" ORDER BY {UNIQ}"
    )
    return sql, approx


@pytest.mark.parametrize("seed", [11, 3030])
def test_random_window_queries_agree(spark, seed):
    rng = random.Random(seed)
    register_views(spark, SF, ("lineitem",))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{table_path(SF, 'lineitem')}')"
    )
    for i in range(10):
        sql, approx_cols = _window_query(rng)
        try:
            sdf = spark.sql(sql)
            s_rows = [tuple(r) for r in sdf.collect()]
            cols = sdf.columns
            d_rows = [tuple(r) for r in con.execute(sql).fetchall()]
            _compare(s_rows, d_rows, cols, approx_cols)
        except AssertionError as e:
            raise AssertionError(f"seed={seed} i={i} sql={sql!r}: {e}") from e


def _scalar_expr(rng: random.Random, depth: int = 0) -> tuple[str, bool]:
    """Random scalar expression in the portable subset; returns (sql,
    is_float). Nesting depth ≤ 2 keeps both parsers honest without
    blowing up float error."""
    if depth >= 2 or rng.random() < 0.35:
        if rng.random() < 0.6:
            return rng.choice(NUM_COLS), True
        return f"CAST(l_linenumber AS DOUBLE)", True
    c, _ = _scalar_expr(rng, depth + 1)
    d, _ = _scalar_expr(rng, depth + 1)
    form = rng.choice(
        [
            f"abs({c} - {d})",
            f"round({c} + {d}, 4)",
            f"floor({c} * 7.0)",
            f"ceiling({c} + 2.5)",
            f"greatest({c}, {d})",
            f"least({c}, {d})",
            f"({c} + {d}) / 2.0",
            f"sqrt(abs({c}))",
        ]
    )
    return form, True


def _string_expr(rng: random.Random) -> str:
    base = rng.choice(["l_returnflag", "l_linestatus"])
    form = rng.choice(
        [
            f"lower(concat({base}, '_x'))",
            f"upper(concat('p_', {base}))",
            f"substr(concat({base}, {base}, 'abcdef'), {rng.randint(1, 4)}, {rng.randint(1, 5)})",
            f"CAST(length(concat({base}, 'yy')) AS BIGINT)",
            f"replace(concat({base}, '-', {base}), '-', '::')",
            f"reverse(concat({base}, 'zq'))",
        ]
    )
    return form


@pytest.mark.parametrize("seed", [5150, 808])
def test_random_scalar_exprs_agree(spark, seed):
    rng = random.Random(seed)
    register_views(spark, SF, ("lineitem",))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{table_path(SF, 'lineitem')}')"
    )
    for i in range(15):
        num, _ = _scalar_expr(rng)
        st = _string_expr(rng)
        sql = (
            f"SELECT {UNIQ}, round({num}, 6) AS nv, {st} AS sv"
            f" FROM lineitem WHERE l_quantity >= 47"
            f" ORDER BY {UNIQ}"
        )
        try:
            sdf = spark.sql(sql)
            s_rows = [tuple(r) for r in sdf.collect()]
            cols = sdf.columns
            d_rows = [tuple(r) for r in con.execute(sql).fetchall()]
            _compare(s_rows, d_rows, cols, approx_cols=["nv"])
        except AssertionError as e:
            raise AssertionError(f"seed={seed} i={i} sql={sql!r}: {e}") from e


@pytest.mark.parametrize("seed", [616])
def test_random_null_semantics_agree(spark, seed):
    """NULL-injected differential: nullif() plants NULLs, then aggregates
    (which skip NULLs), count(col) vs count(*), and coalesce fallbacks
    must agree — the 3VL behaviors engines most often diverge on."""
    rng = random.Random(seed)
    register_views(spark, SF, ("lineitem",))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{table_path(SF, 'lineitem')}')"
    )
    for i in range(12):
        flag = rng.choice(STR_COLS["l_returnflag"])
        nc = rng.choice(NUM_COLS)
        q_thresh = rng.randint(20, 45)
        sql = (
            "SELECT l_linestatus,"
            " count(*) AS n_rows,"
            f" count(nullif(l_returnflag, {flag!r})) AS n_nonnull,"
            f" round(avg(CASE WHEN l_returnflag = {flag!r} THEN NULL ELSE {nc} END), 6) AS avg_skipnull,"
            f" CAST(sum(CASE WHEN nullif(l_quantity, {q_thresh}.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_planted,"
            f" round(sum(coalesce(nullif({nc}, 0.0), -1.0)), 6) AS sum_coalesced"
            " FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"
        )
        try:
            sdf = spark.sql(sql)
            s_rows = [tuple(r) for r in sdf.collect()]
            d_rows = [tuple(r) for r in con.execute(sql).fetchall()]
            _compare(s_rows, d_rows, sdf.columns, approx_cols=["avg_skipnull", "sum_coalesced"])
        except AssertionError as e:
            raise AssertionError(f"seed={seed} i={i} sql={sql!r}: {e}") from e


@pytest.mark.parametrize("seed", [404])
def test_random_rollup_queries_agree(spark, seed):
    """ROLLUP/CUBE differential with grouping() flags. ORDER BY pins
    NULLS FIRST explicitly — Spark's default null ordering (NULLS FIRST
    for ASC) differs from DuckDB's (NULLS LAST), so defaults would make
    row order, not values, diverge."""
    rng = random.Random(seed)
    register_views(spark, SF, ("lineitem",))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{table_path(SF, 'lineitem')}')"
    )
    for i in range(10):
        op = rng.choice(["ROLLUP", "CUBE"])
        nc = rng.choice(NUM_COLS)
        lo, hi = NUM_DOMAIN[nc]
        sql = (
            "SELECT l_returnflag, l_linestatus,"
            " CAST(grouping(l_returnflag) AS BIGINT) AS g1,"
            " CAST(grouping(l_linestatus) AS BIGINT) AS g2,"
            f" count(*) AS n, round(sum({nc}), 6) AS s"
            f" FROM lineitem WHERE {nc} >= {round(rng.uniform(lo, (lo + hi) / 2), 4)}"
            f" GROUP BY {op}(l_returnflag, l_linestatus)"
            " ORDER BY g1, g2, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"
        )
        try:
            sdf = spark.sql(sql)
            s_rows = [tuple(r) for r in sdf.collect()]
            d_rows = [tuple(r) for r in con.execute(sql).fetchall()]
            _compare(s_rows, d_rows, sdf.columns, approx_cols=["s"])
        except AssertionError as e:
            raise AssertionError(f"seed={seed} i={i} sql={sql!r}: {e}") from e


@pytest.mark.parametrize("seed", [271828])
def test_random_setop_queries_agree(spark, seed):
    rng = random.Random(seed)
    register_views(spark, SF, ("lineitem",))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{table_path(SF, 'lineitem')}')"
    )
    for i in range(10):
        op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
        a = _predicate(rng)
        b = _predicate(rng)
        sql = (
            f"SELECT * FROM"
            f" (SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS q"
            f"  FROM lineitem WHERE {a}"
            f"  {op}"
            f"  SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS q"
            f"  FROM lineitem WHERE {b}) t"
            f" ORDER BY l_returnflag, l_linestatus, q"
        )
        try:
            sdf = spark.sql(sql)
            s_rows = [tuple(r) for r in sdf.collect()]
            d_rows = [tuple(r) for r in con.execute(sql).fetchall()]
            # multiset results: compare as sorted multisets (ORDER BY on the
            # 3 columns is total here since all three are selected)
            _compare(s_rows, d_rows, sdf.columns, approx_cols=[])
        except AssertionError as e:
            raise AssertionError(f"seed={seed} i={i} sql={sql!r}: {e}") from e


@pytest.mark.parametrize("seed", [90210])
def test_random_subquery_shapes_agree(spark, seed):
    """IN / NOT IN / EXISTS / NOT EXISTS differential — including the
    null-aware anti-join lane (o_orderkey is non-null here, so NOT IN is
    well-defined; the null-polluted 3VL case is pinned separately by the
    curated sub_not_in_nulls)."""
    rng = random.Random(seed)
    register_views(spark, SF, ("lineitem", "orders"))
    con = duckdb.connect()
    for tbl in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{table_path(SF, tbl)}')"
        )
    for i in range(12):
        oc = rng.choice(list(O_STR))
        inner_pred = f"{oc} = {rng.choice(O_STR[oc])!r}"
        nc = rng.choice(NUM_COLS)
        lo, hi = NUM_DOMAIN[nc]
        outer_pred = f"{nc} >= {round(rng.uniform((lo + hi) / 2, hi), 4)}"
        shape = rng.choice(["IN", "NOT IN", "EXISTS", "NOT EXISTS"])
        if shape in ("IN", "NOT IN"):
            cond = f"l_orderkey {shape} (SELECT o_orderkey FROM orders WHERE {inner_pred})"
        else:
            cond = (
                f"{shape} (SELECT 1 FROM orders o WHERE o.o_orderkey = lineitem.l_orderkey"
                f" AND {inner_pred})"
            )
        sql = (
            f"SELECT l_returnflag, count(*) AS n, round(sum({nc}), 6) AS s"
            f" FROM lineitem WHERE ({outer_pred}) AND {cond}"
            f" GROUP BY l_returnflag ORDER BY l_returnflag"
        )
        try:
            sdf = spark.sql(sql)
            s_rows = [tuple(r) for r in sdf.collect()]
            d_rows = [tuple(r) for r in con.execute(sql).fetchall()]
            _compare(s_rows, d_rows, sdf.columns, approx_cols=["s"])
        except AssertionError as e:
            raise AssertionError(f"seed={seed} i={i} sql={sql!r}: {e}") from e
