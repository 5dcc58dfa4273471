"""Reference-dialect (Snowflake-flavored) SQL front-end.

The reference's analytical SQL (workfile_ad-hoc_analysis.sql,
workfile_populate_data_warehouse.py views) uses a handful of constructs
Spark SQL lacks; this module translates statement text so such queries run
unchanged on the engine (SURVEY §4.2 candidate 1):

- ``QUALIFY <window-predicate>``  ->  nested select computing the predicate
  as a column + outer ``__qs.* EXCEPT (__q) ... WHERE __q`` filter
  (fully nestable; Spark has no QUALIFY).
- ``DATE_FROM_PARTS(y, m, d)``    ->  ``make_date(y, m, d)``.
- ``LAST_DAY(x, 'MONTH')``        ->  ``last_day(x)``.

Already Spark-native and passed through untouched: ``expr::type`` casts,
``SPLIT_PART`` (incl. negative index), ``PERCENTILE_CONT ... WITHIN GROUP``,
lateral column aliases, ``LAG/RANK/ROW_NUMBER OVER``.

Known limits (not used by the reference's queries): QUALIFY directly on a
``SELECT DISTINCT`` block, and QUALIFY combined with ``GROUP BY`` in the
same block referencing non-grouped columns.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_KEYWORD = re.compile(r"\b(QUALIFY|SELECT|FROM|ORDER\s+BY|LIMIT)\b", re.IGNORECASE)


def _depth_map(sql: str) -> list[int]:
    """Paren depth at each character (quotes respected)."""
    depth, out, in_str = 0, [], None
    for ch in sql:
        if in_str:
            out.append(depth)
            if ch == in_str:
                in_str = None
            continue
        if ch in ("'", '"'):
            in_str = ch
        elif ch == "(":
            depth += 1
            out.append(depth)
            continue
        elif ch == ")":
            out.append(depth)
            depth -= 1
            continue
        out.append(depth)
    return out


def _find_tokens(sql: str) -> list[tuple[str, int, int]]:
    depths = _depth_map(sql)
    return [
        (m.group(1).upper().replace(" ", "").replace("\n", ""), m.start(), depths[m.start()])
        for m in _KEYWORD.finditer(sql)
    ]


def _rewrite_one_qualify(sql: str) -> str | None:
    """Rewrite the first (innermost-safe: rightmost) QUALIFY; None if none."""
    tokens = _find_tokens(sql)
    quals = [(p, d) for kw, p, d in tokens if kw == "QUALIFY"]
    if not quals:
        return None
    qpos, qdepth = quals[-1]  # rightmost = innermost-or-last; loop handles rest
    depths = _depth_map(sql)

    # block start: last position before qpos where depth < qdepth (the '('
    # opening this block), else statement start
    block_start = 0
    for i in range(qpos - 1, -1, -1):
        if depths[i] < qdepth:
            block_start = i + 1
            break
    # the block's SELECT: first SELECT token at qdepth within the block
    select_pos = next(
        p for kw, p, d in tokens if kw == "SELECT" and d == qdepth and block_start <= p < qpos
    )
    # the select list ends at the first FROM at qdepth after select_pos
    from_pos = next(
        p for kw, p, d in tokens if kw == "FROM" and d == qdepth and select_pos < p < qpos
    )
    # block end: the ')' closing this block (its own depth equals qdepth —
    # closing parens carry their pre-decrement depth), else statement end
    block_end = len(sql)
    for i in range(qpos, len(sql)):
        if depths[i] < qdepth or (sql[i] == ")" and depths[i] == qdepth):
            block_end = i
            break
    # tail: ORDER BY / LIMIT at qdepth after the QUALIFY condition
    tail_pos = block_end
    for kw, p, d in tokens:
        if kw in ("ORDERBY", "LIMIT") and d == qdepth and qpos < p < block_end:
            tail_pos = min(tail_pos, p)
    cond = sql[qpos + len("QUALIFY"): tail_pos].strip()
    head = sql[select_pos:from_pos].rstrip()
    rest = sql[from_pos:qpos]
    tail = sql[tail_pos:block_end]

    inner = f"{head}, ({cond}) AS __q {rest}"
    replacement = f"SELECT __qs.* EXCEPT (__q) FROM ({inner}) __qs WHERE __q {tail}"
    return sql[:select_pos] + replacement + sql[block_end:]


def translate(sql: str) -> str:
    """Translate reference-dialect SQL text to Spark SQL."""
    out = sql
    while True:
        nxt = _rewrite_one_qualify(out)
        if nxt is None:
            break
        out = nxt
    out = re.sub(r"\bDATE_FROM_PARTS\s*\(", "make_date(", out, flags=re.IGNORECASE)
    out = _strip_last_day_month(out)
    return out


def _strip_last_day_month(sql: str) -> str:
    """LAST_DAY(expr, 'MONTH') -> last_day(expr), nested args supported."""
    pattern = re.compile(r"\bLAST_DAY\s*\(", re.IGNORECASE)
    pos = 0
    while True:
        m = pattern.search(sql, pos)
        if not m:
            return sql
        depth, i = 1, m.end()
        args, arg_start = [], m.end()
        while i < len(sql) and depth > 0:
            ch = sql[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    args.append(sql[arg_start:i])
            elif ch == "," and depth == 1:
                args.append(sql[arg_start:i])
                arg_start = i + 1
            i += 1
        if len(args) == 2 and args[1].strip().upper() == "'MONTH'":
            repl = f"last_day({args[0].strip()})"
            sql = sql[: m.start()] + repl + sql[i:]
            pos = m.start() + len(repl)
        else:
            pos = m.end()  # 1-arg form is already Spark-valid


def run(spark: SparkSession, sql: str) -> DataFrame:
    """Execute reference-dialect SQL against the current catalog."""
    return spark.sql(translate(sql))
