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
``SELECT DISTINCT`` block; QUALIFY combined with ``GROUP BY`` in the same
block referencing non-grouped columns; alias expansion inside OVER(...)
only matches window specs without nested parentheses (an aliased expression
wrapped in a function call inside the window spec is left untouched), and
the word-boundary substitution does not skip string literals — an alias
name appearing inside a quoted string within the same select list would be
rewritten. The reference's statements contain neither construct.
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

    # Snowflake lets the post-QUALIFY ORDER BY reference any column in
    # scope, not just projected ones (adhoc b sorts l2.* output by an l1
    # column) — carry the sort expressions through the subquery as hidden
    # __ob columns and sort on those outside.
    extra_cols, hidden = "", ["__q"]
    ob = re.match(r"^\s*ORDER\s+BY\s+(.*?)(\bLIMIT\b.*)?$", tail, re.IGNORECASE | re.DOTALL)
    if ob:
        items, dirs = [], []
        for raw in _split_top_level(ob.group(1)):
            m = re.match(
                r"^(.*?)(\s+(?:ASC|DESC)(?:\s+NULLS\s+(?:FIRST|LAST))?)?\s*$",
                raw.strip(),
                re.IGNORECASE | re.DOTALL,
            )
            items.append(m.group(1).strip())
            dirs.append((m.group(2) or "").strip())
        names = [f"__ob_{i}" for i in range(len(items))]
        extra_cols = "".join(f", ({e}) AS {n}" for e, n in zip(items, names))
        hidden += names
        tail = (
            "ORDER BY " + ", ".join(f"{n} {d}".strip() for n, d in zip(names, dirs))
            + " " + (ob.group(2) or "")
        )

    inner = f"{head}, ({cond}) AS __q{extra_cols} {rest}"
    replacement = (
        f"SELECT __qs.* EXCEPT ({', '.join(hidden)}) FROM ({inner}) __qs WHERE __q {tail}"
    )
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
    out = _expand_aliases_in_windows(out)
    # Snowflake function surface beyond the reference's own statements — a
    # user switching from that warehouse writes these daily. Pure renames
    # first (call position only), then single-argument expansions with
    # balanced-paren argument capture.
    out = re.sub(r"\bIFF\s*\(", "if(", out, flags=re.IGNORECASE)
    out = re.sub(r"\bNVL\s*\(", "coalesce(", out, flags=re.IGNORECASE)
    out = _expand_one_arg(out, "ZEROIFNULL", lambda a: f"coalesce({a}, 0)")
    out = _expand_one_arg(out, "SQUARE", lambda a: f"power(({a}), 2)")
    out = _expand_one_arg(out, "TO_VARCHAR", lambda a: f"cast({a} AS STRING)")
    return out


def _expand_one_arg(sql: str, fn: str, build) -> str:
    """Rewrite every ``fn(<arg>)`` call (single argument, parens balanced,
    quotes respected) via ``build(arg_text)``."""
    pat = re.compile(r"\b" + fn + r"\s*\(", re.IGNORECASE)
    out = sql
    while True:
        m = pat.search(out)
        if not m:
            return out
        depth_map = _depth_map(out)
        start = m.end() - 1  # the '('
        open_depth = depth_map[start]
        end = next(
            i
            for i in range(start + 1, len(out))
            if out[i] == ")" and depth_map[i] == open_depth
        )
        arg = out[m.end() : end]
        out = out[: m.start()] + build(arg) + out[end + 1 :]


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    parts, depth, cur, in_str = [], 0, [], None
    for ch in text:
        if in_str:
            cur.append(ch)
            if ch == in_str:
                in_str = None
            continue
        if ch in ("'", '"'):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


_AS_ALIAS = re.compile(r"^(.*?)\s+AS\s+([A-Za-z_]\w*)\s*$", re.IGNORECASE | re.DOTALL)


def _expand_aliases_in_windows(sql: str) -> str:
    """Snowflake allows a select alias inside a window spec of the same
    select (``ROW_NUMBER() OVER (ORDER BY rev DESC)`` with ``... AS rev``);
    Spark rejects lateral aliases in windows — substitute the defining
    expression into every OVER(...) of that select list."""
    out = sql
    changed = True
    while changed:  # re-scan after each edit so token offsets stay valid
        changed = False
        tokens = _find_tokens(out)
        for kw, p, d in tokens:
            if kw != "SELECT":
                continue
            from_pos = next(
                (q for k2, q, d2 in tokens if k2 == "FROM" and d2 == d and q > p), None
            )
            if from_pos is None:
                continue
            seg = out[p + len("SELECT"): from_pos]
            aliases = {}
            for item in _split_top_level(seg):
                m = _AS_ALIAS.match(item.strip())
                if m and "OVER" not in m.group(1).upper():
                    aliases[m.group(2)] = m.group(1).strip()
            if not aliases:
                continue

            def fix_over(mo: re.Match) -> str:
                inner = mo.group(1)
                for name, expr in aliases.items():
                    inner = re.sub(
                        rf"\b{re.escape(name)}\b", f"({expr})", inner, flags=re.IGNORECASE
                    )
                return f"OVER ({inner})"

            new_seg = re.sub(r"OVER\s*\(([^()]*)\)", fix_over, seg, flags=re.IGNORECASE)
            if new_seg != seg:
                out = out[: p + len("SELECT")] + new_seg + out[from_pos:]
                changed = True
                break
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
