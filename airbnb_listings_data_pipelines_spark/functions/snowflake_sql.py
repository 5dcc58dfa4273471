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
- VARIANT positional paths (the external-table idiom of
  design.sql:140-267): ``alias.value:cN`` / ``value:cN``  ->  ``alias.cN``
  / ``cN`` — the raw layer here is ``sources.csv.read_positional_csv``
  DataFrames whose columns ARE c1..cN, so the path collapses to a column
  reference.
- ``metadata$filename``  ->  ``filename`` (the reader's lineage column;
  already the basename, so the reference's surrounding
  ``SPLIT_PART(..,'/',-1)`` is an identity pass over it).
- Type words Spark lacks: ``NUMERIC`` -> ``decimal(18,6)`` (the engine's
  documented divergence from Snowflake's integer-rounding NUMBER(38,0) —
  SURVEY §2.10(8); price lands as decimal(18,6) here vs decimal(10,2) in
  plans/staging.py, numerically equal), ``TEXT``/bare ``VARCHAR`` ->
  ``string``.
- Select-list aliases referenced inside ``OVER(...)`` window specs or in
  ``WHERE`` of the same select (Snowflake scoping; Spark resolves neither)
  -> the defining expression is substituted in place. Balanced-paren
  window capture, quote-aware word substitution, ``DISTINCT`` stripped
  from the first select item before alias harvesting.

Already Spark-native and passed through untouched: ``expr::type`` casts,
``SPLIT_PART`` (incl. negative index), ``PERCENTILE_CONT ... WITHIN GROUP``,
lateral column aliases, ``LAG/RANK/ROW_NUMBER OVER``.

Known limits (not used by the reference's queries): QUALIFY directly on a
``SELECT DISTINCT`` block; QUALIFY combined with ``GROUP BY`` in the same
block referencing non-grouped columns; alias-in-WHERE expansion assumes
the alias name does not also name an input column of the same block
(Snowflake prefers the input column there — real shadowing would need a
catalog, which statement-text translation doesn't have).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_KEYWORD = re.compile(
    r"\b(QUALIFY|SELECT|FROM|WHERE|GROUP\s+BY|HAVING|ORDER\s+BY|LIMIT)\b", re.IGNORECASE
)


def _spans_outside_strings(sql: str) -> list[tuple[int, int]]:
    """(start, end) spans of sql NOT inside a quoted literal."""
    spans, start, in_str = [], 0, None
    for i, ch in enumerate(sql):
        if in_str:
            if ch == in_str:
                in_str = None
                start = i + 1
            continue
        if ch in ("'", '"'):
            if start < i:
                spans.append((start, i))
            in_str = ch
    if in_str is None and start < len(sql):
        spans.append((start, len(sql)))
    return spans


def _sub_outside_strings(sql: str, pattern: str, repl) -> str:
    """re.sub applied only to the regions outside quoted literals."""
    pat = re.compile(pattern, re.IGNORECASE)
    out, pos = [], 0
    for s, e in _spans_outside_strings(sql):
        out.append(sql[pos:s])
        out.append(pat.sub(repl, sql[s:e]))
        pos = e
    out.append(sql[pos:])
    return "".join(out)


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
    spans = _spans_outside_strings(sql)
    # a keyword INSIDE a quoted literal ('QUALIFY not a keyword here') is
    # data, not syntax — found by the round-4 dialect fuzzer
    return [
        (m.group(1).upper().replace(" ", "").replace("\n", ""), m.start(), depths[m.start()])
        for m in _KEYWORD.finditer(sql)
        if any(s <= m.start() < e for s, e in spans)
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
    # Lexical layer first (VARIANT paths, lineage pseudo-column, type
    # words) so the structural rewrites below see plain Spark identifiers.
    out = _sub_outside_strings(out, r"\bmetadata\$filename\b", "filename")
    out = _sub_outside_strings(out, r"\bvalue\s*:\s*(\w+)\b", r"\1")
    out = _sub_outside_strings(out, r"\bNUMERIC\b", "decimal(18,6)")
    out = _sub_outside_strings(out, r"\bTEXT\b", "string")
    out = _sub_outside_strings(out, r"\bVARCHAR\b(?!\s*\()", "string")
    while True:
        nxt = _rewrite_one_qualify(out)
        if nxt is None:
            break
        out = nxt
    out = re.sub(r"\bDATE_FROM_PARTS\s*\(", "make_date(", out, flags=re.IGNORECASE)
    out = _strip_last_day_month(out)
    out = _expand_aliases_in_windows(out)
    out = _expand_aliases_in_where(out)
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


def _select_list_aliases(seg: str) -> dict[str, str]:
    """alias -> defining expression, from a select-list segment (text
    between SELECT and FROM). The leading DISTINCT/ALL qualifier is
    stripped from the first item (it is a set quantifier, not part of the
    expression); window-function items are excluded (substituting them
    into WHERE or another window would be invalid in both dialects)."""
    items = _split_top_level(seg)
    if items:
        items[0] = re.sub(r"^\s*(DISTINCT|ALL)\b", "", items[0], flags=re.IGNORECASE)
    aliases: dict[str, str] = {}
    for item in items:
        m = _AS_ALIAS.match(item.strip())
        if not m or "OVER" in m.group(1).upper():
            continue
        name, expr = m.group(2), m.group(1).strip()
        # A self-referential alias (``split_part(filename,..) AS filename``)
        # means the name must already resolve to an input column — both
        # dialects bind the inner reference to the input, so expanding it
        # would be wrong (and would recurse forever). Leave it alone.
        if re.search(rf"\b{re.escape(name)}\b", expr, re.IGNORECASE):
            continue
        aliases[name] = expr
    return aliases


def _sub_aliases(text: str, aliases: dict[str, str]) -> str:
    """Replace each alias word with its parenthesized definition —
    quote-aware, so an alias name inside a string literal is untouched."""
    for name, expr in aliases.items():
        # callable repl: the expression text is inserted verbatim (no
        # backreference/escape interpretation of its contents)
        text = _sub_outside_strings(
            text, rf"\b{re.escape(name)}\b", lambda m, e=expr: f"({e})"
        )
    return text


def _expand_aliases_in_windows(sql: str) -> str:
    """Snowflake allows a select alias inside a window spec of the same
    select (``ROW_NUMBER() OVER (ORDER BY rev DESC)`` with ``... AS rev``);
    Spark rejects lateral aliases in windows — substitute the defining
    expression into every OVER(...) of that select list. OVER bodies are
    captured with balanced parens (nested function calls inside the spec
    are fine) and substitution skips string literals."""
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
            aliases = _select_list_aliases(seg)
            if not aliases:
                continue

            new_seg, edited = [], False
            pos = 0
            depths = _depth_map(seg)
            for mo in re.finditer(r"\bOVER\s*\(", seg, re.IGNORECASE):
                start = mo.end() - 1  # the '('
                open_depth = depths[start]
                end = next(
                    (
                        i
                        for i in range(start + 1, len(seg))
                        if seg[i] == ")" and depths[i] == open_depth
                    ),
                    None,
                )
                if end is None:
                    continue
                inner = seg[start + 1 : end]
                fixed = _sub_aliases(inner, aliases)
                if fixed != inner:
                    new_seg.append(seg[pos : mo.start()])
                    new_seg.append(f"OVER ({fixed})")
                    pos = end + 1
                    edited = True
            new_seg.append(seg[pos:])
            if edited:
                out = out[: p + len("SELECT")] + "".join(new_seg) + out[from_pos:]
                changed = True
                break
    return out


def _expand_aliases_in_where(sql: str) -> str:
    """Snowflake also resolves select-list aliases in the WHERE clause of
    the same select (design.sql:178 filters on the ``lga_code`` alias);
    Spark resolves WHERE against input columns only — substitute the
    defining expression. See module docstring for the shadowing caveat."""
    out = sql
    changed = True
    while changed:
        changed = False
        tokens = _find_tokens(out)
        depths = _depth_map(out)
        for kw, p, d in tokens:
            if kw != "WHERE":
                continue
            sel = max(
                (q for k2, q, d2 in tokens if k2 == "SELECT" and d2 == d and q < p),
                default=None,
            )
            if sel is None:
                continue
            from_pos = next(
                (q for k2, q, d2 in tokens if k2 == "FROM" and d2 == d and sel < q < p), None
            )
            if from_pos is None:
                continue
            aliases = _select_list_aliases(out[sel + len("SELECT"): from_pos])
            if not aliases:
                continue
            # WHERE clause ends at the next same-depth clause keyword, or
            # at the ')' closing this block, or at statement end
            end = len(out)
            for k2, q, d2 in tokens:
                if q > p and d2 == d and k2 in ("GROUPBY", "HAVING", "QUALIFY", "ORDERBY", "LIMIT"):
                    end = min(end, q)
            for i in range(p, len(out)):
                if depths[i] < d or (out[i] == ")" and depths[i] == d):
                    end = min(end, i)
                    break
            seg = out[p + len("WHERE"): end]
            fixed = _sub_aliases(seg, aliases)
            if fixed != seg:
                out = out[: p + len("WHERE")] + fixed + out[end:]
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
