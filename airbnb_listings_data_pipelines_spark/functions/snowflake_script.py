"""Whole-script executor for the reference's Snowflake DDL text.

`snowflake_sql.translate` runs individual SELECT / CTAS-body / INSERT-body
statements; this module executes the ENTIRE
``workfile_design_data_warehouse.sql`` file — including the raw layer
(design.sql:7-128: CREATE DATABASE/SCHEMA, STORAGE INTEGRATION, STAGE,
FILE FORMAT, EXTERNAL TABLE + PATTERN, LIST, header-peek SELECTs) — as one
text artifact, statement by statement, against the Spark catalog.

Mapping of Snowflake concepts onto Spark (each choice stated, not hidden):

- **DATABASE.SCHEMA two-level namespace** -> Spark's single-level database:
  a Snowflake schema ``raw`` becomes the Spark database ``{prefix}raw``
  (``schema_prefix`` keeps script runs from colliding with other tenants
  of the shared catalog). The enclosing DATABASE is tracked as state only.
- **STORAGE INTEGRATION** -> recorded metadata (provider, allowed
  locations); DESCRIBE INTEGRATION returns it as a DataFrame. There is no
  credential material to manage in this engine — object-store auth is the
  Hadoop connector's job (spark.hadoop.fs.* confs).
- **STAGE** -> a named root path. ``stage_locations`` remaps the script's
  URL (e.g. the reference's gcs:// bucket, which only its authors can
  read) to a caller-provided root; with a configured GCS/S3 Hadoop
  connector the URL itself also works untouched.
- **FILE FORMAT** -> parsed option set (SKIP_HEADER, NULL_IF list,
  FIELD_OPTIONALLY_ENCLOSED_BY, FIELD_DELIMITER).
- **EXTERNAL TABLE ... PATTERN** -> a TEMP VIEW over a lazily-planned CSV
  read of the regex-matched files (true external semantics: no copy; ALTER
  EXTERNAL TABLE ... REFRESH re-lists). Snowflake's ``value:cN`` variant
  paths over these views are collapsed by the translate layer; columns ARE
  ``c1..cN`` (+ ``filename`` lineage). References to external tables are
  rewritten to the backing view names (temp views cannot be
  database-qualified), including bare names while their schema is current.
- **CREATE TABLE (typed, PK/FK)** -> parquet catalog table with translated
  types (NUMERIC -> decimal(18,6), the engine's documented scale
  divergence, SURVEY §2.10(8)); constraints are recorded as metadata and
  checkable via :meth:`ScriptSession.check_primary_key` — NOT enforced on
  write, which is exactly Snowflake's behavior (PK/FK are informational
  there; design.sql relies on that).
- **CTAS / INSERT INTO (cols) SELECT** -> translated body through the
  dialect front-end, executed as a real catalog write.

At 100 TB the execution cost profile matches the reference's: external
tables are metadata-only until scanned, each CTAS/INSERT is one Spark job
whose plan comes from the same translate() path the per-statement parity
suites already verify, and the only driver-side work is statement parsing.

Reference lines cited per handler; reference text is read at call time by
the tests — never vendored into this repository.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from ..localframe import local_df
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dialect import split_part
from .snowflake_sql import translate

# Snowflake type word -> Spark type (NUMERIC divergence per SURVEY §2.10(8))
_TYPE_MAP = {
    "VARCHAR": "string",
    "TEXT": "string",
    "STRING": "string",
    "CHAR": "string",
    "NUMERIC": "decimal(18,6)",
    "NUMBER": "decimal(18,6)",
    "INTEGER": "int",
    "INT": "int",
    "BIGINT": "bigint",
    "FLOAT": "double",
    "DOUBLE": "double",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "BOOLEAN": "boolean",
}


def split_statements(text: str) -> list[str]:
    """Split script text into statements on ``;`` outside single-quoted
    strings, with whole-line ``--`` comments removed first."""
    text = "\n".join(
        line for line in text.splitlines() if not line.strip().startswith("--")
    )
    stmts, buf, in_str = [], [], False
    i = 0
    while i < len(text):
        ch = text[i]
        if in_str:
            buf.append(ch)
            if ch == "'":
                if i + 1 < len(text) and text[i + 1] == "'":  # escaped ''
                    buf.append("'")
                    i += 1
                else:
                    in_str = False
        elif ch == "'":
            in_str = True
            buf.append(ch)
        elif ch == ";":
            stmts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
        i += 1
    if "".join(buf).strip():
        stmts.append("".join(buf).strip())
    return [s for s in stmts if s]


@dataclass
class ExecResult:
    kind: str
    object_name: str | None
    df: DataFrame | None
    statement: str


@dataclass
class _Constraint:
    name: str
    kind: str  # 'primary key' | 'foreign key'
    columns: list[str]
    references: str | None = None
    ref_columns: list[str] = field(default_factory=list)


def _parse_options(text: str) -> dict[str, object]:
    """Parse Snowflake ``KEY = value`` option lists (values: quoted string,
    number, bare word, or parenthesized tuple of quoted strings)."""
    opts: dict[str, object] = {}
    pat = re.compile(
        r"(\w+)\s*=\s*(\((?:[^()']|'(?:[^']|'')*')*\)|'(?:[^']|'')*'|\S+)",
        re.DOTALL,
    )
    for m in pat.finditer(text):
        key, raw = m.group(1).upper(), m.group(2).strip()
        # '' unescapes to ' and \\ to \ (Snowflake string literal rules:
        # NULL_IF ('\\N') means the two-character token \N)
        if raw.startswith("("):
            vals = re.findall(r"'((?:[^']|'')*)'", raw)
            opts[key] = tuple(v.replace("''", "'").replace("\\\\", "\\") for v in vals)
        elif raw.startswith("'"):
            opts[key] = raw[1:-1].replace("''", "'").replace("\\\\", "\\")
        else:
            opts[key] = raw
    return opts


class ScriptSession:
    """Stateful executor for one reference-dialect script.

    ``stage_locations`` remaps stage URLs (or stage names) to readable
    roots; ``schema_prefix`` namespaces the Spark databases this script
    creates (tests use a prefix so CREATE OR REPLACE SCHEMA cannot drop a
    sibling suite's tables in the shared session catalog).
    """

    def __init__(
        self,
        spark: SparkSession,
        stage_locations: dict[str, str] | None = None,
        schema_prefix: str = "",
    ):
        self.spark = spark
        self.stage_locations = dict(stage_locations or {})
        self.schema_prefix = schema_prefix
        self.database: str | None = None
        self.current_schema: str | None = None
        self.schemas: set[str] = set()
        self.stages: dict[str, str] = {}
        self.file_formats: dict[str, dict[str, object]] = {}
        self.integrations: dict[str, dict[str, object]] = {}
        # external table key "schema.name" (lower) -> (view name, spec)
        self.external: dict[str, tuple[str, dict]] = {}
        self.constraints: dict[str, list[_Constraint]] = {}
        self.results: list[ExecResult] = []

    # ---------------------------------------------------------------- API

    def execute_script(self, text: str) -> list[ExecResult]:
        return [self.execute(stmt) for stmt in split_statements(text)]

    def execute(self, stmt: str) -> ExecResult:
        s = stmt.strip()
        head = re.sub(r"\s+", " ", s[:80].upper())
        handlers = [
            (r"CREATE (OR REPLACE )?DATABASE ", self._create_database),
            (r"USE DATABASE ", self._use_database),
            (r"CREATE (OR REPLACE )?SCHEMA ", self._create_schema),
            (r"USE SCHEMA ", self._use_schema),
            (r"CREATE (OR REPLACE )?STORAGE INTEGRATION ", self._create_integration),
            (r"DESCRIBE INTEGRATION ", self._describe_integration),
            (r"CREATE (OR REPLACE )?STAGE ", self._create_stage),
            (r"LIST @", self._list_stage),
            (r"CREATE (OR REPLACE )?FILE FORMAT ", self._create_file_format),
            (r"CREATE (OR REPLACE )?EXTERNAL TABLE ", self._create_external_table),
            (r"ALTER EXTERNAL TABLE ", self._alter_external_refresh),
            (r"CREATE (OR REPLACE )?TABLE [\w.]+ +AS\b", self._ctas),
            (r"CREATE (OR REPLACE )?TABLE ", self._create_table_typed),
            (r"INSERT INTO ", self._insert),
            (r"(SELECT|WITH)\b", self._select),
        ]
        for pat, fn in handlers:
            if re.match(pat, head):
                res = fn(s)
                self.results.append(res)
                return res
        raise ValueError(f"unsupported statement: {head!r}")

    def check_primary_key(self, table: str) -> None:
        """Assert a recorded PRIMARY KEY holds (NOT NULL + unique) — the
        PK-as-assertion stance of plans/staging.py applied to script-made
        tables. Raises AssertionError with the offending key count."""
        for c in self.constraints.get(table.lower(), []):
            if c.kind != "primary key":
                continue
            df = self.spark.table(self._qualify(table))
            keys = [F.col(k) for k in c.columns]
            n_null = df.filter(
                F.greatest(*[k.isNull() for k in keys])
                if len(keys) > 1
                else keys[0].isNull()
            ).count()
            assert n_null == 0, f"{table}: PK column NULL in {n_null} rows"
            dupes = df.groupBy(*c.columns).count().filter(F.col("count") > 1).count()
            assert dupes == 0, f"{table}: PK not unique for {dupes} key groups"

    # ------------------------------------------------------------ helpers

    def _db(self, schema: str) -> str:
        return f"{self.schema_prefix}{schema.lower()}"

    def _qualify(self, name: str) -> str:
        """schema.table -> prefixed Spark identifier; bare table -> current
        schema's database."""
        parts = name.split(".")
        if len(parts) == 2:
            return f"{self._db(parts[0])}.{parts[1].lower()}"
        assert self.current_schema, f"no current schema for bare name {name!r}"
        return f"{self._db(self.current_schema)}.{name.lower()}"

    def _ext_key(self, name: str) -> str:
        parts = name.lower().split(".")
        if len(parts) == 2:
            return f"{parts[0]}.{parts[1]}"
        assert self.current_schema, f"no current schema for bare name {name!r}"
        return f"{self.current_schema.lower()}.{parts[0]}"

    def _rewrite_refs(self, sql: str) -> str:
        """Rewrite external-table references to their backing temp views
        (qualified always; bare names when their schema is current), then
        prefix the script's schema-qualified catalog names."""
        for key, (view, _spec) in self.external.items():
            schema, tbl = key.split(".")
            sql = re.sub(rf"\b{schema}\.{tbl}\b", view, sql, flags=re.IGNORECASE)
            if self.current_schema and self.current_schema.lower() == schema:
                sql = re.sub(rf"(?<!\.)\b{tbl}\b(?!\.)", view, sql, flags=re.IGNORECASE)
        if self.schema_prefix:
            for schema in self.schemas:
                sql = re.sub(
                    rf"\b{schema}\.(\w+)\b",
                    lambda m, s=schema: f"{self._db(s)}.{m.group(1)}",
                    sql,
                    flags=re.IGNORECASE,
                )
        return sql

    def _run_sql(self, body: str) -> DataFrame:
        return self.spark.sql(translate(self._rewrite_refs(body)))

    # ----------------------------------------------------------- handlers

    def _create_database(self, s: str) -> ExecResult:
        name = re.match(
            r"CREATE\s+(?:OR\s+REPLACE\s+)?DATABASE\s+(\w+)", s, re.IGNORECASE
        ).group(1)
        self.database = name
        return ExecResult("database", name, None, s)

    def _use_database(self, s: str) -> ExecResult:
        name = re.match(r"USE\s+DATABASE\s+(\w+)", s, re.IGNORECASE).group(1)
        self.database = name
        return ExecResult("use_database", name, None, s)

    def _create_schema(self, s: str) -> ExecResult:
        m = re.match(
            r"CREATE\s+(OR\s+REPLACE\s+)?SCHEMA\s+(?:(\w+)\.)?(\w+)", s, re.IGNORECASE
        )
        replace, schema = bool(m.group(1)), m.group(3)
        db = self._db(schema)
        if replace:
            self.spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        self.schemas.add(schema.lower())
        self.current_schema = schema
        return ExecResult("schema", schema, None, s)

    def _use_schema(self, s: str) -> ExecResult:
        m = re.match(r"USE\s+SCHEMA\s+(?:(\w+)\.)?(\w+)", s, re.IGNORECASE)
        schema = m.group(2)
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {self._db(schema)}")
        self.spark.sql(f"USE {self._db(schema)}")
        self.schemas.add(schema.lower())
        self.current_schema = schema
        return ExecResult("use_schema", schema, None, s)

    def _create_integration(self, s: str) -> ExecResult:
        m = re.match(
            r"CREATE\s+(?:OR\s+REPLACE\s+)?STORAGE\s+INTEGRATION\s+(\w+)(.*)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        name = m.group(1)
        self.integrations[name.lower()] = _parse_options(m.group(2))
        return ExecResult("integration", name, None, s)

    def _describe_integration(self, s: str) -> ExecResult:
        name = re.match(r"DESCRIBE\s+INTEGRATION\s+(\w+)", s, re.IGNORECASE).group(1)
        props = self.integrations.get(name.lower(), {})
        rows = [(k, str(v)) for k, v in sorted(props.items())]
        df = local_df(self.spark, rows or [("", "")], "property string, value string")
        if not rows:
            df = df.filter(F.lit(False))
        return ExecResult("describe_integration", name, df, s)

    def _create_stage(self, s: str) -> ExecResult:
        m = re.match(
            r"CREATE\s+(?:OR\s+REPLACE\s+)?STAGE\s+(\w+)(.*)$", s, re.IGNORECASE | re.DOTALL
        )
        name, opts = m.group(1), _parse_options(m.group(2))
        url = str(opts.get("URL", ""))
        root = self.stage_locations.get(name, self.stage_locations.get(url, url))
        self.stages[name.lower()] = root
        return ExecResult("stage", name, None, s)

    def _stage_files(self, stage: str) -> list[str]:
        root = self.stages[stage.lower()]
        out = []
        for dirpath, _dirs, files in os.walk(root):
            out.extend(os.path.join(dirpath, f) for f in files)
        return sorted(out)

    def _list_stage(self, s: str) -> ExecResult:
        name = re.match(r"LIST\s+@(\w+)", s, re.IGNORECASE).group(1)
        files = self._stage_files(name)
        rows = [(os.path.basename(f), os.path.getsize(f)) for f in files]
        df = local_df(self.spark, rows or [("", 0)], "name string, size long")
        if not rows:
            df = df.filter(F.lit(False))
        return ExecResult("list", name, df, s)

    def _create_file_format(self, s: str) -> ExecResult:
        m = re.match(
            r"CREATE\s+(?:OR\s+REPLACE\s+)?FILE\s+FORMAT\s+(\w+)(.*)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        name = m.group(1)
        self.file_formats[name.lower()] = _parse_options(m.group(2))
        return ExecResult("file_format", name, None, s)

    def _read_external(self, spec: dict) -> DataFrame:
        """Plan (never copy) the CSV read behind an external table: regex
        PATTERN filter over the stage listing, file-format options applied
        — design.sql:49-128 semantics, csv.read_positional_csv's engine."""
        files = self._stage_files(spec["stage"])
        if spec.get("pattern"):
            rx = re.compile(spec["pattern"])
            files = [f for f in files if rx.fullmatch(os.path.basename(f)) or rx.fullmatch(f)]
        fmt = spec["format"]
        skip_header = str(fmt.get("SKIP_HEADER", "0")) == "1"
        quote = str(fmt.get("FIELD_OPTIONALLY_ENCLOSED_BY", '"'))
        delim = str(fmt.get("FIELD_DELIMITER", ","))
        null_tokens = fmt.get("NULL_IF", ())
        if not files:
            return local_df(self.spark, [], "c1 string, filename string")
        with open(files[0]) as fh:  # width probe: one local line, no Spark job
            n_cols = len(next(iter(fh)).rstrip("\n").split(delim))
        reader = self.spark.read.options(
            header=skip_header, quote=quote, escape=quote, sep=delim, mode="PERMISSIVE"
        ).schema(",".join(f"c{i + 1} string" for i in range(n_cols)))
        df = reader.csv(files)
        if null_tokens:
            df = df.na.replace(list(null_tokens), None)
        return df.withColumn("filename", split_part(F.input_file_name(), "/", -1))

    def _create_external_table(self, s: str) -> ExecResult:
        m = re.match(
            r"CREATE\s+(?:OR\s+REPLACE\s+)?EXTERNAL\s+TABLE\s+([\w.]+)\s+"
            r"WITH\s+LOCATION\s*=\s*@(\w+)\s*"
            r"FILE_FORMAT\s*=\s*(\([^)]*\)|\w+)\s*"
            r"(?:PATTERN\s*=\s*'([^']*)')?",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"cannot parse EXTERNAL TABLE: {s[:120]!r}")
        name, stage, fmt_ref, pattern = m.groups()
        if fmt_ref.startswith("("):
            fmt = _parse_options(fmt_ref[1:-1])
        else:
            fmt = self.file_formats[fmt_ref.lower()]
        key = self._ext_key(name)
        view = "__ext_" + key.replace(".", "_")
        spec = {"stage": stage, "format": fmt, "pattern": pattern}
        self._read_external(spec).createOrReplaceTempView(view)
        self.external[key] = (view, spec)
        return ExecResult("external_table", name, None, s)

    def _alter_external_refresh(self, s: str) -> ExecResult:
        name = re.match(
            r"ALTER\s+EXTERNAL\s+TABLE\s+([\w.]+)\s+REFRESH", s, re.IGNORECASE
        ).group(1)
        key = self._ext_key(name)
        view, spec = self.external[key]
        self._read_external(spec).createOrReplaceTempView(view)  # re-list files
        return ExecResult("refresh", name, None, s)

    def _ctas(self, s: str) -> ExecResult:
        m = re.match(
            r"CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+([\w.]+)\s+AS\s*(.*)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        replace, name, body = bool(m.group(1)), m.group(2), m.group(3)
        target = self._qualify(name)
        df = self._run_sql(body)
        if replace:
            self.spark.sql(f"DROP TABLE IF EXISTS {target}")
        df.write.saveAsTable(target)
        return ExecResult("ctas", name, None, s)

    def _create_table_typed(self, s: str) -> ExecResult:
        m = re.match(
            r"CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+([\w.]+)\s*\((.*)\)\s*$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        replace, name, body = bool(m.group(1)), m.group(2), m.group(3)
        cols, constraints = [], []
        for item in _split_top_commas(body):
            cm = re.match(
                r"CONSTRAINT\s+(\w+)\s+(PRIMARY\s+KEY|FOREIGN\s+KEY)\s*\(([^)]*)\)"
                r"(?:\s+REFERENCES\s+([\w.]+)\s*\(([^)]*)\))?",
                item,
                re.IGNORECASE | re.DOTALL,
            )
            if cm:
                constraints.append(
                    _Constraint(
                        name=cm.group(1),
                        kind=re.sub(r"\s+", " ", cm.group(2).lower()),
                        columns=[c.strip().lower() for c in cm.group(3).split(",")],
                        references=cm.group(4),
                        ref_columns=[
                            c.strip().lower() for c in (cm.group(5) or "").split(",") if c.strip()
                        ],
                    )
                )
                continue
            toks = item.split()
            col, typ = toks[0], toks[1].upper()
            cols.append(f"{col} {_TYPE_MAP.get(typ, typ.lower())}")
        target = self._qualify(name)
        if replace:
            self.spark.sql(f"DROP TABLE IF EXISTS {target}")
        self.spark.sql(f"CREATE TABLE {target} ({', '.join(cols)}) USING parquet")
        self.constraints[name.split(".")[-1].lower()] = constraints
        return ExecResult("create_table", name, None, s)

    def _insert(self, s: str) -> ExecResult:
        m = re.match(
            r"INSERT\s+INTO\s+([\w.]+)\s*\(([^)]*)\)\s*(.*)$", s, re.IGNORECASE | re.DOTALL
        )
        if m:
            name, col_list, body = m.group(1), m.group(2), m.group(3)
            cols = ", ".join(c.strip() for c in col_list.split(",") if c.strip())
            sql = (
                f"INSERT INTO {self._qualify(name)} ({cols}) "
                + translate(self._rewrite_refs(body))
            )
        else:
            m = re.match(r"INSERT\s+INTO\s+([\w.]+)\s*(.*)$", s, re.IGNORECASE | re.DOTALL)
            name, body = m.group(1), m.group(2)
            sql = f"INSERT INTO {self._qualify(name)} " + translate(self._rewrite_refs(body))
        self.spark.sql(sql)
        return ExecResult("insert", name, None, s)

    def _select(self, s: str) -> ExecResult:
        return ExecResult("select", None, self._run_sql(s), s)


def _split_top_commas(text: str) -> list[str]:
    """Split at commas that are at paren depth 0 AND outside quoted
    spans — ``note = 'a,b'`` must not split, and neither must a
    double-quoted span (a string literal under Spark's default parser,
    a quoted identifier under Snowflake's — opaque either way)."""
    out, depth, buf, in_q = [], 0, [], None
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if in_q and ch == "\\":
            buf.append(text[i : i + 2])
            i += 2  # Spark SQL literals honor backslash escapes (\')
            continue
        if in_q:
            if ch == in_q:
                in_q = None
        elif ch in "'\"":
            in_q = ch
        else:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                out.append("".join(buf).strip())
                buf = []
                i += 1
                continue
        buf.append(ch)
        i += 1
    if "".join(buf).strip():
        out.append("".join(buf).strip())
    return [x for x in out if x]


def run_script(
    spark: SparkSession,
    path_or_text: str,
    stage_locations: dict[str, str] | None = None,
    schema_prefix: str = "",
) -> ScriptSession:
    """Execute a reference-dialect script file (or literal text); returns
    the finished :class:`ScriptSession` for catalog inspection."""
    is_file = "\n" not in path_or_text and os.path.exists(path_or_text)
    text = open(path_or_text).read() if is_file else path_or_text
    sess = ScriptSession(spark, stage_locations, schema_prefix)
    sess.execute_script(text)
    return sess
