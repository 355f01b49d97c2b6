"""SQL-text front end for lake DML/DDL/maintenance — closes the S7
asymmetry (reference ``src/api/main.py:154-176`` accepts arbitrary SQL
strings): SELECT already runs through temp-view registration
(``catalog.py``), and this module gives SQL-speaking users the
MUTATION surface too, dispatching a small statement family onto the
existing :class:`~.lake.LakeTable` methods — no new semantics, one
grammar, loud errors.

Supported statements (case-insensitive keywords):

- ``SELECT`` / ``WITH`` / ``VALUES`` — registered lake tables become
  temp views (snapshot reads) and the statement runs through
  ``spark.sql`` with Spark's own parser/optimizer. ``FROM t VERSION AS
  OF n`` / ``t TIMESTAMP AS OF '<ts>'`` rewrite to snapshot views
  (quote-aware — string literals never rewrite).
- ``INSERT INTO|OVERWRITE t [(cols)] SELECT …|VALUES …`` →
  ``append``/``overwrite`` (positional column binding; engine-assigned
  columns excluded from the default target list).
- ``CREATE TABLE t (col TYPE, …) [PARTITIONED BY (…)] [LOCATION '…']
  [TBLPROPERTIES (…)]`` and CTAS ``CREATE TABLE t AS SELECT …`` →
  ``LakeTable.create`` (auto-registers; LOCATION or runner
  ``base_dir`` names the path).
- ``SHOW PARTITIONS t`` / ``SHOW TBLPROPERTIES t`` — DataFrames.
- ``MERGE INTO t [AS tgt] USING (<subquery>)|<view> [AS src] ON <cond>
  WHEN MATCHED [AND c] THEN UPDATE SET col=e,…|SET *|DELETE
  WHEN NOT MATCHED [AND c] THEN INSERT (cols) VALUES (exprs)|INSERT *
  WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET …|DELETE``
  → :meth:`LakeTable.merge_into` (aliases are pinned to ``tgt``/
  ``src`` — the engine's merge aliases; supplying others errors).
- ``UPDATE t SET col = expr[, …] [WHERE pred]`` → ``update``.
- ``DELETE FROM t [WHERE pred]`` → ``delete``.
- ``ALTER TABLE t ADD CONSTRAINT name CHECK (pred)`` /
  ``DROP CONSTRAINT name`` → ``add_constraint``/``drop_constraint``.
- ``ALTER TABLE t RENAME COLUMN a TO b`` / ``DROP COLUMN c`` →
  ``rename_column``/``drop_column``.
- ``ALTER TABLE t SET TBLPROPERTIES ('k'='v', …)`` /
  ``UNSET TBLPROPERTIES ('k', …)`` → ``set_properties``/``unset_properties``.
- ``ALTER TABLE t ALTER COLUMN c SET DEFAULT expr | DROP DEFAULT`` →
  ``set_column_default``/``drop_column_default``.
- ``ALTER TABLE t CLUSTER BY (a[, b…]) | CLUSTER BY NONE`` →
  ``set_cluster_by``.
- ``OPTIMIZE t [WHERE pred] [ZORDER BY (a[, b…])]`` → ``compact``
  (single column → range-cluster, several → z-order; table
  ``clusterBy`` props apply when no ZORDER is given).
- ``VACUUM t [RETAIN n HOURS] [DRY RUN]`` → ``vacuum``.
- ``RESTORE [TABLE] t TO VERSION AS OF n |
  TO TIMESTAMP AS OF '<ts>'`` → ``restore``.
- ``DESCRIBE HISTORY t`` / ``DESCRIBE DETAIL t`` — DataFrames.

Injection safety: every statement accepts named parameters
(``:name``), bound as TYPED SQL literals by :func:`_bind` — keys and
values arrive as data, never spliced by the caller into the SQL text;
strings escape by quote-doubling, datetimes render as TIMESTAMP
literals. Identifiers (table/column/constraint names) validate against
a strict regex before touching any API.
"""

from __future__ import annotations

import datetime
import json
import re

from pyspark.sql import DataFrame, SparkSession

from .lake import LakeTable

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(name: str, what: str = "identifier") -> str:
    name = name.strip().strip("`")
    if not _IDENT.match(name):
        raise ValueError(f"invalid {what}: {name!r}")
    return name


def _sql_literal(v) -> str:
    """Render a python value as a SQL literal — the ONLY way parameter
    values enter statement text (never caller-side splicing)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    raise TypeError(
        f"unsupported parameter type {type(v).__name__} (scalar "
        "int/float/str/bool/None/date/datetime only)"
    )


_PARAM = re.compile(r"(?<![:\w]):([A-Za-z_][A-Za-z0-9_]*)")


def _bind(sql: str, params: dict | None) -> str:
    """Substitute ``:name`` markers OUTSIDE string literals with typed
    SQL literals. Unknown markers raise (a typo must not silently ride
    into the engine as the literal text ``:nmae``)."""
    if not params:
        return sql
    out: list[str] = []
    i, n = 0, len(sql)
    used: set[str] = set()
    while i < n:
        ch = sql[i]
        if ch in ("'", '"'):
            j = i + 1
            while j < n:
                if sql[j] == ch:
                    if j + 1 < n and sql[j + 1] == ch:  # doubled quote
                        j += 2
                        continue
                    break
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
            continue
        m = _PARAM.match(sql, i)
        if m:
            name = m.group(1)
            if name not in params:
                raise KeyError(f"unbound SQL parameter :{name}")
            used.add(name)
            out.append(_sql_literal(params[name]))
            i = m.end()
            continue
        out.append(ch)
        i += 1
    unused = set(params) - used
    if unused:
        raise ValueError(f"parameter(s) never referenced: {sorted(unused)}")
    return "".join(out)


def _split_top(text: str, keyword: str) -> list[str]:
    """Split on a keyword occurring at paren-depth 0 outside string
    literals (case-insensitive, word-bounded). Returns the segments;
    the keyword itself is dropped."""
    kw = keyword.upper()
    klen = len(kw)
    parts: list[str] = []
    depth, i, n, start = 0, 0, len(text), 0
    while i < n:
        ch = text[i]
        if ch in ("'", '"'):
            q = ch
            i += 1
            while i < n:
                if text[i] == q:
                    if i + 1 < n and text[i + 1] == q:
                        i += 2
                        continue
                    break
                i += 1
            i += 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and text[i : i + klen].upper() == kw:
            # word boundaries only apply to WORD keywords (a comma
            # splitter must split right after an identifier)
            wordish = kw[0].isalnum() or kw[0] == "_"
            before_ok = not wordish or i == 0 or not (
                text[i - 1].isalnum() or text[i - 1] == "_"
            )
            after = i + klen
            after_ok = not wordish or after >= n or not (
                text[after].isalnum() or text[after] == "_"
            )
            if before_ok and after_ok:
                parts.append(text[start:i])
                start = i + klen
                i = start
                continue
        i += 1
    parts.append(text[start:])
    return parts


class LakeSqlRunner:
    """Dispatch SQL statements over a set of named lake tables.

    ``tables``: {name: LakeTable | path}. SELECT statements see every
    table as a temp view (fresh snapshot per call); DML/DDL statements
    resolve the table by name and call the matching engine method.
    """

    def __init__(
        self, spark: SparkSession, tables: dict, base_dir: str | None = None
    ):
        self.spark = spark
        self.base_dir = base_dir  # CREATE TABLE without LOCATION lands here
        self.tables: dict[str, LakeTable] = {}
        for name, t in tables.items():
            self.register(name, t)

    def register(self, name: str, table) -> None:
        name = _check_ident(name, "table name")
        self.tables[name] = (
            table
            if isinstance(table, LakeTable)
            else LakeTable.load(self.spark, str(table))
        )

    def _table(self, name: str) -> LakeTable:
        name = _check_ident(name, "table name")
        t = self.tables.get(name)
        if t is None:
            raise ValueError(
                f"unknown table {name!r} (registered: {sorted(self.tables)})"
            )
        return t

    # ----------------------------------------------------------- entry
    def sql(self, statement: str, params: dict | None = None):
        """Run one statement. Returns a DataFrame for SELECT/DESCRIBE/
        SHOW, the underlying method's result (version int or metrics
        dict) for mutations."""
        stmt = _bind(statement.strip().rstrip(";"), params)
        head = stmt.split(None, 1)[0].upper() if stmt.split() else ""
        if head in ("SELECT", "WITH", "VALUES"):
            return self._select(stmt)
        if head == "MERGE":
            return self._merge(stmt)
        if head == "UPDATE":
            return self._update(stmt)
        if head == "DELETE":
            return self._delete(stmt)
        if head == "INSERT":
            return self._insert(stmt)
        if head == "CREATE":
            return self._create(stmt)
        if head == "ALTER":
            return self._alter(stmt)
        if head == "OPTIMIZE":
            return self._optimize(stmt)
        if head == "VACUUM":
            return self._vacuum(stmt)
        if head == "RESTORE":
            return self._restore(stmt)
        if head == "DESCRIBE":
            return self._describe(stmt)
        if head == "SHOW":
            return self._show(stmt)
        raise ValueError(
            f"unsupported statement {head!r} — supported: SELECT/WITH, "
            "MERGE, UPDATE, DELETE, INSERT, CREATE TABLE, ALTER TABLE, "
            "OPTIMIZE, VACUUM, RESTORE, DESCRIBE HISTORY/DETAIL, "
            "SHOW PARTITIONS/TBLPROPERTIES"
        )

    # ----------------------------------------------------------- SELECT
    _ASOF_RE = re.compile(
        r"\b([A-Za-z_][A-Za-z0-9_]*)\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+"
        r"(\d+|'[^']*')",
        re.I,
    )

    def _rewrite_asof(self, stmt: str) -> str:
        """``FROM t VERSION AS OF n`` / ``t TIMESTAMP AS OF '<ts>'``
        inside a SELECT: each occurrence of a REGISTERED table is
        rewritten to a generated snapshot view (registered on the fly
        via ordinary time travel). Quote-aware via string-literal
        SPANS (not segmentation — the timestamp argument is itself a
        quoted literal): a match whose table name starts inside a
        string literal is left untouched."""
        spans: list[tuple[int, int]] = []
        i, n = 0, len(stmt)
        while i < n:
            ch = stmt[i]
            if ch in ("'", '"'):
                j = i + 1
                while j < n:
                    if stmt[j] == ch:
                        if j + 1 < n and stmt[j + 1] == ch:
                            j += 2
                            continue
                        break
                    j += 1
                spans.append((i, j + 1))
                i = j + 1
                continue
            i += 1

        def sub(m: re.Match) -> str:
            if any(a <= m.start() < b for a, b in spans):
                return m.group(0)  # inside a string literal
            name = m.group(1)
            if name not in self.tables:
                return m.group(0)
            kind = m.group(2).upper()
            arg = m.group(3)
            t = self.tables[name]
            if kind == "VERSION":
                df = t.read(int(arg))
                view = f"{name}__asof_v{arg}"
            else:
                import hashlib

                ts = arg[1:-1]
                df = t.read(timestamp=ts)
                view = (
                    f"{name}__asof_t"
                    f"{hashlib.md5(ts.encode()).hexdigest()[:10]}"
                )
            df.createOrReplaceTempView(view)
            return view

        return self._ASOF_RE.sub(sub, stmt)

    def _select(self, stmt: str) -> DataFrame:
        for name, t in self.tables.items():
            t.read().createOrReplaceTempView(name)
        return self.spark.sql(self._rewrite_asof(stmt))

    # ------------------------------------------------------------ MERGE
    _MERGE_HEAD = re.compile(
        r"^MERGE\s+INTO\s+(?P<tgt>[\w`]+)(?:\s+AS\s+(?P<talias>\w+))?\s+"
        r"USING\s+(?P<src>\(.*?\)|[\w`]+)(?:\s+AS\s+(?P<salias>\w+))?\s+"
        r"ON\s+",
        re.I | re.S,
    )

    def _merge(self, stmt: str):
        m = self._MERGE_HEAD.match(stmt)
        if not m:
            raise ValueError(
                "malformed MERGE — expected: MERGE INTO t [AS tgt] USING "
                "(<subquery>)|<view> [AS src] ON <cond> WHEN …"
            )
        if m.group("talias") and m.group("talias").lower() != "tgt":
            raise ValueError(
                "MERGE target alias must be 'tgt' (the engine's alias; "
                f"got {m.group('talias')!r})"
            )
        if m.group("salias") and m.group("salias").lower() != "src":
            raise ValueError(
                "MERGE source alias must be 'src' (the engine's alias; "
                f"got {m.group('salias')!r})"
            )
        t = self._table(m.group("tgt"))
        src_txt = m.group("src").strip()
        if src_txt.startswith("("):
            for name, tab in self.tables.items():
                tab.read().createOrReplaceTempView(name)
            source = self.spark.sql(src_txt[1:-1])
        else:
            sname = _check_ident(src_txt, "source")
            if sname in self.tables:
                source = self.tables[sname].read()
            else:
                source = self.spark.table(sname)  # a registered temp view
        rest = stmt[m.end() :]
        segs = _split_top(rest, "WHEN")
        on_cond = segs[0].strip()
        if not on_cond:
            raise ValueError("MERGE: empty ON condition")
        clauses = [self._merge_clause(s) for s in segs[1:]]
        if not clauses:
            raise ValueError("MERGE: at least one WHEN clause required")
        return t.merge_into(source, on_cond, clauses)

    _CLAUSE_RE = re.compile(
        r"^\s*(?P<kind>MATCHED|NOT\s+MATCHED(?:\s+BY\s+SOURCE)?)\s*"
        r"(?:AND\s+(?P<cond>.*?))?\s*THEN\s+(?P<act>.*)$",
        re.I | re.S,
    )

    def _merge_clause(self, seg: str) -> dict:
        m = self._CLAUSE_RE.match(seg)
        if not m:
            raise ValueError(f"malformed MERGE clause: WHEN {seg.strip()!r}")
        kind = re.sub(r"\s+", " ", m.group("kind").upper())
        when = {
            "MATCHED": "matched",
            "NOT MATCHED": "not_matched",
            "NOT MATCHED BY SOURCE": "not_matched_by_source",
        }[kind]
        cond = m.group("cond").strip() if m.group("cond") else None
        act = m.group("act").strip()
        up = act.upper()
        out: dict = {"when": when, "condition": cond}
        if up == "DELETE":
            out["action"] = "delete"
            return out
        if up.startswith("UPDATE"):
            rest = act[len("UPDATE") :].strip()
            if not rest.upper().startswith("SET"):
                raise ValueError(f"UPDATE without SET in clause: {act!r}")
            rest = rest[3:].strip()
            out["action"] = "update"
            out["set"] = "all" if rest == "*" else self._assignments(rest)
            return out
        if up.startswith("INSERT"):
            rest = act[len("INSERT") :].strip()
            out["action"] = "insert"
            if rest == "*":
                out["values"] = "all"
                return out
            mm = re.match(
                r"^\((?P<cols>[^)]*)\)\s*VALUES\s*\((?P<vals>.*)\)\s*$",
                rest,
                re.I | re.S,
            )
            if not mm:
                raise ValueError(
                    f"malformed INSERT in MERGE clause: {act!r} — expected "
                    "INSERT * or INSERT (cols) VALUES (exprs)"
                )
            cols = [
                _check_ident(c, "column") for c in mm.group("cols").split(",")
            ]
            vals = _split_top(mm.group("vals"), ",")
            if len(cols) != len(vals):
                raise ValueError(
                    f"INSERT column/value count mismatch: {len(cols)} vs "
                    f"{len(vals)}"
                )
            out["values"] = {c: v.strip() for c, v in zip(cols, vals)}
            return out
        raise ValueError(f"unsupported MERGE action: {act!r}")

    @staticmethod
    def _assignments(text: str) -> dict[str, str]:
        out: dict[str, str] = {}
        for part in _split_top(text, ","):
            if "=" not in part:
                raise ValueError(f"malformed assignment: {part.strip()!r}")
            col, expr = part.split("=", 1)
            col = col.strip()
            # tgt.col / bare col both allowed in MERGE SET (Delta form)
            if "." in col:
                qual, col = col.split(".", 1)
                if qual.strip().lower() != "tgt":
                    raise ValueError(
                        f"assignment target must be tgt.<col>, got {qual!r}"
                    )
            out[_check_ident(col, "column")] = expr.strip()
        return out

    # --------------------------------------------------------- UPDATE
    _UPDATE_RE = re.compile(
        r"^UPDATE\s+(?P<t>[\w`]+)\s+SET\s+(?P<set>.*?)"
        r"(?:\s+WHERE\s+(?P<pred>.*))?$",
        re.I | re.S,
    )

    def _update(self, stmt: str):
        m = self._UPDATE_RE.match(stmt)
        if not m:
            raise ValueError("malformed UPDATE — UPDATE t SET c=e[, …] [WHERE p]")
        t = self._table(m.group("t"))
        pred = (m.group("pred") or "true").strip()
        return t.update(pred, self._assignments(m.group("set")))

    # --------------------------------------------------------- DELETE
    _DELETE_RE = re.compile(
        r"^DELETE\s+FROM\s+(?P<t>[\w`]+)(?:\s+WHERE\s+(?P<pred>.*))?$",
        re.I | re.S,
    )

    def _delete(self, stmt: str):
        m = self._DELETE_RE.match(stmt)
        if not m:
            raise ValueError("malformed DELETE — DELETE FROM t [WHERE p]")
        t = self._table(m.group("t"))
        return t.delete((m.group("pred") or "true").strip())

    # --------------------------------------------------------- INSERT
    _INSERT_RE = re.compile(
        r"^INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?P<t>[\w`]+)"
        r"(?:\s*\((?P<cols>[^)]*)\))?\s+(?P<body>.*)$",
        re.I | re.S,
    )

    def _insert(self, stmt: str):
        """``INSERT INTO t [(cols)] SELECT …|VALUES …`` → append;
        ``INSERT OVERWRITE t …`` → overwrite. Column binding is
        POSITIONAL (standard INSERT semantics): the query/VALUES
        columns map to the listed columns, or to the table's columns
        in order when no list is given; identity/generated columns the
        engine assigns must be omitted from the list."""
        m = self._INSERT_RE.match(stmt)
        if not m:
            raise ValueError(
                "malformed INSERT — INSERT INTO|OVERWRITE t [(cols)] "
                "SELECT …|VALUES …"
            )
        t = self._table(m.group("t"))
        body = m.group("body").strip()
        if not re.match(r"^(SELECT|WITH|VALUES|\()", body, re.I):
            raise ValueError(f"INSERT body must be SELECT/VALUES, got {body[:30]!r}")
        df = self._select(body[1:-1] if body.startswith("(") else body)
        from .lake import _gen_expr, _identity_spec

        _, _, schema = t._snapshot()
        if m.group("cols"):
            cols = [
                _check_ident(c, "column") for c in m.group("cols").split(",")
            ]
        else:
            # engine-assigned columns can't be targets of a bare INSERT
            cols = [
                f.name
                for f in schema.fields
                if not _gen_expr(f) and not _identity_spec(f)
            ]
        if len(df.columns) != len(cols):
            raise ValueError(
                f"INSERT column count mismatch: statement provides "
                f"{len(df.columns)} columns for targets {cols}"
            )
        from pyspark.sql import functions as F

        by_name = {f.name: f for f in schema.fields}
        unknown = [c for c in cols if c not in by_name]
        if unknown:
            raise ValueError(f"INSERT: no such column(s) {unknown}")
        # standard INSERT coercion: each positional value casts to its
        # target column's type (VALUES integer literals arrive as INT)
        df = df.toDF(*cols).select(
            *[F.col(c).cast(by_name[c].dataType).alias(c) for c in cols]
        )
        if m.group("mode").upper() == "OVERWRITE":
            return t.overwrite(df)
        return t.append(df)

    # --------------------------------------------------------- CREATE
    _CREATE_TAIL = re.compile(
        r"^(?:PARTITIONED\s+BY\s*\((?P<part>[^)]*)\)\s*)?"
        r"(?:LOCATION\s+'(?P<loc>[^']+)'\s*)?"
        r"(?:TBLPROPERTIES\s*\((?P<props>.*?)\)\s*)?"
        r"(?:AS\s+(?P<query>(?:SELECT|WITH|VALUES).*))?$",
        re.I | re.S,
    )

    @staticmethod
    def _matching_paren(text: str, start: int) -> int:
        """Index of the ')' matching text[start] == '(' — quote-aware."""
        depth, i, n = 0, start, len(text)
        while i < n:
            ch = text[i]
            if ch in ("'", '"'):
                q = ch
                i += 1
                while i < n and text[i] != q:
                    i += 1
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return i
            i += 1
        raise ValueError("unbalanced parentheses in CREATE TABLE")

    def _create(self, stmt: str):
        """``CREATE TABLE t (a BIGINT, …) [PARTITIONED BY (…)]
        [LOCATION '…'] [TBLPROPERTIES (…)]`` and CTAS
        (``CREATE TABLE t [LOCATION …] AS SELECT …``). Without
        LOCATION the runner's ``base_dir`` names the path; the new
        table auto-registers under its name. Column definitions take
        the full option set (see :meth:`_parse_create_columns`) —
        extracted by a balanced-paren scan so generated expressions
        and IDENTITY(START WITH …) nest freely."""
        hm = re.match(
            r"^CREATE\s+TABLE\s+(?P<t>[\w`]+)\s*(?P<rest>.*)$", stmt, re.I | re.S
        )
        if not hm:
            raise ValueError("malformed CREATE TABLE")
        name = _check_ident(hm.group("t"), "table name")
        if name in self.tables:
            raise ValueError(f"table {name!r} already registered")
        rest = hm.group("rest").strip()
        cols_text = None
        if rest.startswith("("):
            end = self._matching_paren(rest, 0)
            cols_text = rest[1:end]
            rest = rest[end + 1 :].strip()
        m = self._CREATE_TAIL.match(rest)
        if not m or (cols_text is None and not m.group("query")):
            raise ValueError(
                "malformed CREATE TABLE — CREATE TABLE t (col TYPE [opts], …) "
                "[PARTITIONED BY (…)] [LOCATION '…'] [TBLPROPERTIES (…)] "
                "| CREATE TABLE t [LOCATION '…'] AS SELECT …"
            )
        loc = m.group("loc")
        if loc is None:
            if self.base_dir is None:
                raise ValueError(
                    "CREATE TABLE needs LOCATION '…' (or construct the "
                    "runner with base_dir=…)"
                )
            import os as _os

            loc = _os.path.join(self.base_dir, name)
        create_kwargs: dict = {}
        not_nulls: list[str] = []
        if m.group("query"):
            df = self._select(m.group("query").strip())
        else:
            df, create_kwargs, not_nulls = self._parse_create_columns(
                cols_text
            )
        partition_by = None
        if m.group("part"):
            partition_by = [
                _check_ident(c, "column") for c in m.group("part").split(",")
            ]
        t = LakeTable.create(
            self.spark, loc, df, partition_by=partition_by, **create_kwargs
        )
        for c in not_nulls:
            t.add_not_null(c)
        if m.group("props"):
            updates: dict[str, str] = {}
            for item in _split_top(m.group("props"), ","):
                if "=" not in item:
                    raise ValueError(f"malformed property: {item.strip()!r}")
                k, val = item.split("=", 1)
                updates[self._unquote(k.strip())] = self._unquote(val.strip())
            t.set_properties(updates)
        self.tables[name] = t
        return t

    _IDENTITY_OPT = re.compile(
        r"^GENERATED\s+(ALWAYS|BY\s+DEFAULT)\s+AS\s+IDENTITY\s*"
        r"(?:\(\s*START\s+WITH\s+(-?\d+)\s+INCREMENT\s+BY\s+(-?\d+)\s*\))?"
        r"\s*$",
        re.I,
    )

    def _parse_create_columns(self, cols_text: str):
        """CREATE TABLE column list with per-column options (Delta DDL
        parity): ``GENERATED ALWAYS AS (expr)``, ``GENERATED ALWAYS |
        BY DEFAULT AS IDENTITY [(START WITH n INCREMENT BY m)]``,
        ``DEFAULT expr``, trailing ``NOT NULL`` (becomes a named CHECK
        constraint). Returns (empty frame of the PLAIN columns,
        create() kwargs, not-null column list)."""
        plain: list[tuple[str, str]] = []
        gens: dict[str, str] = {}
        idents: dict[str, dict] = {}
        defaults: dict[str, str] = {}
        not_nulls: list[str] = []
        for item in _split_top(cols_text, ","):
            txt = item.strip()
            mm = re.match(r"^([\w`]+)\s+(.*)$", txt, re.S)
            if not mm:
                raise ValueError(f"malformed column definition: {txt!r}")
            name = _check_ident(mm.group(1), "column")
            rest = mm.group(2).strip()
            opt = re.search(r"\b(GENERATED|DEFAULT|NOT\s+NULL)\b", rest, re.I)
            typ = (rest[: opt.start()] if opt else rest).strip()
            opts = rest[opt.start() :].strip() if opt else ""
            if not typ and not re.match(r"^GENERATED", opts, re.I):
                raise ValueError(f"column {name!r}: missing type")
            if re.search(r"\bNOT\s+NULL\s*$", opts, re.I):
                not_nulls.append(name)
                opts = re.sub(r"\s*NOT\s+NULL\s*$", "", opts, flags=re.I)
            if not opts:
                from pyspark.sql.types import _parse_datatype_string

                try:
                    _parse_datatype_string(typ)
                except Exception:
                    raise ValueError(
                        f"column {name!r}: unsupported option or type "
                        f"{typ!r}"
                    ) from None
                plain.append((name, typ))
                continue
            gm = re.match(
                r"^GENERATED\s+ALWAYS\s+AS\s*\((.+)\)\s*$", opts, re.I | re.S
            )
            if gm:
                gens[name] = gm.group(1).strip()
                continue
            im = self._IDENTITY_OPT.match(opts)
            if im:
                if typ.upper() not in ("BIGINT", "LONG"):
                    raise ValueError(
                        f"identity column {name!r} must be BIGINT, got "
                        f"{typ or '<none>'}"
                    )
                idents[name] = {
                    "start": int(im.group(2) or 1),
                    "step": int(im.group(3) or 1),
                    "always": im.group(1).upper() == "ALWAYS",
                }
                continue
            dm = re.match(r"^DEFAULT\s+(.+)$", opts, re.I | re.S)
            if dm:
                plain.append((name, typ))
                defaults[name] = dm.group(1).strip()
                continue
            raise ValueError(
                f"column {name!r}: unsupported option {opts!r}"
            )
        if not plain:
            raise ValueError(
                "CREATE TABLE needs at least one plain data column"
            )
        df = self.spark.createDataFrame(
            [], ", ".join(f"{n} {t}" for n, t in plain)
        )
        kwargs: dict = {}
        if gens:
            kwargs["generated_columns"] = gens
        if idents:
            kwargs["identity_columns"] = idents
        if defaults:
            kwargs["column_defaults"] = defaults
        return df, kwargs, not_nulls

    # ----------------------------------------------------------- SHOW
    def _show(self, stmt: str) -> DataFrame:
        m = re.match(
            r"^SHOW\s+(?P<kind>PARTITIONS|TBLPROPERTIES)\s+(?P<t>[\w`]+)\s*$",
            stmt,
            re.I,
        )
        if not m:
            raise ValueError("malformed SHOW — SHOW PARTITIONS|TBLPROPERTIES t")
        t = self._table(m.group("t"))
        if m.group("kind").upper() == "PARTITIONS":
            parts = t.partitions()
            rows = [(json.dumps(p, sort_keys=True, default=str),) for p in parts]
            return self.spark.createDataFrame(rows or [], "partition string")
        rows = sorted((k, str(v)) for k, v in t.props().items())
        return self.spark.createDataFrame(rows or [], "key string, value string")

    # ---------------------------------------------------------- ALTER
    def _alter(self, stmt: str):
        m = re.match(
            r"^ALTER\s+TABLE\s+(?P<t>[\w`]+)\s+(?P<rest>.*)$", stmt, re.I | re.S
        )
        if not m:
            raise ValueError("malformed ALTER TABLE")
        t = self._table(m.group("t"))
        rest = m.group("rest").strip()
        up = rest.upper()
        mm = re.match(
            r"^ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.*)\)\s*$", rest, re.I | re.S
        )
        if mm:
            return t.add_constraint(
                _check_ident(mm.group(1), "constraint"), mm.group(2).strip()
            )
        mm = re.match(r"^DROP\s+CONSTRAINT\s+(\w+)\s*$", rest, re.I)
        if mm:
            return t.drop_constraint(_check_ident(mm.group(1), "constraint"))
        mm = re.match(r"^RENAME\s+COLUMN\s+([\w`]+)\s+TO\s+([\w`]+)\s*$", rest, re.I)
        if mm:
            return t.rename_column(
                _check_ident(mm.group(1), "column"),
                _check_ident(mm.group(2), "column"),
            )
        mm = re.match(r"^DROP\s+COLUMN\s+([\w`]+)\s*$", rest, re.I)
        if mm:
            return t.drop_column(_check_ident(mm.group(1), "column"))
        mm = re.match(
            r"^ADD\s+COLUMN\s+([\w`]+)\s+(.+?)"
            r"(?:\s+DEFAULT\s+(.+?))?"
            r"(?:\s+GENERATED\s+ALWAYS\s+AS\s*\((.+)\))?\s*$",
            rest,
            re.I | re.S,
        )
        if mm:
            col = _check_ident(mm.group(1), "column")
            if mm.group(4):
                if mm.group(3):
                    raise ValueError(
                        "a generated column cannot also take a DEFAULT"
                    )
                return t.add_generated_column(col, mm.group(4).strip())
            return t.add_column(
                col,
                mm.group(2).strip(),
                default=mm.group(3).strip() if mm.group(3) else None,
            )
        mm = re.match(
            r"^(UN)?SET\s+TBLPROPERTIES\s*\((.*)\)\s*$", rest, re.I | re.S
        )
        if mm:
            items = [p.strip() for p in _split_top(mm.group(2), ",")]
            if mm.group(1):  # UNSET
                return t.unset_properties([self._unquote(k) for k in items])
            updates: dict[str, str] = {}
            for item in items:
                if "=" not in item:
                    raise ValueError(f"malformed property: {item!r}")
                k, v = item.split("=", 1)
                updates[self._unquote(k.strip())] = self._unquote(v.strip())
            return t.set_properties(updates)
        mm = re.match(
            r"^ALTER\s+COLUMN\s+([\w`]+)\s+SET\s+DEFAULT\s+(.*)$", rest, re.I | re.S
        )
        if mm:
            return t.set_column_default(
                _check_ident(mm.group(1), "column"), mm.group(2).strip()
            )
        mm = re.match(
            r"^ALTER\s+COLUMN\s+([\w`]+)\s+DROP\s+DEFAULT\s*$", rest, re.I
        )
        if mm:
            return t.drop_column_default(_check_ident(mm.group(1), "column"))
        if up.startswith("CLUSTER BY"):
            arg = rest[len("CLUSTER BY") :].strip()
            if arg.upper() == "NONE":
                return t.set_cluster_by(None)
            mm = re.match(r"^\((.*)\)$", arg, re.S)
            if not mm:
                raise ValueError("CLUSTER BY needs (col[, …]) or NONE")
            return t.set_cluster_by(
                [_check_ident(c, "column") for c in mm.group(1).split(",")]
            )
        raise ValueError(f"unsupported ALTER TABLE form: {rest!r}")

    @staticmethod
    def _unquote(s: str) -> str:
        s = s.strip()
        if len(s) >= 2 and s[0] == s[-1] and s[0] in ("'", '"'):
            return s[1:-1].replace(s[0] * 2, s[0])
        return s

    # ------------------------------------------------------- OPTIMIZE
    _OPT_RE = re.compile(
        r"^OPTIMIZE\s+(?P<t>[\w`]+)"
        r"(?:\s+WHERE\s+(?P<pred>.*?))?"
        r"(?:\s+ZORDER\s+BY\s*\((?P<z>[^)]*)\))?\s*$",
        re.I | re.S,
    )

    def _optimize(self, stmt: str):
        m = self._OPT_RE.match(stmt)
        if not m:
            raise ValueError(
                "malformed OPTIMIZE — OPTIMIZE t [WHERE p] [ZORDER BY (cols)]"
            )
        t = self._table(m.group("t"))
        kwargs: dict = {}
        if m.group("pred"):
            kwargs["where"] = m.group("pred").strip()
        if m.group("z"):
            cols = [_check_ident(c, "column") for c in m.group("z").split(",")]
            kwargs["cluster_by"] = cols if len(cols) > 1 else cols[0]
        return t.compact(**kwargs)

    # --------------------------------------------------------- VACUUM
    _VAC_RE = re.compile(
        r"^VACUUM\s+(?P<t>[\w`]+)"
        r"(?:\s+RETAIN\s+(?P<h>\d+(?:\.\d+)?)\s+HOURS)?"
        r"(?:\s+(?P<dry>DRY\s+RUN))?\s*$",
        re.I,
    )

    def _vacuum(self, stmt: str):
        m = self._VAC_RE.match(stmt)
        if not m:
            raise ValueError(
                "malformed VACUUM — VACUUM t [RETAIN n HOURS] [DRY RUN]"
            )
        t = self._table(m.group("t"))
        return t.vacuum(
            retain_hours=float(m.group("h")) if m.group("h") else None,
            dry_run=bool(m.group("dry")),
        )

    # -------------------------------------------------------- RESTORE
    _RESTORE_RE = re.compile(
        r"^RESTORE\s+(?:TABLE\s+)?(?P<t>[\w`]+)\s+TO\s+"
        r"(?:VERSION\s+AS\s+OF\s+(?P<v>\d+)|TIMESTAMP\s+AS\s+OF\s+"
        r"'(?P<ts>[^']*)')\s*$",
        re.I,
    )

    def _restore(self, stmt: str):
        m = self._RESTORE_RE.match(stmt)
        if not m:
            raise ValueError(
                "malformed RESTORE — RESTORE [TABLE] t TO VERSION AS OF n | "
                "TO TIMESTAMP AS OF '<ts>'"
            )
        t = self._table(m.group("t"))
        if m.group("v") is not None:
            return t.restore(int(m.group("v")))
        return t.restore(timestamp=m.group("ts"))

    # ------------------------------------------------------- DESCRIBE
    def _describe(self, stmt: str) -> DataFrame:
        m = re.match(
            r"^DESCRIBE\s+(?P<kind>HISTORY|DETAIL)\s+(?P<t>[\w`]+)\s*$",
            stmt,
            re.I,
        )
        if not m:
            raise ValueError("malformed DESCRIBE — DESCRIBE HISTORY|DETAIL t")
        t = self._table(m.group("t"))
        if m.group("kind").upper() == "HISTORY":
            rows = [
                (
                    int(h["version"]),
                    str(h["op"]),
                    float(h.get("ts", 0.0)),
                    int(h.get("added_files", 0)),
                    int(h.get("removed_files", 0)),
                )
                for h in t.history()
            ]
            return self.spark.createDataFrame(
                rows,
                "version long, operation string, ts double, "
                "num_added_files long, num_removed_files long",
            )
        d = t.details()
        import json as _json

        return self.spark.createDataFrame(
            [(_json.dumps(d, default=str),)], "detail_json string"
        )


def lake_sql(spark: SparkSession, statement: str, tables: dict, params=None):
    """One-shot convenience: run a single statement over named tables."""
    return LakeSqlRunner(spark, tables).sql(statement, params)
