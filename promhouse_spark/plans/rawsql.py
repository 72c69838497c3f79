"""Raw-SQL passthrough (O7) + result shaping (X8).

Trigger (``storages/clickhouse/clickhouse.go:374-388``): a read request with
exactly one query carrying exactly two equality matchers
``{job="rawsql", query="<SQL>"}`` bypasses series selection entirely and runs
the SQL verbatim. ``Start`` is ignored; ``End`` becomes every result sample's
timestamp.

Result shaping (``storages/clickhouse/rawsql.go:25-93``): every result row
becomes one TimeSeries with a single sample — each column turns into a label
(stringified, column order preserved); a column literally named ``value``
becomes the sample's float value instead (0.0 when absent or non-numeric).

In this engine the SQL dialect is Spark SQL, which makes the full Spark
operator surface (joins, grouping sets, windows, approx aggregates, …)
reachable through the reference-compatible API.
"""

from __future__ import annotations

import math
import re
from typing import Sequence

from pyspark.sql import SparkSession

from promhouse_spark.models import MatchType, Query, Sample, TimeSeries, Label

RAWSQL_JOB = "rawsql"

# --------------------------------------------- ClickHouse-dialect shims
# The reference README's documented analytics (README.md:74-119) are written
# in ClickHouse SQL. These rewrites cover exactly the constructs those
# queries use, so they run verbatim through the escape hatch; every pattern
# below is a parse error in Spark SQL, so the rewrite can never fire on
# valid Spark SQL (strings inside literals excepted — documented caveat).

_CH_VISITPARAM = re.compile(
    r"visitParamExtractString\s*\(\s*([A-Za-z_][\w.]*)\s*,\s*'([^']*)'\s*\)"
)
_CH_ANY_JOIN = re.compile(r"\bANY\s+((?:INNER|LEFT|RIGHT)\s+)?JOIN\b", re.IGNORECASE)
_CH_CLAUSE_END = re.compile(r"\b(ORDER\s+BY|HAVING|LIMIT|WINDOW)\b", re.IGNORECASE)
_CH_GROUPBY = re.compile(r"\bGROUP\s+BY\b", re.IGNORECASE)


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside parentheses."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return out


def _hoist_groupby_aliases(sql: str) -> str:
    """ClickHouse allows ``GROUP BY <expr> AS <alias>`` with the alias
    visible in SELECT; Spark resolves it the other way around (SELECT-list
    aliases are usable in GROUP BY). Hoist each aliased expr into the SELECT
    list and group by the alias.

    Each GROUP BY is handled against its OWN query block: the enclosing
    SELECT is the last one before that GROUP BY (so a subquery's aliased
    GROUP BY never leaks its expr into the outer query), processed
    right-to-left so edits don't shift earlier positions. If an alias has no
    bare occurrence in that SELECT list (e.g. ``SELECT *``), the expression
    is kept in the GROUP BY instead of dangling an undefined alias."""
    matches = list(_CH_GROUPBY.finditer(sql))
    for gb in reversed(matches):
        start = gb.end()
        # the item list ends at the next clause keyword OR at the paren that
        # closes the enclosing subquery — without the paren stop, a subquery
        # whose GROUP BY is its last clause would swallow the outer query's
        # text into its item list and the hoist would silently no-op
        tail = _CH_CLAUSE_END.search(sql, start)
        end = tail.start() if tail else len(sql)
        depth = 0
        for i in range(start, end):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
                if depth < 0:
                    end = i
                    break
        items = _split_top_level(sql[start:end])
        new_items: list[str] = []
        hoists: list[tuple[str, str]] = []
        for it in items:
            m = re.match(r"(?si)^\s*(.+?)\s+AS\s+([A-Za-z_]\w*)\s*$", it)
            if m and not re.fullmatch(r"[A-Za-z_][\w.]*", m.group(1)):
                hoists.append((m.group(1), m.group(2)))
                # trailing space: the original item's trailing whitespace
                # (often the newline before ORDER BY) went into the match
                new_items.append(f" {m.group(2)} ")
            else:
                new_items.append(it)
        if not hoists:
            continue
        head = sql[:start]
        # this query block's SELECT/FROM: same paren depth as the GROUP BY
        # (so neither a subquery's SELECT nor its FROM is mistaken for the
        # block's own — paren counting ignores string literals, acceptable
        # for the README-shaped queries this shim targets)
        def _depth(pos: int) -> int:
            return sql[:pos].count("(") - sql[:pos].count(")")

        gb_depth = _depth(gb.start())
        sels = [
            m
            for m in re.finditer(r"\bSELECT\b", head, re.IGNORECASE)
            if _depth(m.start()) == gb_depth
        ]
        sel = sels[-1] if sels else None
        frm = None
        if sel:
            for m in re.finditer(r"\bFROM\b", head, re.IGNORECASE):
                if m.start() > sel.end() and _depth(m.start()) == gb_depth:
                    frm = m
                    break
        if sel and frm:
            lo, hi = sel.end(), frm.start()
            select_list = head[lo:hi]
            for i, (expr, alias) in enumerate(hoists):
                # lambda replacement: expr may contain backslashes, which a
                # template string would mangle as escape sequences
                select_list, n = re.subn(
                    rf"(?<![\w.']){alias}(?![\w.'])",
                    lambda m, e=expr, a=alias: f"{e} AS {a}",
                    select_list,
                    count=1,
                )
                if n == 0:
                    # alias not referenced (SELECT * etc.) — group by the
                    # expression itself rather than an undefined alias
                    new_items[new_items.index(f" {alias} ")] = f" {expr} "
            head = head[:lo] + select_list + head[hi:]
        else:
            # no resolvable SELECT list — keep expressions in the GROUP BY
            for expr, alias in hoists:
                new_items[new_items.index(f" {alias} ")] = f" {expr} "
        sql = head + ",".join(new_items) + sql[end:]
    return sql


def translate_clickhouse_sql(sql: str) -> str:
    """Best-effort ClickHouse→Spark dialect translation for the escape
    hatch, covering the reference README's documented queries verbatim:

    - ``visitParamExtractString(labels, 'k')`` reads a label key from the
      reference's persisted JSON string; our ``time_series`` view keeps
      labels as a MapType, so it becomes ``element_at(labels, 'k')``
      (absent key → NULL rather than ClickHouse's ``''``).
    - ``GROUP BY <expr> AS <alias>`` → alias hoisted into SELECT
      (:func:`_hoist_groupby_aliases`).
    - ``ANY INNER JOIN`` (at most one right match per row) → plain
      ``INNER JOIN`` — equivalent whenever the right side is key-unique,
      which the README's grouped/limited subquery is.
    """
    sql = _CH_VISITPARAM.sub(lambda m: f"element_at({m.group(1)}, '{m.group(2)}')", sql)
    sql = _CH_ANY_JOIN.sub(lambda m: (m.group(1) or "") + "JOIN", sql)
    return _hoist_groupby_aliases(sql)


# ------------------------------------------ time-window extraction
# A rawsql query over a CHUNKED backend would otherwise decode the whole
# chunk tier — the decoded `samples` view sits above a mapInPandas barrier
# Catalyst can't push a timestamp filter through. Parsing the bounds out
# of the SQL text lets the storage register a window-pruned view instead
# (storage/chunked.py `_register_views_for_sql`). Extraction is a PRUNING
# HINT, deliberately conservative: it only trusts predicates that are
# top-level AND-conjuncts of the WHERE clause attached to the one query
# block that scans the samples view — anything else ((None, None)) keeps
# the unpruned-but-correct view. The SQL itself still applies every
# predicate exactly; a too-wide window is never wrong.

_SAMPLES_FROM = re.compile(
    r"\bFROM\s+(samples(?:_physical)?)\b(?:\s+(?:AS\s+)?(?!WHERE\b|GROUP\b|"
    r"ORDER\b|LIMIT\b|HAVING\b|JOIN\b|ON\b|UNION\b|LEFT\b|RIGHT\b|INNER\b|"
    r"FULL\b|CROSS\b)([A-Za-z_]\w*))?",
    re.IGNORECASE,
)
_CLAUSE_END = re.compile(
    r"\b(GROUP\s+BY|ORDER\s+BY|LIMIT|HAVING|UNION|WINDOW|QUALIFY)\b",
    re.IGNORECASE,
)


def _split_top_and(text: str) -> list[str] | None:
    """Split on AND at paren depth 0; None when OR/NOT appears at depth 0
    (the conjuncts would no longer be independent constraints)."""
    parts, depth, start = [], 0, 0
    pending_between = 0  # BETWEEN's own AND is not a conjunction
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in "('":
            if c == "'":
                j = text.find("'", i + 1)
                i = n if j < 0 else j + 1
                continue
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and re.match(r"BETWEEN\b", text[i:], re.IGNORECASE) and (
            i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_")
        ):
            pending_between += 1
            i += 7
            continue
        elif depth == 0 and text[i : i + 3].upper() == "AND" and (
            i + 3 >= n or not (text[i + 3].isalnum() or text[i + 3] == "_")
        ) and (i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_")):
            if pending_between:
                pending_between -= 1
                i += 3
                continue
            parts.append(text[start:i])
            start = i + 3
            i += 3
            continue
        elif depth == 0 and re.match(r"(?:OR|NOT)\b", text[i:], re.IGNORECASE) and (
            i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_")
        ):
            return None
        i += 1
    parts.append(text[start:])
    return parts


def _normalize_for_extraction(sql: str) -> str | None:
    """Canonicalize ``sql`` for window extraction: strip ``--`` and
    (nested) ``/* */`` comments, blank every quoted literal/identifier to
    an empty one, so no commented-out or string-embedded text can ever be
    read as a live predicate. Returns ``None`` — caller must give up on
    pruning — whenever quote handling can't be proven to match Spark's
    parser: any backslash in the text (escaped-quote ambiguity), an
    unterminated literal, or an unterminated comment. Extraction is only
    a pruning hint, so bailing is always safe; mis-reading is not."""
    if "\\" in sql:
        return None
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'" or c == '"':
            j = sql.find(c, i + 1)
            if j < 0:
                return None
            out.append("''")  # blank the literal, keep it a literal
            i = j + 1
        elif c == "`":
            j = sql.find("`", i + 1)
            if j < 0:
                return None
            out.append("`x`")
            i = j + 1
        elif sql.startswith("--", i):
            j = sql.find("\n", i)
            out.append(" ")
            i = n if j < 0 else j + 1
        elif sql.startswith("/*", i):
            depth, i = 1, i + 2
            while i < n and depth:  # Spark allows NESTED bracketed comments
                if sql.startswith("/*", i):
                    depth += 1
                    i += 2
                elif sql.startswith("*/", i):
                    depth -= 1
                    i += 2
                else:
                    i += 1
            if depth:
                return None
            out.append(" ")
        else:
            out.append(c)
            i += 1
    return "".join(out)


def extract_time_window(sql: str) -> tuple[int | None, int | None]:
    """Best-effort (lo_ms, hi_ms) bounds a samples scan in ``sql`` is
    provably restricted to; (None, None) when no safe bound exists."""
    normalized = _normalize_for_extraction(sql)
    if normalized is None:
        return (None, None)
    sql = normalized
    froms = list(_SAMPLES_FROM.finditer(sql))
    if len(froms) != 1:  # zero or several scans — a shared view can't prune
        return (None, None)
    m = froms[0]
    alias = m.group(2)
    # scan forward from the FROM target for a WHERE at the same depth,
    # stopping at clause keywords or the end of the enclosing subquery
    i, depth = m.end(), 0
    where_start = None
    while i < len(sql):
        c = sql[i]
        if c == "'":
            j = sql.find("'", i + 1)
            i = len(sql) if j < 0 else j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            if depth == 0:
                break
            depth -= 1
        elif depth == 0:
            if re.match(r"WHERE\b", sql[i:], re.IGNORECASE):
                where_start = i + 5
                break
            if _CLAUSE_END.match(sql[i:]):
                break
        i += 1
    if where_start is None:
        return (None, None)
    # WHERE body ends at the next depth-0 clause keyword or closing paren
    i, depth = where_start, 0
    end = len(sql)
    while i < len(sql):
        c = sql[i]
        if c == "'":
            j = sql.find("'", i + 1)
            i = len(sql) if j < 0 else j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            if depth == 0:
                end = i
                break
            depth -= 1
        elif depth == 0 and _CLAUSE_END.match(sql[i:]):
            end = i
            break
        i += 1
    conjuncts = _split_top_and(sql[where_start:end])
    if conjuncts is None:
        return (None, None)
    col = r"(?:(?:samples(?:_physical)?|{a})\.)?timestamp_ms".format(
        a=re.escape(alias) if alias else "samples"
    )
    cmp_fwd = re.compile(rf"^\s*{col}\s*(<=|>=|<|>|=)\s*(\d+)\s*$", re.IGNORECASE)
    cmp_rev = re.compile(rf"^\s*(\d+)\s*(<=|>=|<|>|=)\s*{col}\s*$", re.IGNORECASE)
    between = re.compile(
        rf"^\s*{col}\s+BETWEEN\s+(\d+)\s+AND\s+(\d+)\s*$", re.IGNORECASE
    )
    lo: int | None = None
    hi: int | None = None

    def _tighten(op: str, v: int) -> None:
        nonlocal lo, hi
        if op in (">=", ">"):
            b = v if op == ">=" else v + 1
            lo = b if lo is None else max(lo, b)
        elif op in ("<=", "<"):
            b = v if op == "<=" else v - 1
            hi = b if hi is None else min(hi, b)
        else:  # =
            _tighten(">=", v)
            _tighten("<=", v)

    _FLIP = {"<": ">", ">": "<", "<=": ">=", ">=": "<=", "=": "="}
    for part in conjuncts:
        mm = cmp_fwd.match(part)
        if mm:
            _tighten(mm.group(1), int(mm.group(2)))
            continue
        mm = between.match(part)
        if mm:
            _tighten(">=", int(mm.group(1)))
            _tighten("<=", int(mm.group(2)))
            continue
        mm = cmp_rev.match(part)
        if mm:  # `5 < timestamp_ms` constrains from the literal's side
            _tighten(_FLIP[mm.group(2)], int(mm.group(1)))
    return (lo, hi)


def rawsql_text(queries: Sequence[Query]) -> str | None:
    """Return the SQL text if the request is a raw-SQL request, else None."""
    if len(queries) != 1:
        return None
    q = queries[0]
    if len(q.matchers) != 2:
        return None
    by_name = {}
    for m in q.matchers:
        if m.type is not MatchType.EQ:
            return None
        by_name[m.name] = m.value
    if by_name.get("job") != RAWSQL_JOB:
        return None
    # an empty query string is NOT a raw-SQL request — the reference requires
    # query != "" and falls through to a normal matcher read
    # (storages/clickhouse/rawsql.go guard); returning "" here would send
    # spark.sql("") an unparseable statement → HTTP 500
    return by_name.get("query") or None


def is_rawsql(queries: Sequence[Query]) -> bool:
    return rawsql_text(queries) is not None


def _to_float(v) -> float:
    if v is None:
        return 0.0
    if isinstance(v, bool):
        return 0.0  # reference coerces only int/uint/float (rawsql.go:35-43)
    if isinstance(v, (int, float)):
        return float(v)
    return 0.0


def _to_str(v) -> str:
    if v is None:
        return "<nil>"  # Go fmt.Sprintf("%v", nil)
    if isinstance(v, dict):
        # a MapType labels column renders as the reference's canonical label
        # JSON (the form ClickHouse would return for its persisted string)
        from promhouse_spark.functions.labels import marshal_labels

        return marshal_labels(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "+Inf" if v > 0 else "-Inf"
        # Go %v prints floats in shortest-repr; Python repr matches for
        # round-trippable doubles.
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return v.decode("utf-8", "replace")
    return str(v)


def run_rawsql(spark: SparkSession, sql: str, end_ms: int) -> list[TimeSeries]:
    """Execute SQL verbatim and shape rows per X8.

    Results stream through ``toLocalIterator`` — the escape hatch is an API
    surface, not a bulk-export path, but nothing here materializes the full
    result on the driver at once.
    """
    df = spark.sql(translate_clickhouse_sql(sql))
    columns = df.columns
    out: list[TimeSeries] = []
    for row in df.toLocalIterator():
        labels: list[Label] = []
        value = 0.0
        for c in columns:
            v = row[c]
            if c == "value":
                value = _to_float(v)
            else:
                labels.append(Label(name=c, value=_to_str(v)))
        out.append(
            TimeSeries(labels=labels, samples=[Sample(value=value, timestamp_ms=end_ms)])
        )
    return out
