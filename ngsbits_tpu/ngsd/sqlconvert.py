"""MySQL → SQLite statement translation for the NGSD schema and test dumps.

Handles the constructs the NGSD SQL actually uses: CREATE TABLE with
ENUM/SET/AUTO_INCREMENT/KEY/CONSTRAINT/COMMENT clauses, INSERTs with
backslash-escaped string literals, NOW()/CURDATE(), SET @var statements.
"""

from __future__ import annotations

import re


def split_statements(sql: str) -> list[str]:
    """Split on ';' outside of quoted strings (MySQL backslash escapes)."""
    out = []
    buf = []
    i = 0
    n = len(sql)
    quote = None
    while i < n:
        c = sql[i]
        if quote:
            buf.append(c)
            if c == "\\" and i + 1 < n:
                buf.append(sql[i + 1])
                i += 2
                continue
            if c == quote:
                quote = None
        elif c in ("'", '"', "`"):
            quote = c
            buf.append(c)
        elif c == ';':
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
        elif c == '-' and sql[i:i + 2] == '--' and (i == 0 or sql[i - 1] in '\r\n'):
            # line comment
            j = sql.find('\n', i)
            i = n if j == -1 else j
            continue
        else:
            buf.append(c)
        i += 1
    stmt = "".join(buf).strip()
    if stmt:
        out.append(stmt)
    return out


def _convert_string_literal(body: str) -> str:
    """MySQL single-quoted literal body -> SQLite body ('' escaping)."""
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt == "'":
                out.append("''")
            elif nxt == '"':
                out.append('"')
            elif nxt == "\\":
                out.append("\\")
            elif nxt == "n":
                out.append("\n")
            elif nxt == "t":
                out.append("\t")
            elif nxt == "r":
                out.append("\r")
            elif nxt == "0":
                out.append("\0")
            else:
                out.append(nxt)
            i += 2
            continue
        if c == "'":
            out.append("''")
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def convert_literals(stmt: str) -> str:
    """Re-escape all single-quoted literals in a statement for SQLite."""
    out = []
    i = 0
    n = len(stmt)
    while i < n:
        c = stmt[i]
        if c == "'":
            # find end of MySQL literal (backslash escapes + '' doubling)
            j = i + 1
            body = []
            while j < n:
                if stmt[j] == "\\" and j + 1 < n:
                    body.append(stmt[j])
                    body.append(stmt[j + 1])
                    j += 2
                    continue
                if stmt[j] == "'":
                    if j + 1 < n and stmt[j + 1] == "'":
                        body.append("\\'")
                        j += 2
                        continue
                    break
                body.append(stmt[j])
                j += 1
            out.append("'" + _convert_string_literal("".join(body)) + "'")
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _strip_comment_clause(line: str) -> str:
    """Remove a trailing COMMENT '...' clause (escaped quotes possible)."""
    m = re.search(r"\s+COMMENT\s+(['\"])", line, re.IGNORECASE)
    if not m:
        return line
    q = m.group(1)
    i = m.end()
    while i < len(line):
        if line[i] == "\\":
            i += 2
            continue
        if line[i] == q:
            if i + 1 < len(line) and line[i + 1] == q:
                i += 2
                continue
            break
        i += 1
    return line[:m.start()] + line[i + 1:]


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    parts = []
    depth = 0
    quote = None
    buf = []
    i = 0
    while i < len(s):
        c = s[i]
        if quote:
            if c == "\\":
                buf.append(c)
                if i + 1 < len(s):
                    buf.append(s[i + 1])
                i += 2
                continue
            if c == quote:
                quote = None
            buf.append(c)
        elif c in ("'", '"', "`"):
            quote = c
            buf.append(c)
        elif c == "(":
            depth += 1
            buf.append(c)
        elif c == ")":
            depth -= 1
            buf.append(c)
        elif c == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    if buf:
        parts.append("".join(buf))
    return parts


def convert_create_table(stmt: str) -> str | None:
    m = re.match(r"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?(`?\w+`?)\s*\(", stmt,
                 re.IGNORECASE | re.DOTALL)
    if not m:
        return None
    table = m.group(2).strip("`")
    # body: between first '(' and its matching ')'
    start = stmt.index("(", m.start(2))
    depth = 0
    quote = None
    end = -1
    i = start
    while i < len(stmt):
        c = stmt[i]
        if quote:
            if c == "\\":
                i += 2
                continue
            if c == quote:
                quote = None
        elif c in ("'", '"', "`"):
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                end = i
                break
        i += 1
    body = stmt[start + 1:end]

    cols = []
    enums: list[tuple[str, str, list[str]]] = []
    has_autoinc_pk = False
    autoinc_col = None
    for raw in _split_top_level(body):
        line = raw.strip()
        if not line:
            continue
        upper = line.upper()
        if upper.startswith("PRIMARY KEY"):
            inner = line[line.index("(") + 1:line.rindex(")")]
            pk_cols = [re.sub(r"\(\d+\)$", "",
                              c.replace(" ASC", "").replace(" DESC", "").strip()).strip().strip("`")
                       for c in inner.split(",")]
            if autoinc_col and pk_cols == [autoinc_col]:
                continue  # declared inline on the column
            cols.append(f"PRIMARY KEY ({', '.join(pk_cols)})")
            continue
        if upper.startswith("UNIQUE"):
            inner = line[line.index("(") + 1:line.rindex(")")]
            ucols = [re.sub(r"\(\d+\)$", "",
                            c.replace(" ASC", "").replace(" DESC", "").strip()).strip().strip("`")
                     for c in inner.split(",")]
            cols.append(f"UNIQUE ({', '.join(ucols)})")
            continue
        if (upper.startswith("KEY") or upper.startswith("INDEX")
                or upper.startswith("FULLTEXT") or upper.startswith("CONSTRAINT")
                or upper.startswith("FOREIGN KEY") or upper.startswith("CHECK")):
            continue
        # column definition
        line = _strip_comment_clause(line)
        mm = re.match(r"`?(\w+)`?\s*(.*)", line, re.DOTALL)
        name, rest = mm.group(1), mm.group(2)
        em = re.search(r"ENUM\s*\(((?:[^)(]|\([^)]*\))*)\)", rest, re.IGNORECASE | re.DOTALL)
        enum_values = None
        if em:
            enum_values = [v.strip()[1:-1] for v in _split_top_level(em.group(1)) if v.strip()]
            enums.append((table, name, enum_values))
        else:
            # SET columns expose their value list through getEnum() too
            sm = re.search(r"\bSET\s*\(((?:[^)(]|\([^)]*\))*)\)", rest,
                           re.IGNORECASE | re.DOTALL)
            if sm:
                set_values = [v.strip()[1:-1]
                              for v in _split_top_level(sm.group(1)) if v.strip()]
                enums.append((table, name, set_values))
        rest = re.sub(r"ENUM\s*\(((?:[^)(]|\([^)]*\))*)\)", "TEXT", rest,
                      flags=re.IGNORECASE | re.DOTALL)
        rest = re.sub(r"\bSET\s*\(((?:[^)(]|\([^)]*\))*)\)", "TEXT", rest,
                      flags=re.IGNORECASE | re.DOTALL)
        rest = re.sub(r"\bUNSIGNED\b", "", rest, flags=re.IGNORECASE)
        rest = re.sub(r"\bZEROFILL\b", "", rest, flags=re.IGNORECASE)
        rest = re.sub(r"ON\s+UPDATE\s+CURRENT_TIMESTAMP(\(\))?", "", rest, flags=re.IGNORECASE)
        rest = re.sub(r"CHARACTER\s+SET\s+'?\w+'?", "", rest, flags=re.IGNORECASE)
        rest = re.sub(r"COLLATE\s+'?\w+'?", "", rest, flags=re.IGNORECASE)
        if re.search(r"\bAUTO_INCREMENT\b", rest, re.IGNORECASE):
            rest = "INTEGER PRIMARY KEY AUTOINCREMENT"
            has_autoinc_pk = True
            autoinc_col = name
            # remove an earlier PRIMARY KEY clause for this col if added
            cols = [c for c in cols if c != f"PRIMARY KEY ({name})"]
        rest = re.sub(r"\s+", " ", rest).strip()
        # MySQL's default utf8_general_ci collation compares case-insensitively
        if re.match(r"(VARCHAR|CHAR|TEXT|TINYTEXT|MEDIUMTEXT|LONGTEXT)", rest.split()[0].upper()):
            rest += " COLLATE NOCASE"
        # MySQL non-strict implicit defaults for NOT NULL columns without an
        # explicit DEFAULT (the NGSD test dumps rely on them): first enum
        # value, 0 for numerics, '' for strings
        if (re.search(r"\bNOT\s+NULL\b", rest, re.IGNORECASE)
                and not re.search(r"\bDEFAULT\b", rest, re.IGNORECASE)
                and not re.search(r"AUTOINCREMENT", rest)):
            type_word = rest.split()[0].upper()
            if enum_values:
                rest += " DEFAULT '" + _convert_string_literal(enum_values[0]) + "'"
            elif re.match(r"(INT|TINYINT|SMALLINT|MEDIUMINT|BIGINT|FLOAT|DOUBLE|DECIMAL|NUMERIC|BOOL)", type_word):
                rest += " DEFAULT 0"
            elif re.match(r"(VARCHAR|CHAR|TEXT|TINYTEXT|MEDIUMTEXT|LONGTEXT|BLOB)", type_word):
                rest += " DEFAULT ''"
            elif re.match(r"(DATE|DATETIME|TIMESTAMP|TIME|YEAR)", type_word):
                rest += " DEFAULT '0000-00-00'"
        cols.append(f"{name} {rest}")
    _ = has_autoinc_pk
    sql = f"CREATE TABLE IF NOT EXISTS {table} (\n  " + ",\n  ".join(cols) + "\n)"
    return sql, enums


def mysql_to_sqlite(sql: str) -> list[str]:
    """Translate a MySQL script into a list of SQLite statements."""
    out = []
    for stmt in split_statements(sql):
        s = stmt.strip()
        upper = s.upper()
        if upper.startswith("SET "):
            continue
        if re.match(r"CREATE\s+TABLE", upper):
            conv = convert_create_table(s)
            if conv:
                sql, enums = conv
                out.append(sql)
                for table, col, values in enums:
                    out.append("CREATE TABLE IF NOT EXISTS _enum_values "
                               "(table_name TEXT, column_name TEXT, position INT, value TEXT)")
                    out.append(f"DELETE FROM _enum_values WHERE table_name='{table}' AND column_name='{col}'")
                    for k, v in enumerate(values):
                        out.append("INSERT INTO _enum_values VALUES ("
                                   f"'{table}', '{col}', {k}, '{_convert_string_literal(v)}')")
            continue
        if upper.startswith("DELIMITER"):
            continue
        if upper.startswith("LOCK TABLES") or upper.startswith("UNLOCK TABLES"):
            continue
        if upper.startswith("ALTER TABLE") and "AUTO_INCREMENT" in upper:
            continue
        s = convert_literals(s)
        s = re.sub(r"\bNOW\(\)", "CURRENT_TIMESTAMP", s, flags=re.IGNORECASE)
        s = re.sub(r"\bCURDATE\(\)", "DATE('now')", s, flags=re.IGNORECASE)
        s = s.replace("`", "")
        out.append(s)
    return out
