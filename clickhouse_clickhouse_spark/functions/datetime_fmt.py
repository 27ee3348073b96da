"""CH-style ``formatDateTime`` %-code → Java SimpleDateFormat pattern
translation (reference ``src/Functions/formatDateTime.cpp``; SURVEY.md
§4.3 item 7).

Only the codes with an exact Java equivalent are mapped; unknown codes
raise rather than silently mis-formatting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CODES = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%e": "d",
    "%H": "HH", "%I": "hh", "%M": "mm", "%S": "ss",
    "%j": "DDD", "%a": "EEE", "%W": "EEEE", "%b": "MMM",
    "%F": "yyyy-MM-dd", "%T": "HH:mm:ss", "%D": "MM/dd/yy",
    "%p": "a", "%Q": "QQ", "%G": "YYYY", "%g": "YY",
    "%%": "%",
}


def ch_format_to_java(fmt: str) -> str:
    out: list[str] = []
    i = 0
    literal: list[str] = []

    def flush_literal():
        if literal:
            s = "".join(literal)
            # Quote literals so alphabetic chars aren't pattern letters.
            if any(c.isalpha() for c in s):
                s = "'" + s.replace("'", "''") + "'"
            out.append(s)
            literal.clear()

    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            code = fmt[i:i + 2]
            if code not in _CODES:
                raise ValueError(f"unsupported format code {code!r}")
            flush_literal()
            out.append(_CODES[code])
            i += 2
        else:
            literal.append(fmt[i])
            i += 1
    flush_literal()
    return "".join(out)


def format_date_time(col: Column, ch_fmt: str) -> Column:
    """``formatDateTime(col, '%Y-%m-%d')`` → ``date_format`` with the
    translated pattern."""
    return F.date_format(col, ch_format_to_java(ch_fmt))
