"""Tiny grok -> named-group-regex compiler (SURVEY.md §2.2 P3).

The reference extracts structured fields from raw log lines per
LoggerColumn config.  Grok is the conventional macro layer over regex:
``%{PATTERN:name}`` expands to ``(?P<name>...)``.  This is a pure-Python
compiler over a small built-in pattern library — no runtime dependency —
so user configs can say ``%{INT:status}`` instead of hand-writing the
group.  Output is an ordinary ``re``-compatible pattern string usable by
``pyarrow.compute.extract_regex``.
"""

from __future__ import annotations

import re

BASE_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "LOGLEVEL": r"DEBUG|INFO|WARN(?:ING)?|ERROR|CRITICAL|FATAL|TRACE",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d{1,6})?Z?",
    "GREEDYDATA": r".*",
}

_GROK_REF = re.compile(r"%\{(?P<pat>[A-Z0-9_]+)(?::(?P<name>[A-Za-z_]\w*))?\}")


def compile_grok(expr: str, extra_patterns: dict[str, str] | None = None) -> str:
    """Expand ``%{PATTERN:name}`` references into a named-group regex.

    Unnamed references (``%{INT}``) expand to non-capturing groups.
    Unknown pattern names raise ``KeyError`` at compile time (config
    errors surface before any data is read).
    """
    lib = dict(BASE_PATTERNS)
    if extra_patterns:
        lib.update(extra_patterns)

    def _sub(m: re.Match) -> str:
        body = lib[m.group("pat")]  # KeyError on unknown pattern = config error
        name = m.group("name")
        if name:
            return f"(?P<{name}>{body})"
        return f"(?:{body})"

    out = _GROK_REF.sub(_sub, expr)
    re.compile(out)  # validate eagerly
    return out
