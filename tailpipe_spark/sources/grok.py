"""Grok pattern compiler: ``%{NAME:field:type}`` → anchored regex.

The reference delegates grok parsing to a Go grok library inside plugins
(SURVEY.md §2.c; acceptance contract in core_formats.bats:4-43,201-262).
Here grok compiles to a single Java/Python-compatible regex evaluated
JVM-side via ``regexp_extract`` — no Python in the row path.

The base pattern set is the public grok vocabulary (the de-facto
standard shipped by every grok implementation).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

#: public grok base patterns (subset; extensible per-format)
BASE_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "BASE10NUM": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?)|\.[0-9]+)",
    "NUMBER": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?)|\.[0-9]+)",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "NONNEGINT": r"\b(?:[0-9]+)\b",
    "BOOLEAN": r"(?:true|false|TRUE|FALSE|True|False)",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "IPV6": r"(?:[0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}",
    "IP": r"(?:(?:[0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}|(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?))",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "IPORHOST": r"(?:(?:[0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}|(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)|\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b)",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "EMAILLOCALPART": r"[a-zA-Z0-9!#$%&'*+\-/=?^_`{|}~]{1,64}(?:\.[a-zA-Z0-9!#$%&'*+\-/=?^_`{|}~]{1,62}){0,63}",
    "YEAR": r"(?:\d\d){1,2}",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "MONTH": r"\b(?:[Jj]an(?:uary|uar)?|[Ff]eb(?:ruary|ruar)?|[Mm](?:a|ä)?r(?:ch|z)?|[Aa]pr(?:il)?|[Mm]a(?:y|i)?|[Jj]un(?:e|i)?|[Jj]ul(?:y|i)?|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|[Oo](?:c|k)?t(?:ober)?|[Nn]ov(?:ember)?|[Dd]e(?:c|z)(?:ember)?)\b",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?:2[0123]|[01]?[0-9]):(?:[0-5][0-9])(?::(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?))?",
    "DATE_US": r"(?:0?[1-9]|1[0-2])[/-](?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])[/-](?:\d\d){1,2}",
    "DATE_EU": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])[./-](?:0?[1-9]|1[0-2])[./-](?:\d\d){1,2}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-](?:2[0123]|[01]?[0-9])(?::?(?:[0-5][0-9])))",
    "TIMESTAMP_ISO8601": r"(?:\d\d){1,2}-(?:0?[1-9]|1[0-2])-(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])[T ](?:2[0123]|[01]?[0-9]):?(?:[0-5][0-9])(?::?(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?))?(?:Z|[+-](?:2[0123]|[01]?[0-9])(?::?(?:[0-5][0-9])))?",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    "QUOTEDSTRING": r"(?:\"(?:[^\"\\]*(?:\\.[^\"\\]*)*)\"|'(?:[^'\\]*(?:\\.[^'\\]*)*)')",
    "PATH": r"(?:/[^\s?*]*)+",
    "HTTPDATE": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])/\b\w+\b/(?:\d\d){1,2}:(?:2[0123]|[01]?[0-9]):(?:[0-5][0-9])(?::(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?))? [+-][0-9]{4}",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]]+))?(?::(\w+))?\}")


@dataclass
class CompiledGrok:
    regex: str
    #: field name → (regex group index, declared grok type or None)
    fields: dict[str, tuple[int, str | None]] = field(default_factory=dict)


def compile_grok(
    pattern: str, extra_patterns: dict[str, str] | None = None
) -> CompiledGrok:
    """Expand ``%{NAME:field:type}`` refs into one regex whose capture
    groups carry the named fields. Unnamed refs (``%{INT}``) match
    without capturing; nested references expand recursively."""
    patterns = {**BASE_PATTERNS, **(extra_patterns or {})}
    fields: dict[str, tuple[int, str | None]] = {}
    counter = [0]

    def _expand(pat: str, depth: int, capture_names: bool) -> str:
        if depth > 20:
            raise ValueError("grok pattern recursion too deep")

        def sub(m: re.Match) -> str:
            name, fieldname, typ = m.group(1), m.group(2), m.group(3)
            if name not in patterns:
                raise ValueError(f"unknown grok pattern %{{{name}}}")
            body = _expand(patterns[name], depth + 1, capture_names and fieldname is None)
            if fieldname and capture_names:
                counter[0] += 1
                fields[fieldname] = (counter[0], typ)
                return f"({body})"
            return f"(?:{body})"

        return _GROK_REF.sub(sub, pat)

    # Pre-count: groups are numbered by '(' order, so expansion must
    # allocate indices in textual order — _expand does (outer-first,
    # left-to-right), matching regex group numbering as long as named
    # captures never nest inside other named captures (grok disallows
    # field refs inside base patterns, so that holds).
    regex = _expand(pattern, 0, True)
    return CompiledGrok(regex=regex, fields=fields)


GROK_TYPE_CASTS = {"int": "long", "long": "long", "float": "double", "double": "double", "bool": "boolean"}
