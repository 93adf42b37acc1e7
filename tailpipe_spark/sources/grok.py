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
    # --- composite log-line patterns (standard grok definitions, as
    # shipped by the elastic pattern base the reference consumes via
    # go-grok; field captures inside them surface like user captures) ---
    "QS": r"%{QUOTEDSTRING}",
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "HTTPDUSER": r"(?:%{EMAILADDRESS}|%{USER})",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGFACILITY": r"<%{NONNEGINT:facility}.%{NONNEGINT:priority}>",
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
    "SYSLOGBASE": r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
    "COMMONAPACHELOG": (
        r"%{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} "
        r"\[%{HTTPDATE:timestamp}\] \"(?:%{WORD:verb} %{NOTSPACE:request}"
        r"(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" "
        r"%{NONNEGINT:response} (?:%{NONNEGINT:bytes}|-)"
    ),
    "COMBINEDAPACHELOG": r"%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]]+))?(?::(\w+))?\}")


@dataclass
class CompiledGrok:
    regex: str
    #: field name → (regex group index, declared grok type or None)
    fields: dict[str, tuple[int, str | None]] = field(default_factory=dict)


def capture_group_indices(regex: str) -> dict[str, int]:
    """Map named-group name → actual capture index, counting EVERY
    capturing group — raw ``(`` groups included — while skipping
    escapes and character classes (a ``(`` inside ``[...]`` or after a
    backslash is a literal, not a group). Group numbering must match
    the regex engine's or ``regexp_extract(idx)`` grabs the wrong
    field."""
    idx = 0
    names: dict[str, int] = {}
    i, in_class = 0, False
    while i < len(regex):
        ch = regex[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
            i += 1
            continue
        if ch == "[":
            in_class = True
            i += 1
            continue
        if ch == "(":
            nxt = regex[i + 1 : i + 2]
            if nxt != "?":
                idx += 1  # raw capturing group
            else:
                rest = regex[i + 2 :]
                name_start = None
                if rest[:1] == "<" and rest[1:2] not in ("=", "!"):
                    name_start = i + 3  # Java style (?<name>…)
                elif rest[:2] == "P<":
                    name_start = i + 4  # Python style (?P<name>…)
                if name_start is not None:
                    j = regex.index(">", name_start)
                    idx += 1
                    names[regex[name_start:j]] = idx
                    i = j + 1
                    continue
                # other (?...) forms: non-capturing / lookaround — no index
        i += 1
    return names


def compile_grok(
    pattern: str, extra_patterns: dict[str, str] | None = None
) -> CompiledGrok:
    """Expand ``%{NAME:field:type}`` refs into one regex whose capture
    groups carry the named fields. Unnamed refs (``%{INT}``) match
    without capturing; nested references expand recursively.

    Field captures are emitted as synthetic NAMED groups and indices are
    computed by scanning the final regex — so a literal ``(`` in the
    user's pattern (a real capture group to the engine) can't shift the
    field→index mapping."""
    patterns = {**BASE_PATTERNS, **(extra_patterns or {})}
    gname_fields: list[tuple[str, str, str | None]] = []

    def _expand(pat: str, depth: int, capture_names: bool) -> str:
        if depth > 20:
            raise ValueError("grok pattern recursion too deep")

        def sub(m: re.Match) -> str:
            name, fieldname, typ = m.group(1), m.group(2), m.group(3)
            if name not in patterns:
                raise ValueError(f"unknown grok pattern %{{{name}}}")
            body = _expand(patterns[name], depth + 1, capture_names and fieldname is None)
            if fieldname and capture_names:
                gname = f"g{len(gname_fields)}"
                gname_fields.append((gname, fieldname, typ))
                return f"(?P<{gname}>{body})"
            return f"(?:{body})"

        return _GROK_REF.sub(sub, pat)

    marked = _expand(pattern, 0, True)
    indices = capture_group_indices(marked)
    fields = {
        fieldname: (indices[gname], typ) for gname, fieldname, typ in gname_fields
    }
    # strip the markers to plain groups: the final regex must be valid
    # for BOTH engines that consume it (Java regexp_extract and Python
    # re for file_layout matching); group numbering is unchanged.
    regex = marked
    for gname, _f, _t in gname_fields:
        regex = regex.replace(f"(?P<{gname}>", "(")
    return CompiledGrok(regex=regex, fields=fields)


GROK_TYPE_CASTS = {"int": "long", "long": "long", "float": "double", "double": "double", "bool": "boolean"}
