"""Minimal parse.parse shim for the reference's shorthand grammars."""

import re


class _Result(dict):
    def __getitem__(self, k):
        return super().__getitem__(k)


_TYPE_RE = {
    "d": r"[-+]?\d+",
    "f": r"[-+]?\d*\.?\d+",
    "w": r"\w+",
    "l": r"[A-Za-z]+",
}

_CAST = {"d": int, "f": float, "w": str, "l": str}


def parse(pattern, string, extra_types=None):
    extra_types = extra_types or {}
    regex = ""
    names, casts = [], []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "{":
            if pattern[i + 1] == "{":
                regex += re.escape("{")
                i += 2
                continue
            j = pattern.index("}", i)
            spec = pattern[i + 1 : j]
            if ":" in spec:
                name, typ = spec.split(":")
            else:
                name, typ = spec, "any"
            if typ in extra_types:
                fn = extra_types[typ]
                sub = getattr(fn, "pattern", r".*?")
                casts.append(fn)
            else:
                sub = _TYPE_RE.get(typ, r".+?")
                casts.append(_CAST.get(typ, str))  # "any" falls through to .+?
            names.append(name)
            regex += f"({sub})"
            i = j + 1
        elif c == "}":
            if i + 1 < len(pattern) and pattern[i + 1] == "}":
                regex += re.escape("}")
                i += 2
                continue
            regex += re.escape(c)
            i += 1
        else:
            regex += re.escape(c)
            i += 1
    m = re.fullmatch(regex, string)
    if m is None:
        return None
    return _Result(
        {n: cast(g) for n, cast, g in zip(names, casts, m.groups())}
    )
