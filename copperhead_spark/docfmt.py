"""Docstring constant inlining.

Many plan/operator docstrings describe tuned constants by name —
"top-{_PMI_TOPK} term pairs", "{_SSD_N}-token windows" — so the prose
stays correct when the constant is retuned.  Plain (non-f) docstrings
render those braces literally under help() (r7 ADVICE).  Each module
with such docstrings calls ``inline_doc_consts(globals())`` at its
bottom: every ``{_CONST}`` placeholder whose name resolves to a short
scalar module global is replaced with the literal value, so help()
shows real numbers while the source keeps the self-updating reference.

Unresolvable or long-valued placeholders are left untouched (never
raises), and only this module's own functions are rewritten.
"""

from __future__ import annotations

import re
import types

_PLACEHOLDER = re.compile(r"\{(_?[A-Z][A-Z0-9_]*)\}")
_MAX_INLINE_LEN = 120  # don't paste multi-line SQL blobs into prose


def inline_doc_consts(g: dict) -> None:
    """Rewrite {_CONST} placeholders in the calling module's function
    docstrings with the literal values of same-named module globals."""
    mod_name = g.get("__name__")

    def _sub(m: re.Match) -> str:
        v = g.get(m.group(1))
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return str(v)
        if isinstance(v, str) and len(v) <= _MAX_INLINE_LEN and "\n" not in v:
            return v
        if isinstance(v, (tuple, list)) and all(
            isinstance(x, (int, float, str)) for x in v
        ):
            s = repr(tuple(v))
            if len(s) <= _MAX_INLINE_LEN:
                return s
        return m.group(0)

    for obj in list(g.values()):
        if (
            isinstance(obj, types.FunctionType)
            and obj.__module__ == mod_name
            and obj.__doc__
            and _PLACEHOLDER.search(obj.__doc__)
        ):
            obj.__doc__ = _PLACEHOLDER.sub(_sub, obj.__doc__)
