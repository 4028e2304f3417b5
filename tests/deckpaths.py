"""Resolve test decks/goldens: the read-only reference checkout when present,
else the fixture copies under examples/ref/ (VERDICT r1 #9 — golden coverage
must not silently vanish when /root/reference is absent)."""

import os

_REFERENCE = "/root/reference/examples"
_LOCAL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "ref",
)

REF = _REFERENCE if os.path.isdir(_REFERENCE) else _LOCAL


def deck(rel: str) -> str:
    return os.path.join(REF, rel)
