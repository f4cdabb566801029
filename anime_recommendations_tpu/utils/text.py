"""Anime-name canonicalization.

Behavioral parity with the reference ``clean()`` helper that is duplicated in
similar_anime.py:242-276, similar_users.py:167-200, model_recs.py and
helper_functions/load.py:307: replace a fixed set of irregular glyphs with a
space, strip all whitespace, drop non-word characters, strip combining
accents after NFKD normalization, and lowercase.
"""

from __future__ import annotations

import re
import string
import unicodedata
from typing import Iterable

_IRREGULAR = ("★", "♥", "☆", "♡", "½", "ß", "²")
_WS_TABLE = {ord(c): None for c in string.whitespace}
_NON_WORD = re.compile(r"\W+")


def clean_name(item: str) -> str:
    """Canonicalize one name the way the reference does."""
    s = str(item)
    for irr in _IRREGULAR:
        if irr in s:
            s = s.replace(irr, " ")
    s = s.translate(_WS_TABLE)
    s = _NON_WORD.sub("", s)
    s = "".join(
        c for c in unicodedata.normalize("NFKD", s) if not unicodedata.combining(c)
    )
    return s.lower()


def clean_names(items: Iterable[str]) -> list[str]:
    """Canonicalize a list of names (reference clean() list branch)."""
    return [clean_name(x) for x in items]
