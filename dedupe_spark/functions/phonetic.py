"""Phonetic blocking keys (American Soundex).

Classic record-linkage blocking (Odell & Russell's Soundex, public
domain; the standard cheap phonetic key in every ER textbook): names
that sound alike get the same 4-char code, so typo'd / misheard name
variants land in the same block without any pairwise comparison.

Spark side is the built-in ``F.soundex`` (JVM, codegen). DuckDB has no
soundex, so the oracle replica is built here as a deterministic SQL
expression chain implementing the same algorithm:

  1. map letters to digit codes via ``translate`` (H/W -> the sentinel
     '7': they are *transparent* — same-coded letters separated by H/W
     collapse to one),
  2. delete the '7' sentinels (implements the transparency),
  3. collapse adjacent duplicate digits — DuckDB's RE2 regex has no
     backreferences, so the collapse is 5 rounds of per-digit two-char
     ``replace`` (each round at least halves every run length: 5 rounds
     fully collapse runs up to 32, i.e. words up to 32 letters — far
     past any name). Vowels ('0') break runs, so same codes across a
     vowel survive as two,
  4. keep the first LETTER, then the collapsed codes after the first
     letter's own code (unless the first letter was H/W, whose code was
     deleted in step 2), minus the vowel '0's, right-padded to 3.

Equality of the two engines on the algorithm's branchy cases (H/W
transparency, vowel separation, first-letter collapse, short strings)
is asserted by tests/test_phonetic.py — Spark's soundex and this chain
agree character-for-character on alphabetic input, which is the helper's
documented contract (non-leading-alpha input passes through unchanged on
the Spark side; the fixture never produces it).
"""

from __future__ import annotations

import re

# A..Z -> digit; vowels+Y -> '0' (separators), H/W -> '7' (transparent)
_MAP = "01230127022455012623017202"


def soundex_py(word: str) -> str:
    """Pure-python reference of the SQL chain below (test oracle only,
    never executed per-row in a pipeline)."""
    if not word or not ("a" <= word[0] <= "z" or "A" <= word[0] <= "Z"):
        return word
    u = word.upper()
    codes = "".join(_MAP[ord(c) - 65] for c in u if "A" <= c <= "Z")
    first_is_hw = codes[0] == "7"
    collapsed = re.sub(r"([0-9])\1+", r"\1", codes.replace("7", ""))
    rest = collapsed if first_is_hw else collapsed[1:]
    return u[0] + (rest.replace("0", "") + "000")[:3]


def soundex_sql(col: str) -> str:
    """DuckDB SQL expression computing American Soundex of ``col``
    (alphabetic input, <= 32 letters), matching Spark's ``F.soundex``."""
    codes = (
        f"translate(upper({col}), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{_MAP}')"
    )
    collapsed = f"replace({codes}, '7', '')"
    for _ in range(5):  # halve run lengths; see module docstring step 3
        for d in "0123456":
            collapsed = f"replace({collapsed}, '{d}{d}', '{d}')"
    rest = (
        f"CASE WHEN substr({codes}, 1, 1) = '7' THEN {collapsed} "
        f"ELSE substr({collapsed}, 2) END"
    )
    return (
        f"substr(upper({col}), 1, 1) || "
        f"substr(rpad(replace({rest}, '0', ''), 3, '0'), 1, 3)"
    )
