"""Phonetic blocking keys as pure Catalyst expressions.

The reference has no blocking at all — it probes a global TF-IDF kNN index
per row (automation_final2.py:396-397,430-432). At 10^12 documents a global
index is impossible; the scale design (BASELINE.json north_star) is salted
blocking on (normalized-name prefix + phonetic keys), so a candidate pair is
generated iff the two names share at least one key. Recall of the key set
against the cosine<=0.2 acceptor is property-tested in tests/test_blocking.py.

Spark ships Soundex natively (JVM, codegen). Double Metaphone has no JVM
builtin and no library in this sandbox, so we use two complementary
deterministic keys that are expressible as regexp/translate chains (still
zero Python):

* ``consonant_skeleton_col`` — first letter + deduped consonants (a NYSIIS-
  style skeleton; robust to vowel-level typos and spacing).
* ``metaphone_lite_col`` — a compact Metaphone-family code: common digraph
  folding (PH→F, CK→K, SCH→SK, ...) then consonant classes, deduped,
  prefixed. Coarser than Double Metaphone but same blocking role.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _alpha_upper(col: Column) -> Column:
    return F.regexp_replace(F.upper(F.coalesce(col.cast("string"), F.lit(""))), "[^A-Z]", "")


def consonant_skeleton_col(col: Column, length: int = 6) -> Column:
    """First letter + subsequent consonants with runs collapsed, truncated."""
    a = _alpha_upper(col)
    head = F.substring(a, 1, 1)
    tail = F.regexp_replace(F.substring(a, 2, 2_000_000), "[AEIOUY]", "")
    collapsed = F.regexp_replace(F.concat(head, tail), r"(.)\1+", "$1")
    return F.substring(collapsed, 1, length)


# (pattern, replacement) pairs applied in order; Metaphone-family digraph folds.
_MLITE_RULES: tuple[tuple[str, str], ...] = (
    (r"^X", "S"),
    (r"^WH", "W"),
    (r"^(KN|GN|PN|AE|WR)", "N"),
    ("SCH", "SK"),
    ("PH", "F"),
    ("GH", "G"),
    ("CK", "K"),
    ("SH", "X"),
    ("TH", "0"),
    ("CH", "X"),
    ("C([IEY])", "S$1"),
    ("C", "K"),
    ("G([IEY])", "J$1"),
    ("Q", "K"),
    ("V", "F"),
    ("Z", "S"),
    ("X", "KS"),
    ("D([GJ])", "J$1"),
    ("W([^AEIOU]|$)", "$1"),
)


def metaphone_lite_col(col: Column, length: int = 6) -> Column:
    """Compact Metaphone-family phonetic code (see module docstring)."""
    a = _alpha_upper(col)
    for pat, rep in _MLITE_RULES:
        a = F.regexp_replace(a, pat, rep)
    head = F.substring(a, 1, 1)
    tail = F.regexp_replace(F.substring(a, 2, 2_000_000), "[AEIOUYHW]", "")
    collapsed = F.regexp_replace(F.concat(head, tail), r"(.)\1+", "$1")
    return F.substring(collapsed, 1, length)
