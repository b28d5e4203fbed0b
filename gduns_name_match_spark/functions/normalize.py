"""Company-name normalization as pure Catalyst column expressions.

Semantics replicate the reference's three scalar kernels exactly
(reference: /root/reference/automation_final2.py —
``preprocess_text`` at automation_final2.py:166-186, ``filter_word`` at
automation_final2.py:188-325, ``city_change`` at automation_final2.py:327-335),
but the implementation is a chain of JVM-side ``regexp_replace``/``split``
expressions: whole-stage-codegen friendly, zero Python in the hot path, and
fully pushdown/prune transparent to Catalyst. Tests exec the reference's own
function source and fuzz both against each other (tests/test_normalize.py).

Documented reference quirks we replicate deliberately (they define the
clusters our F1 is scored against):

* ``filter_word`` truncates at the *earliest* occurrence of any stop phrase.
  (The reference loops phrases in list order, truncating repeatedly; since a
  cut never creates a new match and a later cut position is always superseded
  by an earlier one, the loop converges to a single truncation at the minimum
  first-occurrence position — which is exactly what one leftmost-match regex
  alternation computes.)
* The trailing ``" as"`` strip at automation_final2.py:317-318 is a dead store
  (``sen == sen[:-3]`` compares instead of assigning) — so trailing " as" is
  NOT stripped. We do not strip it either.
* ``preprocess_text`` removes all spaces *before* mapping punctuation to
  spaces, so the isolated-single-letter rule only fires between punctuation
  ("j.p. morgan" → "jmorgan").
* The ``split('/')[-1]`` step at automation_final2.py:184 is dead code ('/'
  was already mapped to space two steps earlier); kept for shape, not effect.
* ``city_change`` does ordered substring replaces; 'ny'→'newyork' fires on any
  embedded 'ny' ("albany" → "albanewyork"). Replicated.

Null handling diverges by design: the reference str()-ifies NaN into the
literal "nan"; we keep SQL NULL as NULL (coalesced to '' before the kernels
so expressions never propagate null mid-chain).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered legal-role stop-phrase list — data, transcribed from the reference's
# filter_word table (automation_final2.py:200-310). Order no longer matters
# (see module docstring) but is preserved for auditability. Lowercased here
# once; the reference lowercases the input then calls word.lower() per probe.
STOP_PHRASES: tuple[str, ...] = (
    " administrativeagent",
    " administrative agent",
    " collateral agent",
    " facility agent",
    " agent",
    " structuring",
    " secured creditor",
    " securedcreditor",
    " assignee",
    " secured party",
    " securedparty",
    " d/b/a",
    " loan operations",
    " individual capacity",
    " individualcapacity",
    " as ownwer",
    " asownwer",
    " as trustee",
    " astrustee",
    " trust admin",
    " trustadmin",
    " formerly known",
    " also known",
    " as known as",
    " also known as",
    " trust administration",
    " trustadministration",
    " owner trustee",
    " ownertrustee",
    " as successor by assignment",
    " assuccessorbyassignment",
    " holders of",
    " holdersof",
    " through certificates",
    " throughcertificates",
    " as trustee or the benefit of the holder",
    " astrusteeorthebenefitoftheholder",
    " as trustee or registered holder",
    " on behalf of",
    " onbehalfof",
    " capacity as",
    " capacityas",
    " successor or in interest",
    " successororininterest",
    " by merger to",
    " bymergerto",
    " solely as nominee",
    " solelyasnominee",
    " isaoa",
    " isaoaati",
    " isaoaatima",
    " fka",
    " for istelf & agent",
    " foristelf&agent",
    " a division of",
    " adivisionof",
    " attorney general",
    " attorneygeneral",
    " solely",
    " national association",
    " national associatio",
    " national associati",
    " nationl association",
    " natonal association",
    " natoinal association",
    " not individually",
    " notindividually",
    " but solely",
    " butsolely",
    " collateral",
    " trustee",
    " certificate",
    " successor",
    " formerly",
    " as purchase",
    " aspurchase",
    " notinits",
    " not inits",
    " as master",
    " asmaster",
    " as indenture",
    " asindenture",
    " asmortage",
    " as mortage",
    " asoffshore",
    " as off shore",
    " as offshore",
    " asprogram",
    " as program",
    " astax",
    " as tax",
    " asfinal",
    " as final",
    " asfiscal",
    " as fiscal",
    " asdeposite",
    " as deposite",
    " ascustodian",
    " as custodian",
    " asbond",
    " as bond",
    " assecurity",
    " as security",
    " llc",
    " attn",
    " attention",
    " dba",
    " limited",
)

# Corporate-suffix router list (automation_final2.py:346): rows whose original
# name ends with one of these (and doesn't mention bank/credit union) skip the
# FDIC/CU cascade and go straight to the D&B directory.
CORPORATE_SUFFIXES: tuple[str, ...] = (
    " llc", " llp", " limited liability partnership",
    " limited liability company", " l.l.c", " l.l.c.", " ll.c.", " inc",
    " corp.", " inc.", " corp", " ltd", " ltd.", " llc.", " co.", " co",
    " lp", " lp.", " limited liability co.", " limited liability co",
    " limited liability compa", " limited liability comp",
    ",llc", ",llp", ",limited liability partnership",
    ",limited liability company", ",l.l.c", ",l.l.c.", ",ll.c.", ",inc",
    ",corp.", ",inc.", ",corp", ",ltd", ",ltd.", ",llc.", ",co.", ",co",
    ",lp", ",lp.", ",limited liability co.", ",limited liability co",
    ",limited liability compa", ",limited liability comp",
)

# Credit-union gate suffixes (automation_final2.py:834).
CREDIT_UNION_SUFFIXES: tuple[str, ...] = (" cu", " fcu", ",cu", ",fcu", " union")

# Ordered city alias rewrites (automation_final2.py:327-335).
CITY_ALIASES: tuple[tuple[str, str], ...] = (
    ("saint", "st"),
    ("nyc", "newyork"),
    ("ny", "newyork"),
    ("mount", "mt"),
)

_STOP_ALTERNATION = "|".join(re.escape(p) for p in STOP_PHRASES)


def _nn(col: Column) -> Column:
    return F.coalesce(col.cast("string"), F.lit(""))


def filter_word_col(col: Column) -> Column:
    """Legal-role truncation (reference filter_word, automation_final2.py:188-325)."""
    c = _nn(col)
    c = F.regexp_replace(c, r"\(.*?\)", "")
    c = F.lower(c)
    # take text before the first comma (split always yields >=1 element)
    c = F.split(c, ",").getItem(0)
    # reference: if ' as ' present, cut at the first ' as' (which may be an
    # earlier, different occurrence, e.g. inside ' association')
    c = F.when(c.contains(" as "), F.split(c, " as").getItem(0)).otherwise(c)
    # earliest stop-phrase truncation (leftmost alternation match + tail)
    c = F.regexp_replace(c, "(?s)(" + _STOP_ALTERNATION + ").*$", "")
    # trailing ' as' intentionally NOT stripped (reference dead store, see docstring)
    c = F.regexp_replace(c, " na$", "")
    c = F.regexp_replace(c, " inc$", "")
    c = F.regexp_replace(c, "&", "and")
    return c


def preprocess_text_col(col: Column) -> Column:
    """Compression to a squashed alnum key (reference preprocess_text,
    automation_final2.py:166-186)."""
    c = _nn(col)
    c = F.regexp_replace(c, r"\(.*?\)", "")
    c = F.lower(c)
    c = F.regexp_replace(c, " ", "")
    c = F.regexp_replace(c, "[^a-zA-Z0-9]", " ")
    c = F.regexp_replace(c, r"\s+[a-zA-Z]\s+", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.regexp_replace(c, "[0-9]", " ")
    # reference splits on '/' and keeps the last segment; dead by this point
    # ('/' became a space four steps up) but kept for 1:1 shape
    c = F.element_at(F.split(c, "/"), -1)
    c = F.regexp_replace(F.trim(c), " ", "")
    return c


def city_change_col(col: Column) -> Column:
    """Ordered city alias rewrites (reference city_change, automation_final2.py:327-335)."""
    c = _nn(col)
    for old, new in CITY_ALIASES:
        c = F.regexp_replace(c, re.escape(old), new)
    return c


def normalize_name_col(col: Column) -> Column:
    """Full name pipeline as applied to every registry + input name:
    filter_word then preprocess_text (automation_final2.py:342-343, 355-356)."""
    return preprocess_text_col(filter_word_col(col))


def normalize_city_col(col: Column) -> Column:
    """City pipeline: preprocess_text then city_change
    (automation_final2.py:344-345, 357-358)."""
    return city_change_col(preprocess_text_col(col))


def is_corporate_routed_col(original_name: Column) -> Column:
    """Router predicate (automation_final2.py:346-348): ends with a corporate
    suffix, or starts with 'city of' — and does not mention bank/credit union.
    True ⇒ DNB-only stream; False ⇒ full FDIC/CU cascade stream."""
    low = F.lower(_nn(original_name))
    ends = F.lit(False)
    for suf in CORPORATE_SUFFIXES:
        ends = ends | low.endswith(suf)
    starts = low.startswith("city of")
    mentions_fi = low.rlike("bank|credit union")
    return (ends & ~mentions_fi) | (starts & ~mentions_fi)


def is_credit_union_col(original_name: Column) -> Column:
    """Credit-union gate (automation_final2.py:834): original name ends with a
    CU suffix ⇒ credit-union cascade, else bank/DNB cascade."""
    low = F.lower(_nn(original_name))
    pred = F.lit(False)
    for suf in CREDIT_UNION_SUFFIXES:
        pred = pred | low.endswith(suf)
    return pred
