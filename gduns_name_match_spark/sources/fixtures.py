"""Deterministic synthetic fixtures (FIXTURES.md): spans-shaped documents,
registry tables, and ground-truth labels.

Everything is a pure function of (seed, size); no external data. The label
generator perturbs canonical names with exactly the noise the reference's
normalization cascade is built to undo (legal-role suffixes from filter_word
automation_final2.py:200-310, punctuation/digit/spacing noise from
preprocess_text automation_final2.py:166-186, corporate suffixes from the
router list automation_final2.py:346, credit-union suffixes
automation_final2.py:834) — so the reference's semantics define is_match.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gduns_name_match_spark.functions.normalize import (
    CORPORATE_SUFFIXES,
    CREDIT_UNION_SUFFIXES,
)


def _cu_gate(name: str) -> bool:
    """The reference's credit_proccess gate (automation_final2.py:834): the
    CU fallback branches only run when the ORIGINAL name keeps a CU suffix.
    Perturbation can strip it — then the row dies in the DNB fallback."""
    return name.lower().endswith(CREDIT_UNION_SUFFIXES)


def _corp_gate(name: str) -> bool:
    """Python twin of is_corporate_routed_col (automation_final2.py:346-348):
    corporate-suffixed (or 'city of') names that never say bank/credit union
    route to the DNB-only stream and skip the whole FDIC/CU cascade."""
    low = name.lower()
    mentions_fi = "bank" in low or "credit union" in low
    if mentions_fi:
        return False
    return low.endswith(CORPORATE_SUFFIXES) or low.startswith("city of")

# ---------------------------------------------------------------- word stock

_ADJ = [
    "first", "citizens", "farmers", "pioneer", "liberty", "summit",
    "heritage", "golden", "valley", "lakeside", "prairie", "granite",
    "harbor", "cascade", "meridian", "sterling", "beacon", "frontier",
    "keystone", "redwood",
]
_BANK_KIND = [
    "national bank", "state bank", "community bank", "savings bank",
    "trust company", "bancorp", "financial group",
]
_CU_ADJ = [
    "navy", "teachers", "municipal", "electric", "coastal",
    "mountain", "desert schools", "public service",
]
_CU_KIND = ["federal credit union", "credit union"]
_CORP_A = ["acme", "zenith", "apex", "vertex", "nimbus", "quantum", "atlas", "orion"]
_CORP_B = ["capital", "holdings", "leasing", "partners", "ventures", "equipment finance"]

_CITIES = [
    ("Denver", "CO"), ("Omaha", "NE"), ("Austin", "TX"), ("Boise", "ID"),
    ("Fargo", "ND"), ("Tulsa", "OK"), ("Reno", "NV"), ("Salem", "OR"),
    ("Topeka", "KS"), ("Macon", "GA"), ("Provo", "UT"), ("Waco", "TX"),
    ("Akron", "OH"), ("Flint", "MI"), ("Peoria", "IL"), ("Tampa", "FL"),
    ("Mobile", "AL"), ("Laredo", "TX"), ("Gilbert", "AZ"), ("Durham", "NC"),
    ("Saint Paul", "MN"), ("Mount Vernon", "WA"), ("Albany", "NY"),
    ("Helena", "MT"), ("Dover", "DE"),
]

_PROSE_WORDS = (
    "filing statement collateral secured party debtor amendment continuation "
    "termination lien equipment inventory proceeds accounts fixtures"
).split()

_STOP_SUFFIXES = [
    ", as trustee", " as trustee", ", as collateral agent", " collateral agent",
    ", solely as nominee", " on behalf of the holders", ", attn corporate desk",
    " dba lending services", ", national association", " as administrativeagent",
]
# note: ' corp.'/' ltd' are NOT in the reference's stop list, so they only
# vanish via the comma-split — keep them as comma variants to stay within
# what normalization provably undoes
_CORP_TAILS = [" llc", ", llc", " inc", ", inc.", ", corp.", ", ltd", " co."]
_CU_TAILS = [" cu", " fcu"]


@dataclass
class EntityGroup:
    gdun: int
    kind: str                      # 'bank' | 'cu' | 'corp'
    canonical: str                 # raw canonical name (pre-normalization)
    members: list[dict] = field(default_factory=list)  # registry rows


@dataclass
class Fixture:
    groups: list[EntityGroup]
    registry_rows: list[dict]      # dnb_directory
    documents_rows: list[dict]     # spans-shaped documents
    mention_truth: list[dict]      # mention_id -> gdun ground truth
    fdic_rows: list[dict]
    fdic_event_rows: list[dict]
    cu_active_rows: list[dict]
    cu_mna_rows: list[dict]
    cu_closed_rows: list[dict]
    gazetteer_rows: list[dict]


# Entities that exercise specific cascade branches (FIXTURES.md §4
# cascade_cases). None of these names exist in dnb/fdic_active/cu_active.
_RETIRED_CUS = [
    "lakeshore employees credit union",
    "granger county credit union",
    "old dominion federal credit union",
]
_LQ_BANKS = [
    "midland merchants bank",
    "plains exchange bank",
    "commerce guaranty bank",
]
_RENAMED_BANKS = [  # old name → merged into an active bank group
    "blue ridge savings bank",
    "cumberland traders bank",
]
_MNA_OLD_CUS = [  # old CU name → merged into an active CU group
    "tri county postal credit union",
    "harbor city municipal credit union",
]
_MULTI_PARENT_BANKS = [  # old name with TWO distinct event parents →
    # multi-parent emission (TEMP2='Y') → -45000 collapse
    "ozark plains merchants bank",
]
# path-B lone-parent CU re-probe entities (automation_final2.py:1283-1316;
# opt-in via generate(n_cu_reprobe=...) — appended AFTER the main rng stream
# so the v4 bench corpus stays bit-identical): CU-suffixed old names whose
# single chained parent has NO FDIC-active row. Even-indexed parents sit in
# CU-active + DNB (→ title_cu, truth = the parent's gdun); odd-indexed
# parents exist ONLY in the events registry while the MENTION has its own
# DNB row (→ title_dnb, truth = the mention's gdun).
_CU_REPROBE_OLD = [
    ("riverbend mill workers cu", "stonegate holdings cooperative"),
    ("foundry district employees fcu", "ironworks benefit society"),
    ("quarry lake operators cu", "fieldhouse mutual alliance"),
    ("dockside stevedores fcu", "wharfline provident circle"),
]


def _media_ref(rng: random.Random) -> str:
    return "m://" + hashlib.md5(str(rng.random()).encode()).hexdigest()[:12]


def _make_groups(rng: random.Random, n_groups: int | None = None) -> list[EntityGroup]:
    """Entity groups with globally unique canonical stems.

    The base universe is ~200 well-separated stems (used by the F1 gate);
    when ``n_groups`` asks for more (bench corpora), city-qualified bank
    variants extend it combinatorially — those stems share long prefixes, so
    the bench workload is *harder* (denser blocks) than the gate corpus."""
    groups: list[EntityGroup] = []
    gdun = 10_000
    for adj in _ADJ:
        for kind in _BANK_KIND:
            groups.append(EntityGroup(gdun, "bank", f"{adj} {kind}"))
            gdun += 1
    for adj in _CU_ADJ:
        for kind in _CU_KIND:
            groups.append(EntityGroup(gdun, "cu", f"{adj} {kind}"))
            gdun += 1
    for a in _CORP_A:
        for b in _CORP_B:
            groups.append(EntityGroup(gdun, "corp", f"{a} {b}"))
            gdun += 1
    if n_groups is not None and n_groups > len(groups):
        extra = []
        for adj in _ADJ:
            for kind in _BANK_KIND:
                for city, _st in _CITIES:
                    extra.append((adj, kind, city))
        rng.shuffle(extra)
        for adj, kind, city in extra[: n_groups - len(groups)]:
            groups.append(EntityGroup(gdun, "bank", f"{adj} {kind} of {city.lower()}"))
            gdun += 1
    rng.shuffle(groups)
    return groups


def _perturb(name: str, kind: str, rng: random.Random, typos: bool = False) -> str:
    """Noise the normalization kernel provably undoes (see module docstring).

    ``typos=True`` additionally injects transposition typos — noise the
    reference does NOT always undo (cosine may exceed 0.2), so it is only for
    unlabeled bench corpora, never the F1-gate corpus."""
    s = name
    r = rng.random()
    if r < 0.25:
        s += rng.choice(_STOP_SUFFIXES)
    elif r < 0.45:
        s += rng.choice(_CU_TAILS if kind == "cu" else _CORP_TAILS)
    elif r < 0.55:
        s += " (" + rng.choice(["formerly known", "a delaware entity", "est 1902"]) + ")"
    elif r < 0.65:
        s += " " + str(rng.randint(1, 9999))  # digits are stripped
    if rng.random() < 0.3:
        s = s.upper()
    elif rng.random() < 0.3:
        s = s.title()
    if rng.random() < 0.2:
        s = s.replace(" ", "  ", 1)  # doubled space
    if rng.random() < 0.15 and " and " in s:
        s = s.replace(" and ", " & ", 1)
    # a single transposition typo on long names: survives normalization, so
    # it exercises the fuzzy (cosine) acceptor rather than exact key equality
    if typos and rng.random() < 0.15 and len(name) >= 18:
        i = rng.randint(5, len(s) - 3)
        if s[i] != " " and s[i + 1] != " ":
            s = s[:i] + s[i + 1] + s[i] + s[i + 2 :]
    return s


def generate(
    n_docs: int = 300,
    seed: int = 42,
    ambiguous_frac: float = 0.03,
    n_groups: int | None = None,
    typos: bool = False,
    n_cu_reprobe: int = 0,
) -> Fixture:
    """Build the full deterministic fixture set.

    ambiguous_frac of groups get a twin group sharing the same canonical name
    under a different gl_ult_dun — exercising the reference's 'Multiple GDUNS'
    -67000 path (automation_final2.py:516-517); their mentions are excluded
    from F1 labels and asserted on separately.
    """
    rng = random.Random(seed)
    groups = _make_groups(rng, n_groups)

    # ambiguous twins: same canonical, new gdun
    n_amb = max(1, int(len(groups) * ambiguous_frac))
    twins = []
    for g in groups[:n_amb]:
        twins.append(EntityGroup(g.gdun + 90_000, g.kind, g.canonical))
    ambiguous_names = {g.canonical for g in groups[:n_amb]}
    groups = groups + twins

    # registry (dnb_directory-shaped) — canonical members with branches
    registry_rows: list[dict] = []
    duns = 500_000
    for g in groups:
        for _ in range(rng.randint(1, 4)):
            city, st = rng.choice(_CITIES)
            row = {
                "duns_num": duns,
                "company": g.canonical,
                "city": city,
                "st": st,
                "gl_ult_dun": g.gdun,
                "gl_ult_nam": g.canonical,
                "ln_of_bus": "commercial banking" if g.kind != "corp" else "equipment leasing",
                "cur_rec_ind": "Y",
            }
            g.members.append(row)
            registry_rows.append(row)
            duns += 1

    # special cascade entities: ~6% of mentions reference entities that only
    # resolve through closed/LQ/merger paths (see _RETIRED_CUS etc.)
    # parent pool avoids indices that appear as chain children in the A→B→C
    # merger events below (children sit at i, i+1 for i ∈ {0, 9, 18, ...}),
    # so a renamed bank's truth gdun equals its ultimate chained parent
    _banks_all = [g for g in groups if g.kind == "bank"]
    bank_groups_for_parents = [
        g
        for idx, g in enumerate(_banks_all)
        if idx % 9 in (3, 4, 5, 6) and g.canonical not in ambiguous_names
    ][:4]
    cu_groups_for_parents = [
        g for g in groups if g.kind == "cu" and g.canonical not in ambiguous_names
    ][:4]
    renamed_parent = {
        name: bank_groups_for_parents[i % len(bank_groups_for_parents)]
        for i, name in enumerate(_RENAMED_BANKS)
    }
    mna_parent = {
        name: cu_groups_for_parents[i % len(cu_groups_for_parents)]
        for i, name in enumerate(_MNA_OLD_CUS)
    }

    # round-5 per-parent geo-gate support (reference automation_final2.py
    # :1076-1137): chain-child banks (events children a, b of each A→B→C
    # merger) enter the title chain whenever their FDIC city gate fails —
    # the reference then geo-gates every parent and, failing all fallbacks,
    # lands Manual. The fixture therefore (a) covers every member city with
    # an FDIC branch for chain children, so geo-carrying mentions ALWAYS
    # pass the city gate and resolve fdic_active, and (b) stamps geo-less
    # chain-child mentions with the reference's Manual truth.
    chain_children = set()
    for _i in range(0, len(_banks_all) - 2, 9):
        chain_children.add(_banks_all[_i].canonical)
        chain_children.add(_banks_all[_i + 1].canonical)
    # multi-parent mentions must carry geo that BOTH event parents' FDIC
    # branches accept (the reference counts city-ACCEPTED parents for the
    # TEMP2 emission) — a deterministic shared location per entity, with
    # matching parent branches appended in the FDIC build below
    mp_geo = {
        name: _CITIES[i % len(_CITIES)]
        for i, name in enumerate(_MULTI_PARENT_BANKS)
    }

    def _draw_entity() -> tuple[str, str, int, str | None, EntityGroup | None]:
        """(canonical, kind, true_gdun, expected_status, group) per mention."""
        r = rng.random()
        if r < 0.02 and _RETIRED_CUS:
            return rng.choice(_RETIRED_CUS), "cu", -21000, "liquidated", None
        if r < 0.04 and _LQ_BANKS:
            return rng.choice(_LQ_BANKS), "bank", -21000, "liquidated", None
        if r < 0.06 and _RENAMED_BANKS:
            name = rng.choice(_RENAMED_BANKS)
            return name, "bank", renamed_parent[name].gdun, "title_change", None
        if r < 0.08 and _MNA_OLD_CUS:
            name = rng.choice(_MNA_OLD_CUS)
            return name, "cu", mna_parent[name].gdun, "cu_mna", None
        if r < 0.09 and _MULTI_PARENT_BANKS:
            # two distinct event parents → all per-parent decision rows are
            # kept (TEMP2='Y'); the -45000 truth lands after the collapse
            return rng.choice(_MULTI_PARENT_BANKS), "bank", -45000, "multi_parent", None
        g = rng.choice(groups)
        return g.canonical, g.kind, g.gdun, None, g

    # documents: interleaved spans with strictly increasing offsets
    documents_rows: list[dict] = []
    mention_truth: list[dict] = []
    for d in range(n_docs):
        doc_id = f"doc{d:06d}"
        spans = []
        offset = 0
        n_names = rng.randint(1, 3)
        for _ in range(n_names):
            # leading prose / media filler
            for _ in range(rng.randint(0, 2)):
                if rng.random() < 0.5:
                    spans.append(("media", "", _media_ref(rng), offset))
                else:
                    prose = " ".join(rng.choices(_PROSE_WORDS, k=rng.randint(3, 8)))
                    spans.append(("text", prose, "", offset))
                offset += rng.randint(1, 5)
            canonical, kind, true_gdun, expected_status, group = _draw_entity()
            mention = _perturb(canonical, kind, rng, typos=typos)
            # CU-branch truths hold only if the perturbed mention still
            # passes the reference's suffix gate; otherwise the row ends in
            # the DNB fallback → Manual (-1)
            if (
                kind == "cu"
                and expected_status in ("liquidated", "cu_mna")
                and not _cu_gate(mention)
            ):
                true_gdun, expected_status = -1, "manual_gate"
            # ~60% of normal mentions carry the geography of one of their
            # entity's registry rows (the reference's current_run rows carry
            # CITY/STATE) — these exercise the city/state/HQ decision rungs;
            # the rest stay geo-less like round-3's corpus
            if group is not None and group.members and rng.random() < 0.6:
                member = rng.choice(group.members)
                m_city, m_state = member["city"], member["st"]
            else:
                m_city, m_state = "", ""
            if expected_status == "multi_parent":
                m_city, m_state = mp_geo[canonical]
            # chain-child truth under reference semantics: a geo-carrying
            # mention passes the (member-city-covering) FDIC gate and
            # resolves fdic_active; a geo-less one fails the gate, enters
            # the title chain, fails every parent's state-exact gate and
            # every fallback, and ends Manual (:1203-1219). Corporate-routed
            # perturbations skip the whole bank cascade (stream 2) and twins
            # keep their own ambiguity semantics — neither is chain-tagged.
            if (
                group is not None
                and group.canonical in chain_children
                and group.canonical not in ambiguous_names
                and not _corp_gate(mention)
            ):
                if m_city:
                    expected_status = "chain_child_geo"
                else:
                    true_gdun, expected_status = -1, "chain_child_manual"
            span_pos = len(spans)
            spans.append(("name", mention, "", offset))
            offset += rng.randint(1, 5)
            mention_truth.append(
                {
                    "mention_id": f"{doc_id}#{span_pos}",
                    "doc_id": doc_id,
                    "span_pos": span_pos,
                    "raw_name": mention,
                    "city": m_city,
                    "state": m_state,
                    "true_gdun": true_gdun,
                    # excluded from pairwise-F1 labels: ambiguous names (no
                    # single truth cluster) and sentinel-path entities
                    "ambiguous": canonical in ambiguous_names
                    or expected_status is not None,
                    "expected_status": expected_status,
                }
            )
        if rng.random() < 0.4:
            spans.append(("media", "", _media_ref(rng), offset))
        documents_rows.append({"doc_id": doc_id, "spans": spans})

    # FDIC/CU registries + events derived from bank/cu groups
    fdic_rows, fdic_event_rows = [], []
    cu_active_rows, cu_mna_rows = [], []
    fdic_id, rssd = 3_000, 7_000
    fdic_id_by_name: dict[str, int] = {}
    bank_groups = [g for g in groups if g.kind == "bank"]
    for g in bank_groups:
        fdic_id_by_name[g.canonical] = fdic_id
        branches = rng.randint(1, 3)
        hq = rng.randrange(branches)
        for b in range(branches):
            # FDIC branch cities correlate with the bank's DNB registry
            # cities (same physical institution) half the time — this is
            # what lets a city-carrying mention pass the reference's FDIC
            # city gate (active_proccess :981)
            if g.members and rng.random() < 0.5:
                m = rng.choice(g.members)
                city, st = m["city"], m["st"]
            else:
                city, st = rng.choice(_CITIES)
            fdic_rows.append(
                {
                    "fdic_id": fdic_id, "name": g.canonical, "city": city,
                    "state": st, "mainoff": 1 if b == hq else 0, "source": "FDIC",
                    "gl_ult_dun": g.gdun,
                }
            )
        fdic_id += 1
    # chain children: one branch per member city not already covered (no rng
    # — the v4 stream must not shift), so any member-drawn mention city
    # EXACTLY matches an FDIC branch and the city gate accepts
    for g in bank_groups:
        if g.canonical not in chain_children:
            continue
        covered = {
            r["city"] for r in fdic_rows if r["name"] == g.canonical
        }
        for mrow in g.members:
            if mrow["city"] in covered:
                continue
            covered.add(mrow["city"])
            fdic_rows.append(
                {
                    "fdic_id": fdic_id_by_name[g.canonical],
                    "name": g.canonical, "city": mrow["city"],
                    "state": mrow["st"], "mainoff": 0, "source": "FDIC",
                    "gl_ult_dun": g.gdun,
                }
            )
    # merger chains A→B→C among consecutive bank groups
    for i in range(0, len(bank_groups) - 2, 9):
        a, b, c = bank_groups[i : i + 3]
        fdic_event_rows.append(
            {"fdic_id": 3_000 + i, "name": a.canonical, "parent_fdic_id": 3_000 + i + 1,
             "parent_name": b.canonical, "effdate": "2019-03-01", "source": "MNA",
             "new_event_ind": 0}
        )
        fdic_event_rows.append(
            {"fdic_id": 3_000 + i + 1, "name": b.canonical, "parent_fdic_id": 3_000 + i + 2,
             "parent_name": c.canonical, "effdate": "2021-06-15", "source": "MNA",
             "new_event_ind": 0}
        )
    for g in (g for g in groups if g.kind == "cu"):
        city, st = rng.choice(_CITIES)
        cu_active_rows.append(
            {"id_rssd": rssd, "ncua_id": rssd + 10_000, "name": g.canonical,
             "city": city, "state": st, "source": "NCUA", "gl_ult_dun": g.gdun}
        )
        rssd += 1

    # cascade-branch entities (see _RETIRED_CUS et al.)
    cu_closed_rows = [
        {"id_rssd": 90_000 + i, "ncua_id": 95_000 + i, "name": name,
         "city": rng.choice(_CITIES)[0], "state": rng.choice(_CITIES)[1],
         "source": "NCUA"}
        for i, name in enumerate(_RETIRED_CUS)
    ]
    for i, name in enumerate(_LQ_BANKS):
        fdic_event_rows.append(
            {"fdic_id": 80_000 + i, "name": name, "parent_fdic_id": -1,
             "parent_name": "", "effdate": "2018-05-01", "source": "LQ",
             "new_event_ind": 0}
        )
        # the reference's BANK-Liquidates -21000 fires only on the
        # city-failed-FDIC path's co==0 fall-through (:1157-1170) — a name
        # absent from FDIC active takes path B, where SOURCE is zeroed
        # before the LQ check (:1396). So LQ banks carry an FDIC-active row
        # (deterministic city; LQ mentions are geo-less → the city gate
        # always fails → path A → -21000)
        _lq_city, _lq_st = _CITIES[(i + 3) % len(_CITIES)]
        fdic_rows.append(
            {"fdic_id": 85_000 + i, "name": name, "city": _lq_city,
             "state": _lq_st, "mainoff": 1, "source": "FDIC",
             "gl_ult_dun": -1}
        )
    for i, name in enumerate(_RENAMED_BANKS):
        parent = renamed_parent[name]
        fdic_event_rows.append(
            {"fdic_id": 81_000 + i, "name": name, "parent_fdic_id": 3_000,
             "parent_name": parent.canonical, "effdate": "2020-09-01",
             "source": "TC", "new_event_ind": 0}
        )
    # multi-parent: the SAME old name carries events to TWO distinct active
    # parents (reference list_of_vari emission, automation_final2.py:1090-1137)
    for i, name in enumerate(_MULTI_PARENT_BANKS):
        _mp_city, _mp_st = mp_geo[name]
        for j in range(2):
            parent = bank_groups_for_parents[
                (i + j) % len(bank_groups_for_parents)
            ]
            fdic_event_rows.append(
                {"fdic_id": 82_000 + 2 * i + j, "name": name,
                 "parent_fdic_id": 3_000, "parent_name": parent.canonical,
                 "effdate": f"2020-0{j + 1}-15", "source": "TC",
                 "new_event_ind": 0}
            )
            # both parents get a branch at the entity's shared mention
            # location, so BOTH pass the per-parent state-exact + city gate
            # and the TEMP2='Y' multi-parent emission fires on city-ACCEPTED
            # parents exactly like the reference (:1090-1137)
            fdic_rows.append(
                {"fdic_id": fdic_id_by_name[parent.canonical],
                 "name": parent.canonical, "city": _mp_city,
                 "state": _mp_st, "mainoff": 0, "source": "FDIC",
                 "gl_ult_dun": parent.gdun}
            )
    for i, name in enumerate(_MNA_OLD_CUS):
        parent = mna_parent[name]
        cu_mna_rows.append(
            {"old_ncua_id": 70_000 + i, "new_ncua_id": 71_000 + i,
             "name": name, "parent_name": parent.canonical,
             "city": rng.choice(_CITIES)[0], "state": rng.choice(_CITIES)[1],
             "date_": "2021-02-01", "new_event_ind": 0, "source": "MNA"}
        )

    # path-B lone-parent CU re-probe appendix (automation_final2.py
    # :1283-1316; opt-in — see _CU_REPROBE_OLD). Everything here uses an
    # INDEPENDENT rng-free deterministic layout and only APPENDS rows
    # (extra docs after doc{n_docs-1}, new registry/event rows at the list
    # tails), so with n_cu_reprobe=0 — the default, and what bench.py uses —
    # the v4 corpus is bit-identical and cached bench parquet stays valid.
    for j in range(n_cu_reprobe):
        k = j % len(_CU_REPROBE_OLD)  # entity index: extra j's re-mention
        old_name, parent = _CU_REPROBE_OLD[k]
        is_cu_variant = k % 2 == 0
        city, st = _CITIES[(k * 3 + 1) % len(_CITIES)]
        gdun = (880_000 + k) if is_cu_variant else (890_000 + k)
        status = "title_cu" if is_cu_variant else "title_dnb"
        if j < len(_CU_REPROBE_OLD):  # registry/event rows once per entity
            # the single title-chain event: old → parent (CU-suffixed
            # mention, path B: neither name has an FDIC-active row)
            fdic_event_rows.append(
                {"fdic_id": 83_000 + k, "name": old_name,
                 "parent_fdic_id": -1, "parent_name": parent,
                 "effdate": "2020-04-01", "source": "TC",
                 "new_event_ind": 0}
            )
            if is_cu_variant:
                # parent in CU-active (the re-probe target) + DNB (the
                # dnb_c decision row) → title_cu, truth = the parent's gdun
                cu_active_rows.append(
                    {"id_rssd": 60_000 + k, "ncua_id": 65_000 + k,
                     "name": parent, "city": city, "state": st,
                     "source": "NCUA", "gl_ult_dun": gdun}
                )
                registry_rows.append(
                    {"duns_num": 900_000 + k, "company": parent,
                     "city": city, "st": st, "gl_ult_dun": gdun,
                     "gl_ult_nam": parent,
                     "ln_of_bus": "commercial banking", "cur_rec_ind": "Y"}
                )
            else:
                # parent exists ONLY in the events registry (CU probe
                # misses) → straight to DNB on the MENTION (:1314-1316) →
                # title_dnb, truth = the mention's own DNB gdun
                registry_rows.append(
                    {"duns_num": 905_000 + k, "company": old_name,
                     "city": city, "st": st, "gl_ult_dun": gdun,
                     "gl_ult_nam": old_name,
                     "ln_of_bus": "commercial banking", "cur_rec_ind": "Y"}
                )
        doc_id = f"doc{n_docs + j:06d}"
        documents_rows.append(
            {"doc_id": doc_id, "spans": [("name", old_name, "", 0)]}
        )
        mention_truth.append(
            {"mention_id": f"{doc_id}#0", "doc_id": doc_id, "span_pos": 0,
             "raw_name": old_name, "city": city, "state": st,
             "true_gdun": gdun, "ambiguous": True,
             "expected_status": status}
        )

    # title_change registry geo (reference columns CITY/STATE/PARENT_CITY —
    # the co==0 second loop probes them, automation_final2.py:1173-1204).
    # Drawn from an INDEPENDENT rng stream: the main `rng` stream defines
    # the v4 documents/registry corpus the bench parquet caches — adding
    # draws to it would silently shift every downstream entity and make
    # round-over-round bench numbers incomparable again (BENCH.md v2→v3
    # lesson). The event's own city/state = the OLD institution's location
    # (its FDIC HQ when it has one, else drawn); PARENT_CITY = the parent's
    # FDIC HQ city when the parent is an active bank, else drawn.
    rng_ev = random.Random(seed ^ 0x5EED)
    hq_by_name = {}
    for r in fdic_rows:
        if r["mainoff"] == 1:
            hq_by_name[r["name"]] = (r["city"], r["state"])
    for r in fdic_event_rows:
        own = hq_by_name.get(r["name"]) or rng_ev.choice(_CITIES)
        r["city"], r["state"] = own
        parent_hq = hq_by_name.get(r["parent_name"])
        r["parent_city"] = (
            parent_hq[0] if parent_hq else rng_ev.choice(_CITIES)[0]
        )

    gazetteer_rows = [
        {"city": c, "state": s, "count": 1} for c, s in _CITIES
    ]

    return Fixture(
        groups=groups,
        registry_rows=registry_rows,
        documents_rows=documents_rows,
        mention_truth=mention_truth,
        fdic_rows=fdic_rows,
        fdic_event_rows=fdic_event_rows,
        cu_active_rows=cu_active_rows,
        cu_mna_rows=cu_mna_rows,
        cu_closed_rows=cu_closed_rows,
        gazetteer_rows=gazetteer_rows,
    )


SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_TYPE)),
    ]
)


def documents_df(spark: SparkSession, fx: Fixture, partitions: int = 8) -> DataFrame:
    rows = [(r["doc_id"], r["spans"]) for r in fx.documents_rows]
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA).repartition(partitions, "doc_id")


def registry_df(spark: SparkSession, fx: Fixture) -> DataFrame:
    return spark.createDataFrame(fx.registry_rows)


def truth_df(spark: SparkSession, fx: Fixture) -> DataFrame:
    return spark.createDataFrame(fx.mention_truth)


def fdic_df(spark: SparkSession, fx: Fixture) -> DataFrame:
    return spark.createDataFrame(fx.fdic_rows)


def fdic_events_df(spark: SparkSession, fx: Fixture) -> DataFrame:
    return spark.createDataFrame(fx.fdic_event_rows)


def cu_active_df(spark: SparkSession, fx: Fixture) -> DataFrame:
    return spark.createDataFrame(fx.cu_active_rows)


def cu_mna_df(spark: SparkSession, fx: Fixture) -> DataFrame:
    return spark.createDataFrame(fx.cu_mna_rows)


def cu_closed_df(spark: SparkSession, fx: Fixture) -> DataFrame:
    return spark.createDataFrame(fx.cu_closed_rows)


def gazetteer_df(spark: SparkSession, fx: Fixture) -> DataFrame:
    return spark.createDataFrame(fx.gazetteer_rows)


def registries(spark: SparkSession, fx: Fixture):
    """Bundle all registry tables for plans/cascade.run_cascade."""
    from gduns_name_match_spark.plans.cascade import Registries

    return Registries(
        dnb=registry_df(spark, fx),
        fdic_active=fdic_df(spark, fx),
        fdic_events=fdic_events_df(spark, fx),
        cu_active=cu_active_df(spark, fx),
        cu_mna=cu_mna_df(spark, fx) if fx.cu_mna_rows else None,
        cu_closed=cu_closed_df(spark, fx) if fx.cu_closed_rows else None,
        gazetteer=gazetteer_df(spark, fx),
    )
