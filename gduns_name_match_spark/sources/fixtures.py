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
    gazetteer_rows: list[dict]


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
            g = rng.choice(groups)
            mention = _perturb(g.canonical, g.kind, rng, typos=typos)
            span_pos = len(spans)
            spans.append(("name", mention, "", offset))
            offset += rng.randint(1, 5)
            mention_truth.append(
                {
                    "mention_id": f"{doc_id}#{span_pos}",
                    "doc_id": doc_id,
                    "span_pos": span_pos,
                    "raw_name": mention,
                    "true_gdun": g.gdun,
                    "ambiguous": g.canonical in ambiguous_names,
                }
            )
        if rng.random() < 0.4:
            spans.append(("media", "", _media_ref(rng), offset))
        documents_rows.append({"doc_id": doc_id, "spans": spans})

    # FDIC/CU registries + events derived from bank/cu groups
    fdic_rows, fdic_event_rows = [], []
    cu_active_rows, cu_mna_rows = [], []
    fdic_id, rssd = 3_000, 7_000
    bank_groups = [g for g in groups if g.kind == "bank"]
    for g in bank_groups:
        branches = rng.randint(1, 3)
        hq = rng.randrange(branches)
        for b in range(branches):
            city, st = rng.choice(_CITIES)
            fdic_rows.append(
                {
                    "fdic_id": fdic_id, "name": g.canonical, "city": city,
                    "state": st, "mainoff": 1 if b == hq else 0, "source": "FDIC",
                    "gl_ult_dun": g.gdun,
                }
            )
        fdic_id += 1
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


def gazetteer_df(spark: SparkSession, fx: Fixture) -> DataFrame:
    return spark.createDataFrame(fx.gazetteer_rows)
