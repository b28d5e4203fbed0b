"""SPNV_MATCH_RAW-shaped compat view (reference automation_final2.py
:1482-1536): renames the engine's typed decision columns into the reference's
42-column insert schema so an output-level diff against a reference run is a
plain dataframe compare.

Audit/diagnostic columns are populated from the cascade's pass-1 per-registry
best distances and the DNB decision diagnostics (rename map
automation_final2.py:1508-1521): ACTIVE_NAME_DISTANCE ← the FDIC-active tag,
INACTIVE_TITLE_DISTANCE ← the events tag, CREDIT_UNION_*_DIST ← the cu tags,
DNB_NAME/CITY_DISTANCE ← the final DNB hop, PARENT_NAME_DISTANCE ← the DNB
hop when the branch resolved through a chained parent. DETAIL_INFO/COMMENTS/
FJ_GDUN_NAME carry the reference's composed strings ('Multiple GDUNS
found,{x}' :486-526, 'Data from DNB' :471, 'BANK Liquidates' :1162, …).
Columns the Spark pipeline genuinely does not compute (per-branch CITY probes
against FDIC rows, unique-id counters) remain typed NULLs, exactly like the
reference's own ``temp.fillna('null')`` + NULL-literal inserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# transcribed from the reference INSERT column list (automation_final2.py
# :1527) / reindex list (:1523) — order preserved
SPNV_MATCH_RAW_COLUMNS = [
    "PERM_ID", "SEC_PARTY_CMN_NM", "SEC_PARTY_COMPRESS_CMN_NM",
    "SEC_PARTY_ADDR_CITY_NM", "SEC_PARTY_ADDR_STATE_CD", "FLININGS_COUNT",
    "WK_DUNS", "WK_GDUN_NAME", "WK_GDUN", "COMPRESSES_SEC_PARTY_NAME",
    "COMPRESSES_SEC_PARTY_CITY", "COMPRESSES_SEC_PARTY_STATE",
    "FDIC_ACTIVE_PARENT", "FDIC_INACTIVE_PARENT_IDN",
    "FDIC_INACTIVE_PARENT_MAP", "FINAL_FDIC_PARENT", "FJ_GDUN",
    "FJ_GDUN_NAME", "MATCH_IND", "FJ_DUN_NAME", "FJ_DUNS", "DUNS_COUNT",
    "SOURCE", "DNB_UNIQUE_ID", "ACTIVE_UNIQUE_ID", "PARENT_UNIQUE_ID",
    "ACTIVE_NAME_DISTANCE", "ACTIVE_CITY_DISTANCE",
    "INACTIVE_TITLE_DISTANCE", "PARENT_NAME_DISTANCE",
    "PARENT_CITY_DISTANCE", "DNB_NAME_DISTANCE", "DNB_CITY_DISTANCE",
    "DETAIL_INFO", "COMMENTS", "CREDIT_UNION_PARENT",
    "CREDIT_UNION_ACTIVE_DIST", "CREDIT_UNION_CLOSED_DIST",
    "CREDIT_UNION_MNA_DIST", "TEMP1", "TEMP2", "LIST_OF_DUNS",
]

# stage → reference SOURCE code (automation_final2.py: 'DNB' default :556,
# FDIC branch SOURCE column, credit_proccess SOURCE= literals :854,890,924).
# The title-chain stages carry the matched title-registry row's OWN source
# through the cascade's branch_source column (dnb_proccess only defaults
# SOURCE when unset, :556-558) — these literals are the fallback when the
# registry row's source is blank.
_STAGE_SOURCE = {
    "fdic_active": "FDIC",
    "fdic_state": "FDIC",
    "title_change_lq": "LQ",
    "title_change": "TC",
    "title_change_loc": "TC",
    # the failed path-A chain zeroes SOURCE before going Manual (:1211)
    "title_manual": "",
    # path-B lone-parent CU re-probe (:1303/:1311)
    "title_cu": "CREDITUNION_ACTIVE",
    "cu_active": "CREDITUNION_ACTIVE",
    "cu_mna": "CREDITUNION_MNA",
    "cu_closed": "CREDITUNION_CLOSED",
}

# title-chain stages whose branch_source (the registry row's source) wins
# over the stage literal
_BRANCH_SOURCE_STAGES = ("title_change", "title_change_loc", "title_change_lq")

# stage → the `inp` literal the reference passes into dnb_proccess /
# dnb_c_proccess; Manual rows persist it as COMMENTS (:650-673). Call sites:
# corporate :1471, fallback :1249 (''), FDIC :1003, state-eq :1154, events
# :1124, CU :855, MNA :893. Branches with several sub-variant literals carry
# the dominant one.
_STAGE_MANUAL_COMMENT = {
    "dnb_corporate": "non banking/non credit union entities",
    "dnb_fallback": "",
    "fdic_active": "data from FDIC active file(name and city) with unique FDIC_ID",
    "fdic_state": "Fdic name and state matching and unique ID",
    "title_change": "data from FDIC Events",
    "title_change_loc": "data from FDIC Events",
    # path-A chain fall-through Manual (:1207-1208)
    "title_manual": "Bank with similar name in active and inactive but "
    "locations of either is not matching",
    "title_cu": "inactive parent mapped in FDIC to a active credit union",
    "title_dnb": "",
    "cu_active": "Data from credit unions active (unique id)",
    "cu_mna": "Data from credit unions MNA (unique id)",
}


def to_spnv_match_raw(decisions: DataFrame) -> DataFrame:
    """plans/cascade.run_cascade output → the 42-column reference shape."""
    src = F.lit("DNB")
    for stage, code in _STAGE_SOURCE.items():
        src = F.when(F.col("stage") == stage, code).otherwise(src)
    # the title-registry row's own SOURCE wins for chain rows — VERBATIM,
    # including a blank one (ADVICE r06): the reference's per-parent loop
    # always assigns SOURCE from the registry row (automation_final2.py:1080)
    # and dnb_proccess only defaults 'DNB' when SOURCE is entirely unset
    # (:557-558), so a blank registry value must pass through as blank
    # rather than fall back to the stage literal
    src = F.when(
        F.col("stage").isin(*_BRANCH_SOURCE_STAGES)
        & F.col("branch_source").isNotNull(),
        F.col("branch_source"),
    ).otherwise(src)
    ns = lambda: F.lit(None).cast("string")  # noqa: E731
    nd = lambda: F.lit(None).cast("double")  # noqa: E731
    nl = lambda: F.lit(None).cast("long")    # noqa: E731

    # composed diagnostics (automation_final2.py:471,520,547,592,650,930):
    # the 'Multiple GDUNS found,{z}' name list uses GL_ULT_NAMs when the
    # registry carries them, else the gdun ids (same shape, ids-for-names)
    multi_names = F.concat(
        F.lit("Multiple GDUNS found,"),
        F.when(F.col("list_of_gdun_names") != "", F.col("list_of_gdun_names"))
        .otherwise(F.col("list_of_gduns")),
    )
    # Manual rows persist the branch's `inp` literal as COMMENTS (:650-673).
    # Mentions with NO branch row at all (stage='manual') took the reference
    # route's own dnb_proccess call: corporate = spnv_check1's literal
    # (:1471), everything else the fallback's '' (:1249).
    manual_comment = F.when(
        F.col("stage") == "manual",
        F.when(
            F.col("route") == "corporate",
            F.lit("non banking/non credit union entities"),
        ).otherwise(F.lit("")),
    )
    for stage, lit in _STAGE_MANUAL_COMMENT.items():
        manual_comment = F.when(F.col("stage") == stage, F.lit(lit)).otherwise(
            manual_comment
        )
    comments = (
        F.when(F.col("match_status") == "matched_name",
               F.lit("unique gdun for assigned duns name"))
        .when(F.col("match_status").isin(
            "matched_city_tiebreak", "matched_state_tiebreak"),
            F.lit("Data from DNB"))
        .when(F.col("match_status") == "matched_hq_tiebreak",
              F.lit("Data from DNB using Headquaters"))
        .when(F.col("match_status") == "multiple_gduns",
              F.concat(F.lit("Multiple GDUNS found,"), F.col("list_of_gduns")))
        # the HQ rung's ambiguity carries its own literal
        # (automation_final2.py:640) — ADVICE r03 item 4
        .when(F.col("match_status") == "multiple_gduns_hq",
              F.concat(F.lit("Multiple GDUNS found for headquaters,"),
                       F.col("list_of_gduns")))
        .when(F.col("stage") == "cu_closed",
              F.lit("Data from credit unions closed (unique id)"))
        .when(F.col("match_status") == "manual", manual_comment)
        .otherwise(ns())
    )
    detail = (
        F.when(F.col("stage") == "cu_closed", F.lit("credit union Liquidates"))
        .when(F.col("stage") == "title_change_lq", F.lit("BANK Liquidates"))
        # path-B lone-parent CU re-probe (:1304/:1313)
        .when(F.col("stage") == "title_cu",
              F.lit("inactive parent mapped in FDIC to a active credit union"))
        .otherwise(ns())
    )
    gdun_name = (
        F.when(
            F.col("match_status").isin("multiple_gduns", "multiple_gduns_hq"),
            multi_names,  # gdun_name stays the generic literal even for the
                          # HQ rung (:630) — only COMMENTS gets the variant
        )
        .when(F.col("match_status") == "manual", F.lit("Manual"))
        .otherwise(F.col("gdun_name"))
    )

    return decisions.select(
        F.col("mention_id").alias("PERM_ID"),
        F.col("raw_name").alias("SEC_PARTY_CMN_NM"),
        ns().alias("SEC_PARTY_COMPRESS_CMN_NM"),
        ns().alias("SEC_PARTY_ADDR_CITY_NM"),
        ns().alias("SEC_PARTY_ADDR_STATE_CD"),
        nl().alias("FLININGS_COUNT"),
        nl().alias("WK_DUNS"),
        ns().alias("WK_GDUN_NAME"),
        F.col("old_gdun").cast("long").alias("WK_GDUN"),
        F.col("m_norm").alias("COMPRESSES_SEC_PARTY_NAME"),
        # normalized mention geo keys (reference carries the compressed
        # city/state through the whole run, :1508-1521)
        F.col("m_city_norm").alias("COMPRESSES_SEC_PARTY_CITY"),
        F.col("m_state").alias("COMPRESSES_SEC_PARTY_STATE"),
        # active_name (:1034/:1148/:1302): the matched FDIC-active name for
        # the bank branches, the matched CU name for the path-B re-probe
        F.when(
            F.col("stage").isin("fdic_active", "fdic_state", "title_cu"),
            F.col("hop_name"),
        )
        .otherwise(ns())
        .alias("FDIC_ACTIVE_PARENT"),
        # list_of_parents_from_fdic (:1523 rename) — x, threaded from the
        # per-parent gates (leading comma on co>0 rows, stripped on the
        # co==0 fall-throughs, exactly like :1132 vs :1172)
        F.col("list_parents_fdic").alias("FDIC_INACTIVE_PARENT_IDN"),
        # final_title (:1121/:1192/:1276) = the resolving chained parent
        F.when(
            F.col("stage").isin("title_change", "title_change_loc"),
            F.col("parent_norm"),
        )
        .otherwise(ns())
        .alias("FDIC_INACTIVE_PARENT_MAP"),
        # 'final active Name': the DNB hop's probe target — the matched FDIC
        # name (bank branches), the parent's matched FDIC-active name
        # (title_change :1120), or the parent itself (loc :1193)
        F.when(
            F.col("stage").isin(
                "fdic_active", "fdic_state", "title_change",
                "title_change_loc",
            ),
            F.col("hop_name"),
        )
        .otherwise(ns())
        .alias("FINAL_FDIC_PARENT"),
        F.col("gdun").cast("long").alias("FJ_GDUN"),
        gdun_name.alias("FJ_GDUN_NAME"),
        F.col("match_ind").alias("MATCH_IND"),
        # Manual rows carry dnb_name='Manual' in the reference (:659,:666),
        # never NULL — which also keeps the -45000 collapse's composed
        # FJ_DUN_NAME list aligned with its gdun list when a multi-parent
        # group contains a DNB-missed parent
        F.when(F.col("match_status") == "manual", F.lit("Manual"))
        .otherwise(F.col("best_name"))
        .alias("FJ_DUN_NAME"),
        F.col("fj_duns").cast("long").alias("FJ_DUNS"),
        F.col("duns_count").cast("long").alias("DUNS_COUNT"),
        src.alias("SOURCE"),
        nl().alias("DNB_UNIQUE_ID"),
        nl().alias("ACTIVE_UNIQUE_ID"),
        # parent_unique_count (:1063-1066): 1 iff the matched events name has
        # exactly one distinct parent, 0 otherwise, NULL off-chain
        F.col("parent_unique").cast("long").alias("PARENT_UNIQUE_ID"),
        F.col("active_name_dist").cast("double").alias("ACTIVE_NAME_DISTANCE"),
        # the FDIC branch's city-probe distance (reference active_city_dist,
        # automation_final2.py:980) — computed by the cascade's
        # _fdic_city_gate kernel
        F.col("active_city_dist").cast("double").alias("ACTIVE_CITY_DISTANCE"),
        F.col("inactive_title_dist").cast("double").alias("INACTIVE_TITLE_DISTANCE"),
        # Parent_active_distance (:1115) — p_ac_dis, the accepted parent's
        # own FDIC-probe distance, threaded from the per-parent gate
        # (VERDICT r05 task 2 — replaces the r04 DNB-hop stand-in)
        F.col("parent_active_dist").cast("double").alias(
            "PARENT_NAME_DISTANCE"
        ),
        # parent_city_distance (:1117) — p_c_d, which the reference assigns
        # from the per-parent STATE probe (:1088, quirk replicated)
        F.col("parent_city_dist").cast("double").alias(
            "PARENT_CITY_DISTANCE"
        ),
        F.col("best_dist").cast("double").alias("DNB_NAME_DISTANCE"),
        F.col("dnb_city_dist").cast("double").alias("DNB_CITY_DISTANCE"),
        detail.alias("DETAIL_INFO"),
        comments.alias("COMMENTS"),
        # Credit_final_parent (:854/:1300): the matched CU registry name —
        # the branch's first hop, not the DNB-matched name
        F.when(
            F.col("stage").isin("cu_active", "cu_mna", "title_cu"),
            F.col("hop_name"),
        )
        .otherwise(ns())
        .alias("CREDIT_UNION_PARENT"),
        F.col("cu_active_dist").cast("double").alias("CREDIT_UNION_ACTIVE_DIST"),
        F.col("cu_closed_dist").cast("double").alias("CREDIT_UNION_CLOSED_DIST"),
        F.col("cu_mna_dist").cast("double").alias("CREDIT_UNION_MNA_DIST"),
        # TEMP1: the reference stamps every row with its input-frame index
        # (automation_final2.py:1480) — the per-mention group marker the
        # -45000 collapse groups by; a stable hash of the mention id is the
        # engine's order-independent equivalent. TEMP2='Y' marks multi-parent
        # emissions (:1137).
        F.abs(F.xxhash64("mention_id")).alias("TEMP1"),
        F.col("temp2").alias("TEMP2"),
        F.col("list_of_duns").alias("LIST_OF_DUNS"),
    )
