"""Fellegi–Sunter pattern scoring + golden-record survivorship
(operators/dedup.py round-10 additions): hand-computed expectations on
tiny corpora, plus a pure-python weight reference mirroring the FS
definition (not the operator's code path).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cloud_native_reddit_data_pipeline_spark.operators import dedup


def _w(m: float, u: float) -> tuple[int, int]:
    return (
        int(round(math.log(m / u) * 1_000_000)),
        int(round(math.log((1 - m) / (1 - u)) * 1_000_000)),
    )


def test_fellegi_sunter_hand_case(spark):
    # one block, three records ->
    #   (1,2): name lev=1 agree, brand agree, type disagree
    #   (1,3): name lev=4 disagree, brand disagree, type agree
    #   (2,3): name disagree, brand disagree, type disagree
    rows = [
        (1, "alpha", "B1", "T1"),
        (2, "alphb", "B1", "T2"),
        (3, "gamma", "B2", "T1"),
    ]
    df = spark.createDataFrame(rows, "id long, name string, brand string, t string")
    out = dedup.fellegi_sunter_patterns(
        df,
        "id",
        F.lit("blk"),
        "name",
        ["brand", "t"],
        m_probs={"name": 0.95, "brand": 0.9, "t": 0.8},
        u_fuzzy=0.002,
        max_fuzzy_distance=2,
    ).collect()
    # exact u estimates: brand counts {B1:2, B2:1} -> 2/6; same for t
    u_exact = 2 / 6
    wa_n, wd_n = _w(0.95, 0.002)
    wa_b, wd_b = _w(0.9, u_exact)
    wa_t, wd_t = _w(0.8, u_exact)
    expected = {
        (True, True, False): (wa_n + wa_b + wd_t, 1),
        (False, False, True): (wd_n + wd_b + wa_t, 1),
        (False, False, False): (wd_n + wd_b + wd_t, 1),
    }
    got = {
        (r["agree_name"], r["agree_brand"], r["agree_t"]): (
            r["score_e6"],
            r["n_pairs"],
        )
        for r in out
    }
    assert got == expected


def test_fellegi_sunter_weight_ordering(spark):
    """Full agreement must outscore every partial pattern, and full
    disagreement must come last — the FS decision-table invariant."""
    # names pairwise levenshtein > 2, so name agreement is exact-bucket
    names = ["alpha", "bravo", "charlie", "delta"]
    rows = [(i, names[i % 4], f"B{i % 3}", f"T{i % 2}") for i in range(24)]
    df = spark.createDataFrame(rows, "id long, name string, brand string, t string")
    out = dedup.fellegi_sunter_patterns(
        df,
        "id",
        F.lit("blk"),
        "name",
        ["brand", "t"],
        m_probs={"name": 0.95, "brand": 0.9, "t": 0.8},
        u_fuzzy=0.002,
        max_fuzzy_distance=2,
    ).collect()
    scores = {
        (r["agree_name"], r["agree_brand"], r["agree_t"]): r["score_e6"] for r in out
    }
    full = scores[(True, True, True)]
    none = scores[(False, False, False)]
    for pat, s in scores.items():
        if pat != (True, True, True):
            assert s < full
        if pat != (False, False, False):
            assert s > none
    # flipping any single field to agree raises the score
    for i in range(3):
        for pat, s in scores.items():
            if not pat[i]:
                up = tuple(True if j == i else pat[j] for j in range(3))
                if up in scores:
                    assert scores[up] > s


def test_golden_records_hand_case(spark):
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "node long, label long"
    )
    recs = spark.createDataFrame(
        [
            (1, "B1", "T1", 5),
            (2, "B1", "T2", 4),
            (3, "B2", "T2", 6),
            (7, "B9", "T9", 3),
            (8, "B8", "T9", 9),
        ],
        "id long, brand string, t string, name_len int",
    )
    out = {
        r["label"]: r
        for r in dedup.golden_records(
            comps, recs, "id", ["brand", "t"], "name_len"
        ).collect()
    }
    # cluster 1: keeper = id 3 (longest name), modal brand B1 (2 of 3),
    # modal t = T2 (2 of 3), 3 members
    assert out[1]["keeper_id"] == 3 and out[1]["n_members"] == 3
    assert out[1]["golden_brand"] == "B1" and out[1]["golden_t"] == "T2"
    # cluster 7: keeper id 8; brand tie {B9, B8} -> lexicographic min B8
    assert out[7]["keeper_id"] == 8 and out[7]["n_members"] == 2
    assert out[7]["golden_brand"] == "B8" and out[7]["golden_t"] == "T9"
