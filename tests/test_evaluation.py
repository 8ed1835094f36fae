"""E1-E10 metric tests.

The golden fixture is the reference's own disabled hand fixture
(``/root/reference/indexing/evaluation.py:35-43``) re-enabled here:
R/A sets for two toy queries; expected values are hand-computed from
the reference formulas.
"""

import math

import pytest

from search_engine_wikipedia_spark.plans import evaluation as ev

R = {"q1": ["a", "b", "c", "d", "e", "f", "g", "h", "i", "l"],
     "q2": ["m", "n", "o", "p", "q", "r", "s", "t", "u", "v"]}
A = {"q1": ["x", "b", "v", "d", "p", "f", "s", "u", "t", "v"],
     "q2": ["m", "n", "d", "f", "b", "g", "v", "t", "a", "l"]}
# relevant hits in order:
#   q1: b(2) d(4) f(6)                     → ra@10 = 3
#   q2: m(1) n(2) v(7) t(8)                → ra@10 = 4


def test_precision_recall_at_10():
    p1, r1 = ev.precision_recall(R["q1"], A["q1"], 10)
    assert (p1, r1) == (0.3, 0.3)
    p2, r2 = ev.precision_recall(R["q2"], A["q2"], 10)
    assert (p2, r2) == (0.4, 0.4)


def test_precision_at_level():
    # q1: 1st relevant at pos 2 → 1/2; 2nd at pos 4 → 2/4; 3rd at 6 →
    # 3/6; 4th never → 0
    assert ev.precision_at_level(R["q1"], A["q1"], 1) == 0.5
    assert ev.precision_at_level(R["q1"], A["q1"], 2) == 0.5
    assert ev.precision_at_level(R["q1"], A["q1"], 3) == 0.5
    assert ev.precision_at_level(R["q1"], A["q1"], 4) == 0
    # q2: m@1 → 1, n@2 → 1, v@7 → 3/7, t@8 → 4/8, never → 0
    assert ev.precision_at_level(R["q2"], A["q2"], 1) == 1
    assert ev.precision_at_level(R["q2"], A["q2"], 2) == 1
    assert ev.precision_at_level(R["q2"], A["q2"], 3) == 3 / 7
    assert ev.precision_at_level(R["q2"], A["q2"], 4) == 0.5


def test_map():
    ap1 = (0.5 + 0.5 + 0.5) / 10
    ap2 = (1 + 1 + 3 / 7 + 0.5) / 10
    assert ev.mean_average_precision(R, A) == round((ap1 + ap2) / 2, 3)


def test_r_precision_and_short_aset():
    assert ev.r_precision(R, A) == {"q1": 0.3, "q2": 0.4}
    assert ev.r_precision(R, {"q1": A["q1"][:5], "q2": A["q2"]},
                          r=10)["q1"] == "error"


def test_e_and_f_measure():
    # P = R → E(b=1) = 1 - P;  F = P
    assert ev.e_measure(R, A, b=1) == {"q1": 0.7, "q2": 0.6}
    assert ev.f_measure(R, A) == {"q1": 0.3, "q2": 0.4}
    # empty intersection → ZeroDivision path → 0.0
    assert ev.e_measure({"q": ["a"]}, {"q": ["z"]}, b=1) == {"q": 0.0}


def test_relevance_vector_and_dcg():
    rv1 = ev.relevance_vector(R["q1"], A["q1"])
    assert rv1 == [0, 5, 0, 3, 0, 1, 0, 0, 0, 0]
    assert ev.relevance_vector(R["q1"], A["q1"], gt=True) == ev.REL_GT
    expected = 0 + 5 / math.log2(2) + 3 / math.log2(4) + 1 / math.log2(6)
    assert ev.dcg(rv1) == pytest.approx(expected)
    assert ev.dcg([]) == 0
    assert ev.dcg([7]) == 7


def test_ndcg_and_battery():
    per_q, avg = ev.ndcg(R, A)
    ideal = ev.dcg(ev.REL_GT)
    assert per_q["q1"] == round(ev.dcg(
        ev.relevance_vector(R["q1"], A["q1"])) / ideal, 3)
    battery = ev.evaluate(R, A)
    assert set(battery) == {"MAP", "avg_precision_at_recall",
                            "R_precision", "E_measure_b1", "F_measure",
                            "NDCG", "NDCG_avg"}
    assert battery["MAP"] == ev.mean_average_precision(R, A)


def test_a_set_from_results(spark):
    df = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11), (1, 1, 12)],
        "query_id int, rank int, doc_id long",
    )
    out = ev.a_set_from_results(df, ["qa", "qb"],
                                {10: "u10", 11: "u11", 12: "u12"})
    assert out == {"qa": ["u10", "u11"], "qb": ["u12"]}
