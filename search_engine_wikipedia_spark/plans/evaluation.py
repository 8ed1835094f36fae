"""IR evaluation metrics (reference E1-E10, ``indexing/evaluation.py``).

Re-derivation of the reference ``Evaluator``: R-set = ground-truth
links per query (Google top-10 in the reference, a pinned fixture
here), A-set = the engine's ranked result links.  All metric formulas,
defaults and roundings follow the citations below exactly — including
quirks (DCG's ``i ≤ rank`` off-by-the-reference loop, E-measure's
ZeroDivision → 0.0).

Metrics are tiny (30 queries × 10 links) so they compute driver-side;
``a_set_from_results`` builds the A-set from the distributed batch
search output in one collect.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

# The 30 evaluation queries — evaluation.py:22-30 (verbatim set).
from ..synth import QUERIES as EVAL_QUERIES  # noqa: F401

REL_GT = [6, 5, 4, 3, 2, 1, 1, 1, 1, 1]  # evaluation.py:278


def precision_recall(r_links: list, a_links: list, rank_pos: int = 10):
    """E2 — precision/recall at a rank position (evaluation.py:79-109).

    ``ra = |R ∩ A[:pos]|``; division-by-zero → 0 (reference try/except).
    """
    rank_pos = min(rank_pos, len(a_links))
    a = len(a_links[:rank_pos])
    r = len(r_links)
    ra = len(set(r_links) & set(a_links[:rank_pos]))
    precision = ra / a if a else 0
    recall = ra / r if r else 0
    return precision, recall


def precision_at_level(r_links: list, a_links: list, recall_level: int):
    """E3 — precision when the ``recall_level``-th relevant doc is
    retrieved; 0 if never (evaluation.py:112-131)."""
    relevants = 0
    for count, retrieved in enumerate(a_links, 1):
        if retrieved in r_links:
            relevants += 1
            if relevants == recall_level:
                return relevants / count
    return 0


def average_precision_at_levels(r_set: dict, a_set: dict,
                                round_precision: int = 3) -> dict:
    """E4 — mean precision over queries at recall levels 0.1..1.0
    (evaluation.py:134-159)."""
    res = {}
    tot = len(r_set)
    levels = 10
    for level in range(1, levels + 1):
        s = sum(precision_at_level(r_set[q], a_set[q], level)
                for q in r_set)
        res[level / levels] = round(s / tot, round_precision)
    return res


def mean_average_precision(r_set: dict, a_set: dict,
                           round_map: int = 3) -> float:
    """E5 — MAP over levels 1..10 (evaluation.py:162-180)."""
    levels = 10
    per_query = [
        sum(precision_at_level(r_set[q], a_set[q], lv)
            for lv in range(1, levels + 1)) / levels
        for q in r_set
    ]
    return round(sum(per_query) / len(per_query), round_map)


def r_precision(r_set: dict, a_set: dict, r: int = 10,
                round_precision: int = 3) -> dict:
    """E6 — precision@r per query (evaluation.py:183-205); 'error' when
    the A-set is shorter than r (reference behavior)."""
    res = {}
    for q in r_set:
        if r > len(a_set[q]):
            res[q] = "error"
        else:
            ra = len(set(r_set[q]) & set(a_set[q][:r]))
            res[q] = round(ra / r, round_precision)
    return res


def e_measure(r_set: dict, a_set: dict, b: float, rank_pos: int = 10,
              round_measure: int = 3) -> dict:
    """E7 — ``1 − (1+b²)/((b²/recall)+(1/precision))``
    (evaluation.py:208-233); ZeroDivision → 0.0."""
    res = {}
    for q in r_set:
        p, rc = precision_recall(r_set[q], a_set[q], rank_pos)
        try:
            res[q] = round(1 - ((1 + b ** 2) / ((b ** 2 / rc) + (1 / p))),
                           round_measure)
        except ZeroDivisionError:
            res[q] = 0.0
    return res


def f_measure(r_set: dict, a_set: dict, rank_pos: int = 10,
              round_measure: int = 3) -> dict:
    """E8 — harmonic mean of P and R (evaluation.py:236-259)."""
    res = {}
    for q in r_set:
        p, rc = precision_recall(r_set[q], a_set[q], rank_pos)
        try:
            res[q] = round((2 * p * rc) / (p + rc), round_measure)
        except ZeroDivisionError:
            res[q] = 0.0
    return res


def relevance_vector(r_links: list, a_links: list,
                     gt: bool = False) -> list:
    """E9 — graded ground truth [6,5,4,3,2,1,1,1,1,1] mapped onto the
    A-set order, 0 on miss (evaluation.py:262-286)."""
    if gt:
        return list(REL_GT)
    doc_rel = {doc: REL_GT[pos] for pos, doc in enumerate(r_links)}
    return [doc_rel.get(doc, 0) for doc in a_links]


def dcg(rel_vector: list, rank: int = 10, log_base: int = 2) -> float:
    """E10 — ``rel₀ + Σ_{i=2..rank} relᵢ/log₂(i)``
    (evaluation.py:289-315, including its boundary behaviors)."""
    if rank > len(rel_vector):
        rank = len(rel_vector)
    elif rank < 0:
        rank = 0
    if len(rel_vector) == 0:
        return 0
    if len(rel_vector) == 1:
        return rel_vector[0]
    return rel_vector[0] + sum(
        rel_i / math.log(i, log_base)
        for i, rel_i in enumerate(rel_vector[1:], 2) if i <= rank
    )


def ndcg(r_set: dict, a_set: dict, round_ndcg: int = 3):
    """E10 — DCG / ideal DCG @10 per query + average
    (evaluation.py:318-335)."""
    rank = 10
    res = {
        q: round(
            dcg(relevance_vector(r_set[q], a_set[q]), rank)
            / dcg(relevance_vector(r_set[q], a_set[q], gt=True), rank),
            round_ndcg,
        )
        for q in r_set
    }
    avg = sum(res.values()) / len(res)
    return res, avg


# ---------------------------------------------------------------------------
# E1 — A-set construction from the distributed batch-search output
# ---------------------------------------------------------------------------
def a_set_from_results(results: DataFrame, queries: list[str],
                       url_by_doc: dict[int, str]) -> dict:
    """(query_id, rank, doc_id) batch output → {query: [links]} in rank
    order (evaluation.py:64-76: A-set = engine links per query)."""
    rows = results.select("query_id", "rank", "doc_id").collect()
    out: dict[str, list] = {q: [] for q in queries}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        out[queries[r["query_id"]]].append(
            url_by_doc.get(int(r["doc_id"]), str(r["doc_id"])))
    return out


def evaluate(r_set: dict, a_set: dict) -> dict:
    """Full metric battery as one dict (the GUI dialog surface,
    GUI/evaluationDialog.py:26-92)."""
    ndcg_per_q, ndcg_avg = ndcg(r_set, a_set)
    return {
        "MAP": mean_average_precision(r_set, a_set),
        "avg_precision_at_recall": average_precision_at_levels(r_set, a_set),
        "R_precision": r_precision(r_set, a_set),
        "E_measure_b1": e_measure(r_set, a_set, b=1),
        "F_measure": f_measure(r_set, a_set),
        "NDCG": ndcg_per_q,
        "NDCG_avg": ndcg_avg,
    }
