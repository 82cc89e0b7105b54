import pyarrow as pa
import pytest

from el.metrics import b_cubed, category_report, pairwise_f1


def test_pairwise_f1_perfect():
    gp = pa.table(
        {
            "m1_id": ["a", "a", "b"],
            "m2_id": ["b", "c", "c"],
            "same_entity": [True, False, False],
        }
    )
    res = pairwise_f1({"a": "x", "b": "x", "c": "y"}, gp)
    assert res["f1"] == 1.0 and res["tp"] == 1 and res["tn"] == 2


def test_pairwise_f1_mixed():
    gp = pa.table(
        {
            "m1_id": ["a", "a"],
            "m2_id": ["b", "c"],
            "same_entity": [True, False],
        }
    )
    res = pairwise_f1({"a": "x", "b": "y", "c": "x"}, gp)  # miss + false merge
    assert res["fp"] == 1 and res["fn"] == 1
    assert res["precision"] == 0.0 and res["recall"] == 0.0


def test_b_cubed():
    gold = {"a": "g1", "b": "g1", "c": "g2"}
    perfect = b_cubed({"a": "x", "b": "x", "c": "y"}, gold)
    assert perfect["f1"] == 1.0
    merged = b_cubed({"a": "x", "b": "x", "c": "x"}, gold)
    assert merged["recall"] == 1.0
    assert merged["precision"] == pytest.approx((2 / 3 + 2 / 3 + 1 / 3) / 3)


def test_category_report():
    gold = {"a": "E1", "b": "E1", "c": "NIL1", "d": "NIL2"}
    sys = {"a": "E1", "b": "E2", "c": "NIL:x", "d": "E9"}
    rep = category_report(sys, gold)
    assert rep == {"CORRECT": 1, "WRONG KB ID": 1, "NIL OK": 1, "EXP NIL": 1}


def test_sliced_category_report():
    from el.metrics import sliced_category_report

    gold = {"a": "E1", "b": "E1", "c": "NIL1", "d": "NIL2"}
    sys = {"a": "E1", "b": "E2", "c": "NIL:x", "d": "E9"}
    sl = {"a": "genre:NW", "b": "genre:WB", "c": "genre:NW",
          "d": "genre:WB"}
    rep = sliced_category_report(sys, gold, sl)
    assert rep == {"genre:NW:CORRECT": 1, "genre:WB:WRONG KB ID": 1,
                   "genre:NW:NIL OK": 1, "genre:WB:EXP NIL": 1}


def test_shared_ne_crosstab():
    from el.metrics import shared_ne_crosstab

    items = [("CORRECT", True), ("CORRECT", False), ("CORRECT", True),
             ("EXP NIL", False), ("WRONG KB ID", True)]
    ct = shared_ne_crosstab(items)
    assert ct["CORRECT"] == {"total": 3, "shared": 2}
    assert ct["EXP NIL"] == {"total": 1, "shared": 0}
    assert ct["WRONG KB ID"] == {"total": 1, "shared": 1}
    assert shared_ne_crosstab([]) == {}


def test_category_of_matches_report():
    from el.metrics import category_of

    gold = {"a": "E1", "b": "E1", "c": "NIL1", "d": "NIL2", "e": "E3"}
    sys = {"a": "E1", "b": "E2", "c": "NIL:x", "d": "E9", "e": "NIL:y"}
    from collections import Counter
    per_row = Counter(category_of(sys[m], g) for m, g in gold.items())
    assert dict(per_row) == category_report(sys, gold)
