import pyarrow as pa

from el.blocking import (
    block_keys,
    block_pair_groups,
    emit_keys_batch,
    pairs_for_block,
)


def test_block_keys():
    keys = block_keys("janet smith")
    assert "n:janet smith" in keys
    assert "p:janet" in keys
    assert any(k.startswith("ph:S530") for k in keys)
    assert block_keys("") == []


def test_keys_shared_by_variants():
    a = set(block_keys("janet smith"))
    b = set(block_keys("janet smth"))  # misspelling
    assert a & b  # at least the p:janet key


def test_pairs_for_block_small():
    aliases = [
        ("janet smith", "Janet Smith", "Smith", "PER"),
        ("janet smth", "Janet Smth", "Janet Smth", "PER"),
        ("janet vance", "Janet Vance", "Janet Vance", "PER"),
    ]
    rows, dropped = pairs_for_block("p:janet", aliases)
    assert dropped == 0
    assert len(rows) == 3
    for r in rows:
        assert r[0] < r[1]
        assert r[0].startswith("A:") and r[1].startswith("A:")


def test_pairs_dedup_within_block():
    # duplicate alias_norm entries collapse to one representative
    aliases = [
        ("janet smith", "Janet Smith", "Smith", "PER"),
        ("janet smith", "Janet Smith", "Janet Smith", "PER"),
        ("janet vance", "Janet Vance", "Janet Vance", "PER"),
    ]
    rows, _ = pairs_for_block("k", aliases)
    assert len(rows) == 1


def test_hot_block_salting_caps_pairs():
    n = 450
    aliases = [(f"alias {i:04d}", f"Alias {i:04d}", f"Alias {i:04d}", "PER")
               for i in range(n)]
    rows, dropped = pairs_for_block("hot", aliases, max_aliases_per_block=100)
    total = n * (n - 1) // 2
    assert len(rows) + dropped == total  # no silent truncation
    assert dropped > 0
    assert len(rows) < total
    # deterministic: same input -> same pairs
    rows2, dropped2 = pairs_for_block("hot", aliases, max_aliases_per_block=100)
    assert rows == rows2 and dropped == dropped2


def test_emit_keys_batch_and_groups():
    t = pa.table(
        {
            "alias_norm": ["janet smith", "janet smth"],
            "alias": ["Janet Smith", "Janet Smth"],
            "surface": ["Smith", "Janet Smth"],
            "ner_type": ["PER", "PER"],
        }
    )
    keys = emit_keys_batch(t)
    assert "block_key" in keys.column_names
    grp = keys.filter(pa.compute.equal(keys["block_key"], "p:janet"))
    pairs = block_pair_groups(grp)
    assert len(pairs) == 1
    assert pairs["a1"][0].as_py() == "A:janet smith"
    assert pairs["dropped_pairs"][0].as_py() == 0
