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


def test_key_strategy_rare_token():
    from el.blocking import alias_token_dfs

    norms = ["janet smith", "john smith", "mary smith", "janet vance"]
    df = alias_token_dfs(norms)
    assert df == {"janet": 2, "smith": 3, "john": 1, "mary": 1,
                  "vance": 1}
    keys = block_keys("janet smith", ("rare_token",), df)
    assert keys == ["r:janet"]  # janet(2) rarer than smith(3)
    # unseen tokens count df=1 (maximally rare); tie -> lexicographic
    assert block_keys("zz aa", ("rare_token",), df) == ["r:aa"]
    # default strategies unchanged, order preserved
    assert block_keys("janet smith") == [
        "n:janet smith", "p:janet",
        block_keys("janet smith")[2]]
    import pytest

    with pytest.raises(ValueError, match="unknown blocking key"):
        block_keys("janet smith", ("bogus",))


def test_snb_tile_keys_cover_window_pairs():
    """Every pair within rank distance < window must share >= 1 tile
    key (the sorted-neighborhood coverage property)."""
    from el.blocking import snb_tile_keys

    w = 5
    keysets = [set(snb_tile_keys(r, w)) for r in range(200)]
    for i in range(200):
        for j in range(i + 1, min(i + w, 200)):
            assert keysets[i] & keysets[j], (i, j)


def test_profile_key_map_default_matches_legacy():
    """profile_key_map with default strategies must reproduce the
    pre-registry keying exactly (same keys, same index order)."""
    from el.blocking import profile_key_map

    gkeys = ["g3", "g1", "g2", "g4"]
    norms = ["janet smith", "janet smth", "janet vance", ""]
    km = profile_key_map(gkeys, norms)
    legacy: dict = {}
    for i in sorted(range(len(gkeys)), key=lambda i: gkeys[i]):
        for k in block_keys(norms[i]):
            legacy.setdefault(k, []).append(i)
    assert km == legacy


def test_profile_key_map_snb_adds_rank_tiles():
    from el.blocking import profile_key_map

    gkeys = [f"g{i}" for i in range(6)]
    norms = ["a a", "b b", "c c", "d d", "e e", ""]
    km = profile_key_map(gkeys, norms,
                         ("norm", "snb"), snb_window=2)
    sn = {k: v for k, v in km.items() if k.startswith("sn:")}
    # ranks 0..4 over the 5 non-empty norms; tiles of width 2 with
    # overlap: every adjacent pair shares a tile
    assert sn, km
    for r in range(4):
        shared = [k for k, v in sn.items() if r in v and r + 1 in v]
        assert shared, (r, sn)
    # the empty-norm row joins no snb tile
    assert all(5 not in v for v in sn.values())
