import pyarrow as pa

from el.alias import resolve_conv, resolve_mention


def test_acronym_expansion():
    alias, ner = resolve_mention(
        "UWCC", "ORG", [], ["United Western Commerce Council"], []
    )
    assert alias == "United Western Commerce Council"
    assert ner == "ORG"


def test_acronym_no_match_stays():
    alias, _ = resolve_mention("UWCC", "ORG", [], ["Global Timber Group"], [])
    assert alias == "UWCC"


def test_surname_expansion():
    alias, _ = resolve_mention("Smith", "PER", ["Janet Smith"], [], [])
    assert alias == "Janet Smith"
    # first (earliest-in-doc) match wins — proximity-analog determinism
    alias, _ = resolve_mention("Smith", "PER", ["Janet Smith", "Ada Smith"], [], [])
    assert alias == "Janet Smith"


def test_city_expansion():
    alias, _ = resolve_mention("Austin", "GPE", [], [], [])
    assert alias == "Austin, Texas"
    alias, _ = resolve_mention("Austin, TX", "GPE", [], [], [])
    assert alias == "Austin, Texas"
    alias, _ = resolve_mention("Austin, Texas", "GPE", [], [], [])
    assert alias == "Austin, Texas"


def test_proximity_sort_picks_nearest_candidate():
    """M10 (CorefHelperMethods.scala:243-260): with positions, the
    candidate CLOSEST to the mention wins; ties break to document
    order; without positions, document order (r01 behavior)."""
    pers = ["Janet Smith", "Ada Smith"]
    positions = {"Janet Smith": 0, "Ada Smith": 5}
    alias, _ = resolve_mention("Smith", "PER", pers, [], [],
                               positions, mention_pos=6)
    assert alias == "Ada Smith"
    alias, _ = resolve_mention("Smith", "PER", pers, [], [],
                               positions, mention_pos=1)
    assert alias == "Janet Smith"
    alias, _ = resolve_mention("Smith", "PER", pers, [], [])
    assert alias == "Janet Smith"


def test_best_location_doc_fallback():
    """M7 analog (CorefHelperMethods.scala:426-509): a bare city the
    static gazetteer does not know expands from the document's own
    'City, State' mentions; with no document evidence it stays bare."""
    alias, ner = resolve_mention(
        "Springport", "GPE", [], [], ["Springport, Ohio"]
    )
    assert alias == "Springport, Ohio" and ner == "GPE"
    alias, _ = resolve_mention("Springport", "GPE", [], [], [])
    assert alias == "Springport"


def test_org_prefix_expansion_refines_type():
    alias, ner = resolve_mention(
        "United Western", "PER", [], ["United Western Commerce Council"], []
    )
    assert alias == "United Western Commerce Council"
    assert ner == "ORG"


def test_resolve_conv_preserves_types_and_order():
    g = pa.table(
        {
            "mention_id": ["m1", "m2"],
            "conv_id": ["c", "c"],
            "turn_idx": pa.array([0, 3], pa.int32()),
            "beg": pa.array([0, 5], pa.int32()),
            "end": pa.array([12, 10], pa.int32()),
            "surface": ["Janet Harper", "Harper"],
            "ner_type": ["PER", "PER"],
            "context": ["x", "y"],
        }
    )
    out = resolve_conv(g)
    assert out.schema.field("turn_idx").type == "int32"
    assert out["mention_id"].to_pylist() == ["m1", "m2"]
    assert out["alias"].to_pylist() == ["Janet Harper", "Janet Harper"]
    assert out["alias_norm"].to_pylist() == ["janet harper", "janet harper"]


def test_location_text_fallback():
    """M7 final fallbacks (CorefHelperMethods.scala:426-509 analog):
    a bare city unknown to the gazetteer and absent from the document's
    'City, State' mentions expands from raw-text 'City in State' /
    'City, ST' patterns; the most frequent valid container wins and
    invalid containers are ignored."""
    from el.alias import expand_location_from_texts

    texts = [
        "we drove to Brushy Creek in Texas last summer",
        "Brushy Creek in Texas has a park",
        "Brushy Creek, TX appears on one map",
        "Brushy Creek in Confusion is not a place",
    ]
    assert expand_location_from_texts("Brushy Creek", texts) == \
        "Brushy Creek, Texas"
    # nothing validates -> empty
    assert expand_location_from_texts("Brushy Creek",
                                      ["Brushy Creek in Confusion"]) == ""
    # abbreviation-only evidence expands through the state table
    assert expand_location_from_texts(
        "Brushy Creek", ["Brushy Creek, TX is lovely"]
    ) == "Brushy Creek, Texas"


def test_resolve_block_applies_text_fallback():
    import pandas as pd

    from el.alias import resolve_block

    df = pd.DataFrame({
        "mention_id": ["c1:00000:00000", "c1:00001:00000"],
        "conv_id": ["c1", "c1"],
        "turn_idx": pd.array([0, 1], dtype="int32"),
        "beg": pd.array([0, 0], dtype="int32"),
        "end": pd.array([11, 11], dtype="int32"),
        "surface": ["Brushy Creek", "Brushy Creek"],
        "ner_type": ["GPE", "GPE"],
        "context": ["Brushy Creek in Texas is north of town",
                    "Brushy Creek again"],
    })
    out = resolve_block(df)
    assert list(out["alias"]) == ["Brushy Creek, Texas"] * 2
    # without the context column the fallback silently disables
    out2 = resolve_block(df.drop(columns=["context"]))
    assert list(out2["alias"]) == ["Brushy Creek"] * 2
