import pyarrow as pa
import pyarrow.parquet as pq

from el.mentions import extract_mentions_batch, type_surface


def test_extraction_recovers_gold_exactly(t1_fixture):
    """Extraction over turn text must recover the labeled mention set
    exactly (ids, spans, surfaces) — the conformance contract for the
    mention stage."""
    tr = pq.read_table(f"{t1_fixture}/transcripts.parquet")
    gm = pq.read_table(f"{t1_fixture}/gold_mentions.parquet")
    ext = extract_mentions_batch(tr)
    got = sorted(
        zip(
            ext["mention_id"].to_pylist(),
            ext["surface"].to_pylist(),
            ext["beg"].to_pylist(),
            ext["end"].to_pylist(),
        )
    )
    want = sorted(
        zip(
            gm["mention_id"].to_pylist(),
            gm["surface"].to_pylist(),
            gm["beg"].to_pylist(),
            gm["end"].to_pylist(),
        )
    )
    assert got == want


def test_extraction_spans_and_types():
    t = pa.table(
        {
            "conv_id": ["c1"],
            "turn_idx": pa.array([0], pa.int32()),
            "text": ["we met Janet Harper near Austin, TX with the UWCC team"],
        }
    )
    out = extract_mentions_batch(t).to_pylist()
    assert [(r["surface"], r["ner_type"]) for r in out] == [
        ("Janet Harper", "PER"),
        ("Austin, TX", "GPE"),
        ("UWCC", "ORG"),
    ]
    for r in out:
        assert t["text"][0].as_py()[r["beg"]:r["end"]] == r["surface"]


def test_type_surface():
    assert type_surface("UWCC") == "ORG"
    assert type_surface("Austin") == "GPE"
    assert type_surface("Austin, Texas") == "GPE"
    assert type_surface("Smith") == "PER"
    assert type_surface("Janet Smith") == "PER"
    assert type_surface("Global Timber Group") == "ORG"
    assert type_surface("Meridian Northern Fisheries Institute") == "ORG"


def test_type_surface_batch_parity():
    """Vectorized Arrow type dispatch == scalar reference on every
    branch: acronyms, City-ST / City-Fullname / City-Org comma forms,
    cities, persons, org suffixes, 3+ token orgs, hyphens/apostrophes."""
    from el.mentions import type_surface_batch

    surfaces = [
        "UWCC", "TX", "Austin", "Dallas", "Smith", "Janet Smith",
        "Global Timber Group", "Meridian Northern Fisheries Institute",
        "Austin, Texas", "Austin, TX", "Austin, Global Timber",
        "Boston, Harper", "O'Brien", "Smith-Jones", "St. Mary",
        "A. B. Quinn", "Harper Quinn Reyes", "New York City Council",
        "X", "Ab", "ABC", "AB", "Acme Council", "Acme, AB",
    ]
    got = list(type_surface_batch(pa.array(surfaces, pa.string())))
    want = [type_surface(s) for s in surfaces]
    assert got == want, list(zip(surfaces, got, want))


def test_empty_batch():
    t = pa.table(
        {"conv_id": pa.array([], pa.string()),
         "turn_idx": pa.array([], pa.int32()),
         "text": pa.array([], pa.string())}
    )
    assert len(extract_mentions_batch(t)) == 0


def test_single_scan_matches_per_row_reference():
    """The joined-string single-scan extractor must be bit-identical to
    a straightforward per-row finditer (offsets, ids, types, context),
    including texts that contain newlines, adjacent mentions around the
    join separator, and mention-free rows."""
    from el.mentions import MENTION_RE, mention_id, type_surface

    import numpy as np

    rng = np.random.default_rng(11)
    words_up = ["Austin", "Harper", "Global", "Timber", "UWCC", "Quinn",
                "Dallas", "Meridian", "Institute", "TX"]
    words_lo = ["we", "met", "near", "the", "team", "and", "with"]
    texts = []
    for i in range(200):
        k = int(rng.integers(0, 9))
        toks = [str(rng.choice(words_up if rng.random() < 0.4
                               else words_lo)) for _ in range(k)]
        s = " ".join(toks)
        if rng.random() < 0.2:
            s = s + "\nNewline Harper here"
        if rng.random() < 0.1:
            s = "Austin, TX " + s  # mention at position 0
        texts.append(s)
    t = pa.table({
        "conv_id": pa.array([f"c{i % 7}" for i in range(200)], pa.string()),
        "turn_idx": pa.array(list(range(200)), pa.int32()),
        "text": pa.array(texts, pa.string()),
    })

    rows = []
    for c, ti, text in zip(t.column("conv_id").to_pylist(),
                           t.column("turn_idx").to_pylist(),
                           t.column("text").to_pylist()):
        for m in MENTION_RE.finditer(text):
            s = m.group(0)
            rows.append({"mention_id": mention_id(c, ti, m.start()),
                         "conv_id": c, "turn_idx": ti,
                         "beg": m.start(), "end": m.end(),
                         "surface": s, "ner_type": type_surface(s),
                         "context": text})
    got = extract_mentions_batch(t).to_pylist()
    assert got == rows
