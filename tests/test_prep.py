"""Training-data prep operators: PII redaction, vocabulary top-k,
decontamination, stratified sampling, per-doc salient terms."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")


def test_pii_redact_counts_and_text(ray_session):
    import ray.data

    from el.ops.prep import pii_redact

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "mail me at a.b-c+1@foo-bar.example.org today",
            "call 415-555-0012 or 415-555-9999",
            "nothing here 12-34",
        ],
    })
    out = pii_redact(ray.data.from_pandas(df)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_emails"].tolist() == [1, 0, 0]
    assert out["n_phones"].tolist() == [0, 2, 0]
    assert out.loc[0, "clean_text"] == "mail me at <EMAIL> today"
    assert out.loc[1, "clean_text"] == "call <PHONE> or <PHONE>"
    assert out.loc[2, "clean_text"] == "nothing here 12-34"


def test_vocab_topk_matches_local_counts(ray_session, docs_ds):
    import re

    from el.ops.prep import vocab_topk

    out = vocab_topk(docs_ds, k=10).to_pandas()
    texts = docs_ds.to_pandas()["text"]
    counts: dict = {}
    for t in texts:
        for w in re.findall(r"[A-Za-z0-9]+", t.lower()):
            counts[w] = counts.get(w, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(zip(out["token"], out["cnt"]))
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == want


def test_decontaminate_flags_planted_overlap(ray_session):
    import ray.data

    from el.ops.prep import decontaminate

    sent = "q w e r t y u i o p"  # 10 tokens -> 3 shared 8-grams
    df = pd.DataFrame({
        "doc_id": [0, 13, 26, 5],  # 0 is bench (0 % 97 == 0)
        "text": [
            "bench doc body " + sent,
            "train doc one " + sent,
            "train doc two " + sent,
            "clean train doc with no overlap at all here",
        ],
    })
    out = decontaminate(ray.data.from_pandas(df), n=8, bench_mod=97) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [5, 13, 26]  # bench doc excluded
    by = dict(zip(out["doc_id"], out["n_hits"]))
    assert by[5] == 0
    assert by[13] == 3 and by[26] == 3
    assert out["contaminated"].tolist() == [False, True, True]


def test_stratified_sample_bounds_and_determinism(ray_session, docs_ds):
    from el.ops.prep import stratified_sample

    a = stratified_sample(docs_ds, stratum="lang", per_stratum=5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = stratified_sample(docs_ds, stratum="lang", per_stratum=5) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    sizes = a.groupby("lang").size()
    assert (sizes <= 5).all()
    # every stratum present in the corpus is represented
    langs = set(docs_ds.to_pandas()["lang"])
    assert set(sizes.index) == langs


def test_doc_top_terms_ranking_rule(ray_session):
    import ray.data

    from el.ops.prep import doc_top_terms

    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [
            "zz zz aa aa bb cc",   # tf ties: aa/zz at 2 -> df then term
            "aa dd dd dd",
        ],
    })
    out = doc_top_terms(ray.data.from_pandas(df), k=2).to_pandas()
    d1 = out[out["doc_id"] == 1].sort_values(
        ["tf", "df", "term"], ascending=[False, True, True])
    # doc1: zz (tf2, df1) beats aa (tf2, df2) on rarity
    assert d1["term"].tolist() == ["zz", "aa"]
    d2 = out[out["doc_id"] == 2]
    assert d2.sort_values("tf", ascending=False)["term"].tolist() == \
        ["dd", "aa"]


def test_group_quantiles_disc_rule(ray_session):
    import ray.data

    from el.ops.prep import group_quantiles

    df = pd.DataFrame({
        "lang": ["en"] * 4 + ["de"] * 5,
        "text": ["w " * n for n in (1, 2, 3, 4, 10, 20, 30, 40, 50)],
    })
    out = group_quantiles(ray.data.from_pandas(df), group="lang",
                          qs=(0.5, 0.9)).to_pandas().set_index("lang")
    # quantile_disc: sorted[ceil(n*q)-1]
    assert out.loc["en", "q50_tokens"] == 2 and out.loc["en", "q90_tokens"] == 4
    assert out.loc["de", "q50_tokens"] == 30 and out.loc["de", "q90_tokens"] == 50
    assert out.loc["en", "n_docs"] == 4 and out.loc["de", "n_docs"] == 5


def test_inverted_index_postings(ray_session):
    import ray.data

    from el.ops.prep import inverted_index

    df = pd.DataFrame({
        "doc_id": [3, 1, 2],
        "text": ["cat dog cat", "dog bird", "cat"],
    })
    out = inverted_index(ray.data.from_pandas(df)).to_pandas() \
        .set_index("term")
    assert out.loc["cat", "postings"] == "2,3"  # distinct + sorted
    assert out.loc["cat", "df"] == 2
    assert out.loc["dog", "postings"] == "1,3"
    assert out.loc["bird", "postings"] == "1"


def test_bigram_topk_counts(ray_session):
    import ray.data

    from el.ops.prep import bigram_topk

    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b a b", "a b c"],
    })
    out = bigram_topk(ray.data.from_pandas(df), k=2).to_pandas()
    got = dict(zip(out["token"], out["cnt"]))
    assert got == {"a b": 3, "b a": 1} or got == {"a b": 3, "b c": 1}
    assert out.iloc[0]["token"] == "a b" and out.iloc[0]["cnt"] == 3


def test_strip_markup(ray_session):
    import ray.data

    from el.ops.prep import strip_markup

    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ['<p>hello <b>world</b></p>\n <a href="x">go</a>',
                 "no tags here"],
    })
    out = strip_markup(ray.data.from_pandas(df)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "clean_text"] == "hello world go"
    assert out.loc[0, "n_tags"] == 6
    assert out.loc[1, "clean_text"] == "no tags here"
    assert out.loc[1, "n_tags"] == 0


def test_hopping_window_membership(ray_session):
    import ray.data

    from el.ops.windows import hopping_window_agg

    # one event at 00:31:00 -> windows starting 23:45, 00:00, 00:15, 00:30
    df = pd.DataFrame({
        "event_id": [1],
        "ts": pd.to_datetime(["2024-01-02 00:31:00"]),
        "event_type": ["click"],
        "value": [2.5],
    })
    out = hopping_window_agg(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == 4
    starts = sorted(pd.to_datetime(out["window_start_us"], unit="us"))
    assert [s.strftime("%H:%M") for s in starts] == \
        ["23:45", "00:00", "00:15", "00:30"]
    assert (out["n_events"] == 1).all()
    assert (out["sum_value"] == 2.5).all()


def test_read_transcripts_jsonl_roundtrip(ray_session, tmp_path):
    import json

    from el.sources import read_transcripts_jsonl

    p = tmp_path / "shard.jsonl"
    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hi"},
        {"conv_id": "c1", "turn_idx": 1, "role": "agent", "text": "yo"},
        {"conv_id": "c2", "turn_idx": 0, "role": "user", "text": "ok"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    out = read_transcripts_jsonl(str(p)).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert out["text"].tolist() == ["hi", "yo", "ok"]
    assert str(out["turn_idx"].dtype) == "int32"
    assert out["role"].tolist() == ["user", "agent", "user"]


def test_pii_redact_property_no_residual_pii():
    """Property: after redaction the clean text contains no substring
    matching either PII pattern, and counts equal pattern matches
    (pure-kernel check, no Ray)."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from el.ops.prep import EMAIL_RE, PHONE_RE, pii_redact_batch

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.text(
        alphabet="ab @.-0123456789xyz_%+", min_size=0, max_size=40),
        min_size=1, max_size=8))
    def prop(texts):
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        out = pii_redact_batch(df)
        for t, c, ne, np_ in zip(texts, out["clean_text"],
                                 out["n_emails"], out["n_phones"]):
            assert not re.search(EMAIL_RE, c)
            assert not re.search(PHONE_RE, c)
            assert ne == len(re.findall(EMAIL_RE, t))

    prop()


def test_strip_markup_property_idempotent():
    """Property: stripping is idempotent and the result has no tags."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from el.ops.prep import TAG_RE, strip_markup_batch

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.text(
        alphabet="ab <>/=\"px \n\t", min_size=0, max_size=40),
        min_size=1, max_size=8))
    def prop(texts):
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        out = strip_markup_batch(df)
        again = strip_markup_batch(
            out.rename(columns={"clean_text": "text"})[["doc_id", "text"]])
        for c1, c2 in zip(out["clean_text"], again["clean_text"]):
            assert not re.search(TAG_RE, c1)
            assert c1 == c2

    prop()


def test_repetition_score_exact_values(ray_session):
    import ray.data

    from el.ops.prep import repetition_score

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "a b a b a",        # bigrams: ab ba ab ba -> 4 grams, 2 uniq
            "x y z",            # xy yz -> 2 grams, 2 uniq
            "solo",             # no bigram
        ],
    })
    out = repetition_score(ray.data.from_pandas(df)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_grams"].tolist() == [4, 2, 0]
    assert out["n_uniq_grams"].tolist() == [2, 2, 0]
    assert out["top_gram_count"].tolist() == [2, 1, 0]
    assert out["dup_ratio"].tolist() == [0.5, 0.0, 0.0]


def test_repetition_batch_doc_boundary(ray_session):
    # the last token of doc A and first of doc B must NOT form a gram
    import ray.data

    from el.ops.prep import repetition_score

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["p q", "q p"]})
    out = repetition_score(ray.data.from_pandas(df)).to_pandas()
    assert out["n_grams"].tolist() == [1, 1]
    assert out["n_uniq_grams"].tolist() == [1, 1]


def test_token_pack_spans(ray_session):
    import ray.data

    from el.ops.prep import token_pack

    df = pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": ["w " * 3, "", "w " * 5, "w"],  # counts 3, 0, 5, 1
    })
    out = token_pack(ray.data.from_pandas(df), seq_len=4).to_pandas() \
        .sort_values(["doc_id", "seq_id"]).reset_index(drop=True)
    # global stream: doc10 [0,3) doc12 [3,8) doc13 [8,9); cuts at 4, 8
    want = [
        (10, 0, 0, 3),   # tokens 0-2 in seq 0
        (12, 0, 0, 1),   # token 3 in seq 0 -> in-doc [0,1)
        (12, 1, 1, 5),   # tokens 4-7 in seq 1 -> in-doc [1,5)
        (13, 2, 0, 1),   # token 8 in seq 2
    ]
    got = list(zip(out["doc_id"], out["seq_id"],
                   out["tok_start"], out["tok_end"]))
    assert got == want
    # empty doc emits nothing
    assert 11 not in set(out["doc_id"])


def test_token_pack_spans_tile_docs(ray_session):
    # per-doc spans must tile [0, n_tokens) with no gaps or overlap
    import ray.data

    from el.ops.prep import token_pack

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = token_pack(docs, seq_len=128).to_pandas() \
        .sort_values(["doc_id", "seq_id"])
    for doc_id, g in out.groupby("doc_id"):
        assert g["tok_start"].iloc[0] == 0
        assert (g["tok_start"].iloc[1:].to_numpy()
                == g["tok_end"].iloc[:-1].to_numpy()).all()
        # every span except a doc's last is cut AT a seq boundary
        assert (g["seq_id"].diff().iloc[1:] == 1).all()


def test_token_pack_property_vs_local(ray_session):
    """Property: for random corpora, token_pack's spans equal a local
    concat-and-cut simulation (tiling, seq ids, in-doc offsets)."""
    import ray.data
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from el.ops.prep import token_pack

    @settings(max_examples=20, deadline=None)
    @given(
        counts=st.lists(st.integers(min_value=0, max_value=40),
                        min_size=1, max_size=25),
        seq_len=st.integers(min_value=1, max_value=16),
    )
    def prop(counts, seq_len):
        df = pd.DataFrame({
            "doc_id": range(len(counts)),
            "text": ["w " * c for c in counts],
        })
        out = token_pack(ray.data.from_pandas(df), seq_len=seq_len) \
            .to_pandas()
        if out.empty:
            # ray to_pandas drops columns on an all-empty dataset (the
            # Dataset schema itself is typed); nothing to compare
            assert sum(counts) == 0
            return
        out = out.sort_values(["doc_id", "seq_id"])
        # local simulation
        want = []
        off = 0
        for d, c in enumerate(counts):
            for pos in range(c):
                g = off + pos
                want.append((d, g // seq_len, pos))
            off += c
        # collapse per-token rows to spans
        spans = {}
        for d, s, pos in want:
            k = (d, s)
            lo, hi = spans.get(k, (pos, pos))
            spans[k] = (min(lo, pos), max(hi, pos))
        got = {(r.doc_id, r.seq_id): (r.tok_start, r.tok_end - 1)
               for r in out.itertuples()}
        assert got == spans

    prop()


def test_source_mix_rates(ray_session):
    import ray.data

    from el.ops.prep import source_mix, _hex8_threshold

    df = pd.DataFrame({
        "doc_id": range(4000),
        "source": ["a", "b", "c", "d"] * 1000,
        "text": "x",
    })
    out = source_mix(ray.data.from_pandas(df),
                     {"a": 1.0, "b": 0.5, "c": 0.0},
                     default_rate=0.25).to_pandas()
    counts = out.groupby("source").size().to_dict()
    assert counts.get("a") == 1000          # rate 1.0 keeps all
    assert "c" not in counts                # rate 0.0 keeps none
    assert 380 <= counts.get("b", 0) <= 620  # ~0.5 of 1000
    assert 170 <= counts.get("d", 0) <= 350  # default 0.25
    # determinism: same input -> identical sample
    out2 = source_mix(ray.data.from_pandas(df),
                      {"a": 1.0, "b": 0.5, "c": 0.0},
                      default_rate=0.25).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # threshold formatting is fixed-width lowercase hex
    assert _hex8_threshold(0.5) == "80000000"
    assert _hex8_threshold(1.0) == "ffffffff"


def test_unigram_logprob_cap_and_oov(ray_session):
    import math

    import ray

    from el.ops.textstats import unigram_logprob

    # corpus: "a" x6, "b" x3, "c" x1 -> with vocab_cap=2 only a/b are
    # in-vocab; "c" backs off to the 0.5 pseudo-count
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a a a b", "a a a b b", "c"],
    })
    out = (unigram_logprob(ray.data.from_pandas(df), vocab_cap=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    T = 10.0
    la, lb, lc = math.log(6 / T), math.log(3 / T), math.log(0.5 / T)
    want = [(3 * la + lb) / 4, (3 * la + 2 * lb) / 5, lc]
    assert out.n_tokens.tolist() == [4, 5, 1]
    for got, exp in zip(out.logprob_per_token, want):
        assert got == pytest.approx(exp, abs=1e-5)
    # empty doc -> NULL score, zero tokens
    df2 = pd.DataFrame({"doc_id": [1, 2], "text": ["x y", "!!"]})
    out2 = (unigram_logprob(ray.data.from_pandas(df2))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out2.n_tokens.tolist() == [2, 0]
    assert pd.isna(out2.logprob_per_token.iloc[1])


def test_event_funnel_ordering_rules(ray_session):
    import ray

    from el.ops.windows import funnel

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    s = pd.Timedelta(seconds=1)
    df = pd.DataFrame([
        # u1: full ordered funnel
        (1, t0, 10, "view"), (1, t0 + s, 11, "click"),
        (1, t0 + 2 * s, 12, "purchase"),
        # u2: purchase BEFORE click -> stops at view+click? no:
        # view(t0), purchase(t0+1), click(t0+2) -> no purchase after
        # click -> 2 steps
        (2, t0, 20, "view"), (2, t0 + s, 21, "purchase"),
        (2, t0 + 2 * s, 22, "click"),
        # u3: click only, never viewed -> 0 steps
        (3, t0, 30, "click"), (3, t0 + s, 31, "purchase"),
        # u4: same-ts tie — click shares ts with view but has a HIGHER
        # event_id, so the tuple order admits it; purchase shares the
        # click's ts with a LOWER id -> rejected
        (4, t0, 40, "view"), (4, t0, 41, "click"),
        (4, t0, 39, "purchase"),
        # u5: repeat funnel entries — first reach counts
        (5, t0, 50, "view"), (5, t0 + s, 51, "view"),
        (5, t0 + 2 * s, 52, "click"), (5, t0 + 3 * s, 53, "purchase"),
    ], columns=["user_id", "ts", "event_id", "event_type"])
    out = (funnel(ray.data.from_pandas(df)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert out.user_id.tolist() == [1, 2, 3, 4, 5]
    assert out.steps_completed.tolist() == [3, 2, 0, 2, 3]
    assert out.converted.tolist() == [True, False, False, False, True]


def test_kmv_distinct_accuracy_and_exact_regime(ray_session):
    import ray

    from el.ops.sketch import kmv_distinct

    # big group: 5000 distinct values, k=64 -> KMV stderr ~ 1/sqrt(62)
    # ~ 13%; assert within 4 sigma. small group: 10 < k -> exact.
    df = pd.DataFrame({
        "g": ["big"] * 8000 + ["small"] * 20,
        "v": list(range(5000)) + list(range(3000))  # big: dup values too
             + [f"s{i % 10}" for i in range(20)],
    })
    out = (kmv_distinct(ray.data.from_pandas(df), "g", "v", k=64)
           .to_pandas().set_index("g"))
    assert out.loc["small", "est_distinct"] == 10.0
    est = out.loc["big", "est_distinct"]
    assert abs(est - 5000) / 5000 < 0.52  # 4 sigma at k=64
    # block-structure invariance: same result from many small blocks
    out2 = (kmv_distinct(ray.data.from_pandas(df).repartition(13),
                         "g", "v", k=64).to_pandas().set_index("g"))
    assert out2.loc["big", "est_distinct"] == est


def test_doc_chunk_windows(ray_session):
    import ray

    from el.ops.prep import doc_chunk

    words = " ".join(f"w{i}" for i in range(113))  # 113 tokens
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [words, "only three tokens", "!!!"],  # 3 toks, 0 toks
    })
    out = (doc_chunk(ray.data.from_pandas(df), size=64, stride=48)
           .to_pandas().sort_values(["doc_id", "chunk_idx"])
           .reset_index(drop=True))
    d1 = out[out.doc_id == 1]
    assert d1.chunk_idx.tolist() == [0, 1, 2]
    assert d1.n_tokens.tolist() == [64, 64, 17]  # 96..112 inclusive
    assert d1.chunk_text.iloc[1].split()[0] == "w48"
    assert d1.chunk_text.iloc[2].split() == [f"w{i}" for i in
                                             range(96, 113)]
    # overlap: chunk 0 ends at w63, chunk 1 starts at w48
    assert d1.chunk_text.iloc[0].split()[-1] == "w63"
    assert out[out.doc_id == 2].n_tokens.tolist() == [3]
    assert (out.doc_id != 3).all()  # token-less doc emits nothing


def test_interval_join_containment(ray_session):
    import ray

    from el.ops.windows import interval_join

    t = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "event_id": [10, 11, 12, 20, 21],
        "ts": [t, t + 2 * h, t + 10 * h, t, t + 5 * h],
    })
    iv = pd.DataFrame({
        "user_id": [1, 1, 2],
        "session_no": [1, 2, 1],
        "session_start": [t, t + 9 * h, t],
        "session_end": [t + 3 * h, t + 11 * h, t + 1 * h],
    })
    out = (interval_join(ray.data.from_pandas(ev),
                         ray.data.from_pandas(iv))
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    # event 21 (t+5h, user 2) falls outside every interval -> dropped
    assert out.event_id.tolist() == [10, 11, 12, 20]
    assert out.session_no.tolist() == [1, 1, 2, 1]
    # boundary inclusivity: event 10 at exact session_start matches
    assert out[out.event_id == 10].session_no.iloc[0] == 1


def test_interval_join_string_key_and_keep_dtype(ray_session):
    """Generic dtypes: a STRING by-key and a string keep-col must come
    through typed — including on partitions holding only one side
    (the empty-frame schema is derived, not hardcoded int64)."""
    import ray

    from el.ops.windows import interval_join

    t = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    ev = pd.DataFrame({
        "site": ["a", "a", "b", "zz-no-interval"],
        "event_id": [10, 11, 20, 30],
        "ts": [t, t + 2 * h, t + 1 * h, t],
    })
    iv = pd.DataFrame({
        "site": ["a", "b"],
        "label": ["first", "other"],
        "session_start": [t, t],
        "session_end": [t + 3 * h, t + 3 * h],
    })
    out = (interval_join(ray.data.from_pandas(ev),
                         ray.data.from_pandas(iv), by="site",
                         keep_cols=("label",), num_partitions=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert out.event_id.tolist() == [10, 11, 20]
    assert out.label.tolist() == ["first", "first", "other"]
    assert out.site.dtype == object and out.label.dtype == object


def test_event_funnel_matches_bruteforce_random(ray_session):
    """300 random user streams vs a direct per-user simulation of the
    strict-(ts,event_id)-order first-reach recurrence."""
    import numpy as np
    import ray

    from el.ops.windows import FUNNEL_STEPS, funnel

    rng = np.random.Generator(np.random.PCG64(7))
    n = 3000
    types = np.array(["view", "click", "purchase", "signup", "error"])
    df = pd.DataFrame({
        "user_id": rng.integers(0, 300, n),
        "event_id": rng.permutation(n),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 500, n), unit="s"),
        "event_type": types[rng.integers(0, len(types), n)],
    })
    out = (funnel(ray.data.from_pandas(df).repartition(7))
           .to_pandas().set_index("user_id")["steps_completed"])
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        evs = list(zip(g["event_type"], g["ts"], g["event_id"]))
        reach, done = None, 0
        for step in FUNNEL_STEPS:
            nxt = None
            for et, ts, eid in evs:
                if et == step and (reach is None or (ts, eid) > reach):
                    nxt = (ts, eid)
                    break
            if nxt is None:
                break
            reach, done = nxt, done + 1
        assert out[uid] == done, (uid, out[uid], done)


def test_interval_join_matches_bruteforce_random(ray_session):
    """Random non-overlapping intervals per user + random events vs a
    direct containment scan (inner-join, at most one match)."""
    import numpy as np
    import ray

    from el.ops.windows import interval_join

    rng = np.random.Generator(np.random.PCG64(11))
    base = pd.Timestamp("2024-01-01")
    iv_rows, ev_rows = [], []
    eid = 0
    for uid in range(60):
        t = 0
        for sno in range(1, int(rng.integers(1, 5)) + 1):
            start = t + int(rng.integers(0, 50))
            end = start + int(rng.integers(0, 100))
            iv_rows.append((uid, sno, base + pd.Timedelta(seconds=start),
                            base + pd.Timedelta(seconds=end)))
            t = end + 1 + int(rng.integers(0, 30))
        for _ in range(int(rng.integers(0, 20))):
            ev_rows.append((uid, eid,
                            base + pd.Timedelta(
                                seconds=int(rng.integers(0, t + 50)))))
            eid += 1
    iv = pd.DataFrame(iv_rows, columns=["user_id", "session_no",
                                        "session_start", "session_end"])
    ev = pd.DataFrame(ev_rows, columns=["user_id", "event_id", "ts"])
    out = (interval_join(ray.data.from_pandas(ev).repartition(5),
                         ray.data.from_pandas(iv).repartition(3))
           .to_pandas())
    got = dict(zip(out.event_id, out.session_no))
    assert len(got) == len(out)  # no duplicate-match rows
    want = {}
    for r in ev.itertuples():
        for s in iv[iv.user_id == r.user_id].itertuples():
            if s.session_start <= r.ts <= s.session_end:
                want[r.event_id] = s.session_no
                break
    assert got == want


def test_new_ops_empty_input(ray_session):
    """Every round-3 operator must handle an empty (but typed) input
    without crashing and yield zero rows."""
    import ray

    from el.ops.prep import doc_chunk
    from el.ops.sketch import kmv_distinct
    from el.ops.textstats import unigram_logprob
    from el.ops.windows import funnel, interval_join

    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": pd.Series(dtype="int64"),
        "text": pd.Series(dtype=str)}))
    ev = ray.data.from_pandas(pd.DataFrame({
        "user_id": pd.Series(dtype="int64"),
        "event_id": pd.Series(dtype="int64"),
        "ts": pd.Series(dtype="datetime64[us]"),
        "event_type": pd.Series(dtype=str)}))
    iv = ray.data.from_pandas(pd.DataFrame({
        "user_id": pd.Series(dtype="int64"),
        "session_no": pd.Series(dtype="int64"),
        "session_start": pd.Series(dtype="datetime64[us]"),
        "session_end": pd.Series(dtype="datetime64[us]")}))
    assert doc_chunk(docs).count() == 0
    assert unigram_logprob(docs).count() == 0
    assert kmv_distinct(ev, "event_type", "user_id").count() == 0
    assert funnel(ev).count() == 0
    assert interval_join(ev, iv).count() == 0


def test_pmi_pairs_known_values(ray_session):
    import math

    import ray

    from el.ops.cooccur import pmi_pairs

    # 4 convs: a+b together twice, a alone once, c+b once
    rows = [("c1", "a"), ("c1", "b"), ("c2", "a"), ("c2", "b"),
            ("c3", "a"), ("c4", "c"), ("c4", "b"),
            ("c1", "a")]  # duplicate mention collapses
    df = pd.DataFrame(rows, columns=["conv_id", "surface"])
    out = (pmi_pairs(ray.data.from_pandas(df)).to_pandas()
           .set_index(["s1", "s2"]))
    # N=4, c_a=3, c_b=3, c_ab=2 -> PMI = ln(2*4/9)
    assert out.loc[("a", "b"), "n_convs"] == 2
    assert out.loc[("a", "b"), "pmi"] == pytest.approx(
        math.log(8 / 9), abs=1e-5)
    # c_b=3, c_c=1, c_bc=1 -> ln(4/3)
    assert out.loc[("b", "c"), "pmi"] == pytest.approx(
        math.log(4 / 3), abs=1e-5)
    assert len(out) == 2


def test_cohort_retention_known_values(ray_session):
    import ray

    from el.ops.windows import cohort_retention

    d = lambda s: pd.Timestamp(s)  # noqa: E731
    rows = [
        # u1: cohort Jan-1, active day 0, 1, 7
        (1, d("2024-01-01 08:00")), (1, d("2024-01-02 09:00")),
        (1, d("2024-01-08 10:00")),
        # u2: cohort Jan-1, active day 0 and 3 (3 not an offset)
        (2, d("2024-01-01 23:59")), (2, d("2024-01-04 00:00")),
        # u3: cohort Jan-2, day 0 only (two events same day dedupe)
        (3, d("2024-01-02 05:00")), (3, d("2024-01-02 18:00")),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = (cohort_retention(ray.data.from_pandas(df).repartition(3))
           .to_pandas().set_index(["cohort_day", "day_offset"])["users"]
           .sort_index())
    assert out.to_dict() == {
        (d("2024-01-01"), 0): 2,
        (d("2024-01-01"), 1): 1,
        (d("2024-01-01"), 7): 1,
        (d("2024-01-02"), 0): 1,
    }


def test_pivot_counts_random(ray_session):
    """Random events vs a local pandas crosstab; undeclared categories
    count toward no column."""
    import numpy as np
    import ray

    from el.ops.relational import pivot_counts

    rng = np.random.Generator(np.random.PCG64(11))
    cats = ("a", "b", "c")
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, size=2000),
        "event_type": rng.choice(list(cats) + ["zz-undeclared"],
                                 size=2000),
    })
    out = (pivot_counts(ray.data.from_pandas(df), "user_id",
                        "event_type", cats, num_partitions=4)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    ref = (df.assign(**{f"n_{c}": (df.event_type == c).astype("int64")
                        for c in cats})
           .groupby("user_id", as_index=False)[[f"n_{c}" for c in cats]]
           .sum().sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # undeclared rows contribute to no declared column
    assert out[[f"n_{c}" for c in cats]].to_numpy().sum() \
        == int((df.event_type != "zz-undeclared").sum())


def test_running_total_matches_groupby_cumsum(ray_session):
    """Random per-user streams vs pandas groupby cumsum in the same
    strict (ts, event_id) order; integer-cents accumulation is exact
    for 2dp data."""
    import numpy as np
    import ray

    from el.ops.relational import running_total

    rng = np.random.Generator(np.random.PCG64(13))
    n = 3000
    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": rng.integers(0, 50, size=n),
        "event_id": np.arange(n, dtype="int64"),
        "ts": t0 + pd.to_timedelta(rng.integers(0, 10_000, size=n),
                                   unit="s"),
        "value": np.round(rng.uniform(0, 100, size=n), 2),
    })
    out = (running_total(ray.data.from_pandas(df), num_partitions=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    ref = df.sort_values(["user_id", "ts", "event_id"],
                         kind="mergesort").copy()
    cents = np.floor(ref["value"].to_numpy() * 100 + 0.5).astype("int64")
    ref["running_value"] = (
        pd.Series(cents).groupby(ref["user_id"].to_numpy()).cumsum()
        .to_numpy() / 100.0)
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert len(out) == n
    np.testing.assert_allclose(out["running_value"].to_numpy(),
                               ref["running_value"].to_numpy(),
                               rtol=0, atol=0)


def test_hopping_distinct_matches_bruteforce(ray_session):
    import numpy as np
    import ray

    from el.ops.windows import HOP_US, WINDOW_US, hopping_distinct

    rng = np.random.Generator(np.random.PCG64(17))
    n = 2000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 6 * 3600, size=n), unit="s"),
        "event_type": rng.choice(["view", "click"], size=n),
        "user_id": rng.integers(0, 30, size=n),
        "value": np.zeros(n),
    })
    out = (hopping_distinct(ray.data.from_pandas(df), num_partitions=4)
           .to_pandas()
           .sort_values(["event_type", "window_start_us"])
           .reset_index(drop=True))
    # brute force: explode every event into its covering windows
    k = WINDOW_US // HOP_US
    tu = df["ts"].values.astype("datetime64[us]").astype("int64")
    base = (tu // HOP_US) * HOP_US
    ex = pd.DataFrame({
        "event_type": np.repeat(df["event_type"].to_numpy(), k),
        "window_start_us": (np.repeat(base, k)
                            - np.tile(np.arange(k, dtype=np.int64)
                                      * HOP_US, n)),
        "user_id": np.repeat(df["user_id"].to_numpy(), k),
    })
    ref = (ex.groupby(["event_type", "window_start_us"])["user_id"]
           .nunique().reset_index(name="n_users")
           .sort_values(["event_type", "window_start_us"])
           .reset_index(drop=True))
    ref["n_users"] = ref["n_users"].astype("int64")
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_weighted_sample_priorities_and_exclusions(ray_session):
    import numpy as np
    import ray

    from el.ops.prep import weighted_sample
    from el.scorer import md5_u64

    df = pd.DataFrame({
        "doc_id": np.arange(50, dtype="int64"),
        "text": (["word " * (i + 1) for i in range(49)] + ["..."]),
    })  # doc 49 has zero tokens -> excluded
    out = weighted_sample(ray.data.from_pandas(df), k=10).to_pandas()
    assert len(out) == 10
    assert 49 not in set(out.doc_id)
    # exact replay of the A-ES priority locally
    h = md5_u64([str(i) for i in range(49)])
    u = ((h >> np.uint64(11)).astype("float64") + 1.0) / 2.0**53
    w = np.arange(1, 50, dtype="float64")
    pri = np.log(u) / w
    top = np.argsort(-pri, kind="stable")[:10]
    assert set(out.doc_id) == set(top)
    # priorities descend, and the sample is deterministic across runs
    assert (np.diff(out.priority.to_numpy()) <= 0).all()
    out2 = weighted_sample(ray.data.from_pandas(df), k=10).to_pandas()
    assert out.equals(out2)


def test_zscore_normalize_matches_local(ray_session):
    import numpy as np
    import ray

    from el.ops.relational import zscore_normalize

    rng = np.random.Generator(np.random.PCG64(19))
    n = 2000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "event_type": rng.choice(["a", "b", "flat"], size=n),
        "value": np.round(rng.uniform(0, 50, size=n), 2),
    })
    df.loc[df.event_type == "flat", "value"] = 7.0  # zero variance
    out = (zscore_normalize(ray.data.from_pandas(df))
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert len(out) == n
    c = np.floor(df["value"].to_numpy() * 100 + 0.5).astype("int64")
    ref = np.zeros(n)
    for g in ("a", "b"):
        m = (df.event_type == g).to_numpy()
        mean_c = c[m].sum() / m.sum()
        std_c = np.sqrt((c[m] * c[m]).sum() / m.sum() - mean_c * mean_c)
        ref[m] = (c[m] - mean_c) / std_c
    ref = np.floor(ref * 1e6 + 0.5) / 1e6
    np.testing.assert_allclose(out["z"].to_numpy(), ref, rtol=0,
                               atol=1e-12)
    assert (out.loc[out.event_type == "flat", "z"] == 0.0).all()


def test_group_topk_exact_totals_and_ties(ray_session):
    import numpy as np
    import ray

    from el.ops.relational import group_topk

    rng = np.random.Generator(np.random.PCG64(23))
    n = 3000
    df = pd.DataFrame({
        "event_type": rng.choice(["x", "y"], size=n),
        "user_id": rng.integers(0, 25, size=n),
        "value": np.round(rng.uniform(0, 10, size=n), 2),
    })
    out = group_topk(ray.data.from_pandas(df), k=3).to_pandas()
    c = np.floor(df["value"].to_numpy() * 100 + 0.5).astype("int64")
    tot = (df.assign(cents=c)
           .groupby(["event_type", "user_id"], as_index=False)["cents"]
           .sum())
    for g in ("x", "y"):
        sub = tot[tot.event_type == g].sort_values(
            ["cents", "user_id"], ascending=[False, True])
        want = sub.head(3)
        got = out[out.event_type == g].sort_values("rk")
        assert got.user_id.tolist() == want.user_id.tolist()
        np.testing.assert_allclose(
            got.total_value.to_numpy(),
            np.floor(want.cents.to_numpy() / 100.0 * 100 + 0.5) / 100,
            rtol=0, atol=0)
        assert got.rk.tolist() == [1, 2, 3]


def test_gopher_rules_each_gate(ray_session):
    """Each Gopher gate flips the pass flag independently."""
    import ray.data

    from el.ops.textstats import gopher_rules

    good = ("the cat and the dog sat in a warm corner of the house "
            "that was built for them last year")
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            good,                              # passes everything
            "short text the and",              # < 10 tokens
            good + " " + " ".join(["12"] * 40),  # digit flood -> alpha
            good + " !!! ??? *** &&& ^^^ %%% " * 10,  # symbols
            ("zq wv xk pj mn bt " * 4),        # no stopwords
        ],
    })
    out = gopher_rules(ray.data.from_pandas(docs)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert bool(out.loc[1, "passes"])
    assert not bool(out.loc[2, "passes"])          # token floor
    assert out.loc[3, "alpha_ratio"] < 0.8
    assert not bool(out.loc[3, "passes"])
    assert out.loc[4, "symbol_ratio"] > 0.3
    assert not bool(out.loc[4, "passes"])
    assert out.loc[5, "n_stopwords"] < 2
    assert not bool(out.loc[5, "passes"])
    # signals are exact int/int math
    assert int(out.loc[1, "n_tokens"]) == len(good.split())


def test_bigram_pmi_bruteforce(ray_session):
    import collections
    import math

    import ray.data

    from el.ops.prep import bigram_pmi

    rng = np.random.default_rng(23)
    words = [f"w{i}" for i in range(15)]
    docs = pd.DataFrame({
        "text": [" ".join(rng.choice(words, rng.integers(5, 25)))
                 for _ in range(120)],
    })
    out = bigram_pmi(ray.data.from_pandas(docs).repartition(5),
                     k=10, min_count=3).to_pandas()

    uni, big = collections.Counter(), collections.Counter()
    for t in docs["text"]:
        ws = t.lower().split()
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    nu, nb = sum(uni.values()), sum(big.values())
    scored = []
    for (a, b), c12 in big.items():
        if c12 < 3:
            continue
        pmi = math.log((c12 / nb) / ((uni[a] / nu) * (uni[b] / nu)))
        scored.append((-int(math.floor(pmi * 1e9 + 0.5)), a, b,
                       c12, pmi))
    scored.sort()
    want = scored[:10]
    assert len(out) == len(want)
    for row, (negq, a, b, c12, pmi) in zip(out.itertuples(), want):
        assert (row.w1, row.w2) == (a, b)
        assert row.c12 == c12
        assert row.c1 == uni[a] and row.c2 == uni[b]
        assert abs(row.pmi - pmi) < 1e-5


def test_zipf_slope_bruteforce(ray_session, tmp_path):
    import collections
    import math

    from el.queries import q_zipf_slope

    rng = np.random.default_rng(37)
    # zipf-ish corpus: word w_i with weight 1/(i+1)
    words = [f"w{i}" for i in range(60)]
    w = np.array([1.0 / (i + 1) for i in range(60)])
    w /= w.sum()
    docs = pd.DataFrame({
        "doc_id": np.arange(100, dtype="int64"),
        "text": [" ".join(rng.choice(words, 40, p=w))
                 for _ in range(100)],
        "lang": ["en"] * 100, "source": ["cc"] * 100,
        "n_chars": np.ones(100, dtype="int64"),
    })
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    r = q_zipf_slope(str(tmp_path)).to_pandas().iloc[0]

    cnt = collections.Counter(t for txt in docs["text"]
                              for t in txt.split())
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    x = np.log(np.arange(1, len(top) + 1, dtype="float64"))
    y = np.log(np.array([c for _, c in top], dtype="float64"))
    kn = len(top)
    slope = (kn * (x * y).sum() - x.sum() * y.sum()) \
        / (kn * (x * x).sum() - x.sum() ** 2)
    intercept = (y.sum() - slope * x.sum()) / kn
    assert int(r["n_points"]) == kn
    assert abs(r["slope"] - slope) < 1e-4
    assert abs(r["intercept"] - intercept) < 1e-4
    assert -2.0 < r["slope"] < -0.3  # zipf-ish corpus fits a negative slope


def test_split_assign_deterministic(ray_session):
    import ray.data

    from el.ops.prep import split_assign
    from el.scorer import md5_u64

    df = pd.DataFrame({"doc_id": np.arange(200, dtype="int64"),
                       "source": ["s"] * 200})
    out = split_assign(ray.data.from_pandas(df).repartition(4)) \
        .to_pandas().set_index("doc_id").sort_index()
    h = md5_u64([str(i) for i in range(200)]) % np.uint64(100)
    for i in range(200):
        want = ("train" if h[i] < 90 else
                "val" if h[i] < 95 else "test")
        assert out.loc[i, "split"] == want
    # rough proportions hold on 200 docs
    counts = out["split"].value_counts()
    assert counts["train"] > 150
