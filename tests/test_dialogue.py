"""Conversation analytics: per-conversation role/tool/token counts,
duration, assistant response latency."""

import numpy as np
import pandas as pd


def _toy():
    ts = pd.to_datetime([
        "2024-01-01 00:00:00",  # c1 user
        "2024-01-01 00:00:05",  # c1 assistant (lat 5)
        "2024-01-01 00:00:06",  # c1 user
        "2024-01-01 00:00:09",  # c1 assistant (lat 3)
        "2024-01-01 01:00:00",  # c2 user (lone turn)
    ])
    return pd.DataFrame({
        "conv_id": ["c1"] * 4 + ["c2"],
        "turn_idx": [0, 1, 2, 3, 0],
        "role": ["user", "assistant", "user", "assistant", "user"],
        "text": ["hi there", "hello", "run the tool", "done ok now", "hm"],
        "tool": ["", "", "", "search", ""],
        "ts": ts,
    })


def test_conv_stats_exact(ray_session):
    import ray.data

    from el.ops.dialogue import conv_stats

    out = conv_stats(ray.data.from_pandas(_toy())).to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)
    c1 = out.iloc[0]
    assert (c1["n_turns"], c1["n_user"], c1["n_assistant"],
            c1["n_tool"]) == (4, 2, 2, 1)
    assert c1["n_tokens"] == 2 + 1 + 3 + 3
    assert c1["duration_s"] == 9
    assert c1["n_responses"] == 2
    assert c1["mean_latency_s"] == 4.0   # (5 + 3) / 2
    assert c1["max_latency_s"] == 5
    c2 = out.iloc[1]
    assert (c2["n_turns"], c2["n_responses"], c2["duration_s"]) == (1, 0, 0)
    assert c2["mean_latency_s"] == 0.0


def test_conv_stats_split_blocks(ray_session):
    # a conversation split across input blocks must still aggregate
    # whole (the exchange co-locates it)
    import ray.data

    from el.ops.dialogue import conv_stats

    df = _toy()
    ds = ray.data.from_pandas([df.iloc[:2], df.iloc[2:]])
    out = conv_stats(ds).to_pandas().sort_values("conv_id") \
        .reset_index(drop=True)
    assert out.loc[0, "n_turns"] == 4
    assert out.loc[0, "n_responses"] == 2
    assert out.loc[0, "mean_latency_s"] == 4.0


def test_conv_dedup_collapses_exact_copies(ray_session):
    import ray.data

    from el.ops.dialogue import conv_dedup

    df = _toy()
    dup = df[df["conv_id"] == "c1"].copy()
    dup["conv_id"] = "z-copy"
    both = pd.concat([df, dup], ignore_index=True)
    out = conv_dedup(ray.data.from_pandas(both)).to_pandas()
    assert len(out) == 2  # c1==z-copy collapse; c2 alone
    keeps = set(out["keep_conv_id"])
    assert keeps == {"c1", "c2"}  # min conv_id wins


def test_conv_dedup_turn_order_matters(ray_session):
    # same turns in a different order = a different conversation
    import ray.data

    from el.ops.dialogue import conv_dedup

    df = _toy()
    swapped = df[df["conv_id"] == "c1"].copy()
    swapped["conv_id"] = "c3"
    swapped["turn_idx"] = [3, 2, 1, 0]
    both = pd.concat([df, swapped], ignore_index=True)
    out = conv_dedup(ray.data.from_pandas(both)).to_pandas()
    assert len(out) == 3


def test_bpe_token_count_exact(ray_session):
    import ray.data

    from el.ops.textstats import bpe_token_count

    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["don't stop2believing!", "  a  b "],
    })
    out = bpe_token_count(ray.data.from_pandas(df)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # doc1 ws: ["don't", "stop2believing!"] -> 2
    # doc1 bpe: [don][']​[t][ stop][2][believing][!] -> 7
    assert out["n_ws_tokens"].tolist() == [2, 2]
    assert out["n_bpe_tokens"].tolist() == [7, 2]


def test_tool_calls_prev_turn(ray_session):
    import ray.data

    from el.ops.dialogue import tool_calls

    out = tool_calls(ray.data.from_pandas(_toy())).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["conv_id"], r["turn_idx"], r["tool"]) == ("c1", 3, "search")
    assert r["prev_role"] == "user"
    assert r["prev_text"] == "run the tool"


def test_tool_calls_first_turn_has_empty_prev(ray_session):
    import ray.data

    from el.ops.dialogue import tool_calls

    df = _toy()
    df.loc[df["turn_idx"].eq(0) & df["conv_id"].eq("c2"), "tool"] = "shell"
    out = tool_calls(ray.data.from_pandas(df)).to_pandas() \
        .sort_values("conv_id").reset_index(drop=True)
    c2 = out[out["conv_id"] == "c2"].iloc[0]
    assert (c2["prev_role"], c2["prev_text"]) == ("", "")


def test_conv_dedup_property_block_invariant(ray_session):
    """Property: fingerprints are invariant to how turns land in blocks
    and to within-block row order; duplicated conversations always
    collapse."""
    import ray.data
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from el.ops.dialogue import conv_dedup

    @settings(max_examples=6, deadline=None)
    @given(
        n_convs=st.integers(min_value=1, max_value=6),
        n_turns=st.integers(min_value=1, max_value=5),
        seed=st.integers(min_value=0, max_value=10_000),
        split=st.integers(min_value=1, max_value=10),
    )
    def prop(n_convs, n_turns, seed, split):
        import numpy as np

        rng = np.random.default_rng(seed)
        rows = []
        for c in range(n_convs):
            for t in range(n_turns):
                rows.append({"conv_id": f"c{c:02d}", "turn_idx": t,
                             "role": "user" if t % 2 == 0 else "assistant",
                             "text": f"w{rng.integers(0, 3)} t{t}"})
        df = pd.DataFrame(rows)
        dup = df[df["conv_id"] == "c00"].copy()
        dup["conv_id"] = "zz-dup"
        both = pd.concat([df, dup], ignore_index=True)
        shuffled = both.sample(frac=1.0, random_state=seed) \
            .reset_index(drop=True)
        cut = max(1, len(shuffled) * split // 10)
        ds = ray.data.from_pandas([shuffled.iloc[:cut],
                                   shuffled.iloc[cut:]]) \
            if cut < len(shuffled) else ray.data.from_pandas(shuffled)
        out = conv_dedup(ds).to_pandas()
        # zz-dup must collapse onto c00; every fp keeps its min conv_id
        by_fp = dict(zip(out["fp"], out["keep_conv_id"]))
        assert len(out) == out["fp"].nunique()
        assert "zz-dup" not in set(out["keep_conv_id"])
        assert len(by_fp) <= n_convs  # dup added no new fingerprint

    prop()


def test_conv_docs_and_ngram_near_dup(ray_session):
    import ray.data

    from el.ops.dedup import ngram_jaccard_pairs
    from el.ops.dialogue import conv_docs

    rows = []
    for t in range(6):
        rows.append({"conv_id": "conv-00000301", "turn_idx": t,
                     "role": "user", "text": f"alpha beta gamma t{t}"})
    rows.append({"conv_id": "conv-00000302", "turn_idx": 0,
                 "role": "user", "text": "totally different words here"})
    df = pd.DataFrame(rows)
    docs = conv_docs(ray.data.from_pandas(df), clone_suffix="01") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # conv ...301 ends with '01' -> emits itself + a clone at +1e8
    assert docs["doc_id"].tolist() == [301, 302, 100000301]
    full = docs.loc[0, "text"]
    clone = docs.loc[2, "text"]
    assert clone == " ".join(full.split()[: len(full.split()) - 4])
    pairs = ngram_jaccard_pairs(
        ray.data.from_pandas(docs[["doc_id", "text"]]), threshold=0.5
    ).to_pandas()
    got = set(zip(pairs["d1"], pairs["d2"]))
    assert (301, 100000301) in got          # near-dup found
    assert all(302 not in p for p in got)   # unrelated conv untouched


def test_tool_bigrams_bruteforce(ray_session):
    import ray.data

    from el.ops.dialogue import tool_bigrams

    rng = np.random.default_rng(5)
    tools = np.array(["", "search", "calc", "browse"])
    rows = []
    for c in range(12):
        n = rng.integers(4, 12)
        for i in range(n):
            rows.append((f"c{c}", i, tools[rng.integers(0, 4)]))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "tool"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    out = tool_bigrams(ray.data.from_pandas(df).repartition(4)) \
        .to_pandas()

    import collections
    cnt = collections.Counter()
    for _, g in df.groupby("conv_id"):
        seq = [t for t in g.sort_values("turn_idx")["tool"] if t != ""]
        for a, b in zip(seq, seq[1:]):
            cnt[(a, b)] += 1
    total = sum(cnt.values())
    got = {(r.prev_tool, r.tool): (r.n_pairs, r.share)
           for r in out.itertuples()}
    assert set(got) == set(cnt)
    for k, n in cnt.items():
        assert got[k][0] == n
        assert abs(got[k][1] - n / total) < 1e-6


def test_turn_taking_exact(ray_session):
    import ray.data

    from el.ops.dialogue import turn_taking

    df = pd.DataFrame({
        "conv_id": ["c1"] * 6 + ["c2"] + ["c3"] * 4,
        "turn_idx": [0, 1, 2, 3, 4, 5, 0, 0, 1, 2, 3],
        "role": ["user", "assistant", "assistant", "assistant",
                 "user", "assistant",           # c1: 3 switches
                 "user",                        # c2: lone turn
                 "user", "user", "user", "user"],  # c3: monologue
    })
    out = turn_taking(ray.data.from_pandas(df).repartition(3)) \
        .to_pandas().set_index("conv_id").sort_index()

    assert out.loc["c1", "n_turns"] == 6
    assert out.loc["c1", "n_switches"] == 3
    assert abs(out.loc["c1", "switch_rate"] - 3 / 5) < 1e-6
    assert out.loc["c1", "longest_run"] == 3
    assert out.loc["c1", "n_roles"] == 2

    assert out.loc["c2", "n_turns"] == 1
    assert out.loc["c2", "n_switches"] == 0
    assert out.loc["c2", "switch_rate"] == 0.0
    assert out.loc["c2", "longest_run"] == 1

    assert out.loc["c3", "n_switches"] == 0
    assert out.loc["c3", "switch_rate"] == 0.0
    assert out.loc["c3", "longest_run"] == 4
    assert out.loc["c3", "n_roles"] == 1
