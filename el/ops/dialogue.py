"""Conversation-level analytics over chat transcripts: per-conversation
turn/role/tool counts, token totals, wall-clock duration, and assistant
response-latency statistics.

These are the transcript-curation analogs of the document quality ops
(`el/ops/textstats.py`) — the signals a training-data pipeline filters
chat logs on (degenerate single-role conversations, stalled sessions,
tool-call density) before anything expensive runs.

Shape: ONE conv_id hash exchange (`el.shuffle.group_blocks`) then a
block-local vectorized kernel — adjacent-turn latency needs whole
conversations co-located, and conversations are tiny relative to
blocks, so the exchange moves each row exactly once and nothing lands
on the driver. Every output column is replayed bit-for-bit by a DuckDB
window-function oracle (`el/queries.py::oracle_sql()["conv_stats"]`):
integer counts, integer-second timestamps (exact in float64), and one
half-away-rounded mean.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import group_blocks

TOKEN_RE = r"[A-Za-z0-9]+"

_OUT_SCHEMA = {
    "conv_id": str,
    "n_turns": "int64",
    "n_user": "int64",
    "n_assistant": "int64",
    "n_tool": "int64",
    "n_tokens": "int64",
    "duration_s": "int64",
    "n_responses": "int64",
    "mean_latency_s": "float64",
    "max_latency_s": "int64",
}


def _empty() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=t)
                         for c, t in _OUT_SCHEMA.items()})


def conv_stats_block(df: pd.DataFrame) -> pd.DataFrame:
    """Whole-conversation kernel (runs after the conv_id exchange)."""
    from .textstats import round_half_away

    if len(df) == 0:
        return _empty()
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    g = df.groupby("conv_id", sort=False)
    cid = df["conv_id"]
    out = pd.DataFrame({
        "n_turns": g.size().astype("int64"),
        "n_user": (df["role"] == "user").groupby(cid, sort=False)
        .sum().astype("int64"),
        "n_assistant": (df["role"] == "assistant")
        .groupby(cid, sort=False).sum().astype("int64"),
        "n_tool": (df["tool"] != "").groupby(cid, sort=False)
        .sum().astype("int64"),
    })
    out["n_tokens"] = df.assign(
        nt=df["text"].str.count(TOKEN_RE)
    ).groupby("conv_id", sort=False)["nt"].sum().astype("int64")
    span = g["ts"].agg(["min", "max"])
    # integer seconds via the shared half-away rule (floor(x+0.5)) so
    # sub-second timestamps agree with the SQL oracle's identical
    # formula — astype(int64) truncates (1.9 -> 1) while a bare SQL
    # CAST rounds (1.9 -> 2)
    out["duration_s"] = np.floor(
        (span["max"] - span["min"]).dt.total_seconds() + 0.5
    ).astype("int64")
    # assistant response latency: ts minus the PREVIOUS turn's ts
    prev = df.groupby("conv_id", sort=False)["ts"].shift(1)
    lat = (df["ts"] - prev).dt.total_seconds()
    resp = df.assign(lat=lat)[(df["role"] == "assistant") & prev.notna()]
    rg = resp.groupby("conv_id", sort=False)["lat"]
    out["n_responses"] = rg.size().reindex(out.index, fill_value=0) \
        .astype("int64")
    out["mean_latency_s"] = np.where(
        out["n_responses"] > 0,
        round_half_away(rg.mean().reindex(out.index, fill_value=0.0), 6),
        0.0)
    out["max_latency_s"] = np.floor(
        rg.max().reindex(out.index, fill_value=0) + 0.5
    ).astype("int64")
    return out.reset_index()[list(_OUT_SCHEMA)]


def conv_stats(transcripts_ds):
    ds = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    return group_blocks(ds, ["conv_id"], conv_stats_block,
                        batch_format="pandas")


# ------------------------------------------------ conversation dedup
def conv_fingerprint_block(df: pd.DataFrame) -> pd.DataFrame:
    """Whole-conversation content fingerprint: md5 over the turn-ordered
    'role:text' transcript. Runs after the conv_id exchange."""
    import hashlib

    if len(df) == 0:
        return pd.DataFrame({"conv_id": pd.Series(dtype=str),
                             "fp": pd.Series(dtype=str)})
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    joined = (df["role"].str.cat(df["text"], sep=":")
              .groupby(df["conv_id"].to_numpy(), sort=False)
              .agg("\n".join))
    fp = [hashlib.md5(s.encode()).hexdigest() for s in joined]
    return pd.DataFrame({"conv_id": joined.index, "fp": fp})


def conv_dedup(transcripts_ds):
    """Exact conversation-level dedup (the transcript analog of
    `el.ops.dedup.exact_dedup`): fingerprint each conversation's full
    turn sequence, then keep the lexicographically-min conv_id per
    fingerprint. Two bounded hash exchanges — turns move once to
    co-locate conversations, then one row PER CONVERSATION moves to
    co-locate fingerprints; nothing lands on the driver."""
    ds = transcripts_ds.select_columns(["conv_id", "turn_idx", "role",
                                        "text"])
    fps = group_blocks(ds, ["conv_id"], conv_fingerprint_block,
                       batch_format="pandas")

    def block_min(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"fp": pd.Series(dtype=str),
                                 "keep_conv_id": pd.Series(dtype=str)})
        out = df.groupby("fp", as_index=False)["conv_id"].min()
        return out.rename(columns={"conv_id": "keep_conv_id"})

    return group_blocks(fps, ["fp"], block_min, batch_format="pandas")


# ------------------------------------------------ tool-call extraction
def tool_calls_block(df: pd.DataFrame) -> pd.DataFrame:
    """Whole-conversation kernel: every tool-bearing turn with the
    immediately preceding turn's role and text (the prompt that
    triggered the call) — the slice an agent-trace analysis starts
    from."""
    if len(df) == 0:
        return pd.DataFrame({
            "conv_id": pd.Series(dtype=str),
            "turn_idx": pd.Series(dtype="int64"),
            "tool": pd.Series(dtype=str),
            "prev_role": pd.Series(dtype=str),
            "prev_text": pd.Series(dtype=str),
        })
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    g = df.groupby("conv_id", sort=False)
    prev_role = g["role"].shift(1).fillna("")
    prev_text = g["text"].shift(1).fillna("")
    m = df["tool"] != ""
    return pd.DataFrame({
        "conv_id": df.loc[m, "conv_id"].to_numpy(),
        "turn_idx": df.loc[m, "turn_idx"].to_numpy(dtype="int64"),
        "tool": df.loc[m, "tool"].to_numpy(),
        "prev_role": prev_role[m].to_numpy(),
        "prev_text": prev_text[m].to_numpy(),
    })


def tool_calls(transcripts_ds):
    """One conv_id exchange + block-local shift; tool turns are rare,
    so the output is a small fraction of the input."""
    ds = transcripts_ds.select_columns(["conv_id", "turn_idx", "role",
                                        "text", "tool"])
    return group_blocks(ds, ["conv_id"], tool_calls_block,
                        batch_format="pandas")


# ---------------------------------------------- conversation near-dup
def conv_docs_block(df: pd.DataFrame, *, clone_suffix: str = "",
                    clone_offset: int = 100_000_000) -> pd.DataFrame:
    """Whole-conversation kernel: concatenate each conversation's turns
    (turn_idx order, space-joined) into one document row keyed by the
    integer tail of conv_id — the adapter that lets every document
    near-dup operator (n-gram Jaccard, MinHash, SimHash) run unchanged
    over conversations. When ``clone_suffix`` is set, conversations
    whose conv_id ends with it ALSO emit a near-dup clone (id +
    ``clone_offset``, final turn dropped) for planted-positive tests."""
    if len(df) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "text": pd.Series(dtype=str)})
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    joined = df.groupby("conv_id", sort=False)["text"].agg(" ".join)
    tails = pd.Series(joined.index).str[-8:]
    # the integer-tail derivation silently assumes the fixture's
    # 'conv{seed}-{c:08d}' id format; fail LOUDLY on a format change
    # (non-numeric tail / >=1e8 ids / clone-offset collisions) instead
    # of corrupting Jaccard pairs with aliased doc_ids
    if not tails.str.fullmatch(r"[0-9]{8}").all():
        bad = pd.Series(joined.index)[~tails.str.fullmatch(r"[0-9]{8}")]
        raise ValueError(
            f"conv_docs: conv_id tail not an 8-digit index (e.g. "
            f"{bad.iloc[0]!r}); the doc_id derivation assumes the "
            "fixture's 'conv{seed}-{c:08d}' format")
    ids = tails.astype("int64")
    if ids.duplicated().any():
        raise ValueError(
            "conv_docs: duplicate doc_ids derived from conv_id tails "
            "(distinct conv_ids sharing an 8-digit tail)")
    out = pd.DataFrame({"doc_id": ids.to_numpy(),
                        "text": joined.to_numpy()})
    if clone_suffix:
        m = df["conv_id"].str.endswith(clone_suffix)
        src = df[m]
        last = src.groupby("conv_id", sort=False)["turn_idx"] \
            .transform("max")
        trimmed = src[src["turn_idx"] < last]
        cj = trimmed.groupby("conv_id", sort=False)["text"].agg(" ".join)
        if len(cj):
            cids = (pd.Series(cj.index).str[-8:].astype("int64")
                    + clone_offset)
            out = pd.concat([out, pd.DataFrame({
                "doc_id": cids.to_numpy(), "text": cj.to_numpy()})],
                ignore_index=True)
    return out


def conv_docs(transcripts_ds, *, clone_suffix: str = ""):
    """One conv_id exchange -> conversation-documents table."""
    ds = transcripts_ds.select_columns(["conv_id", "turn_idx", "text"])

    def block(df: pd.DataFrame) -> pd.DataFrame:
        return conv_docs_block(df, clone_suffix=clone_suffix)

    return group_blocks(ds, ["conv_id"], block, batch_format="pandas")


def tool_bigrams_block(df: pd.DataFrame) -> pd.DataFrame:
    """Whole-conversation kernel: per-block (prev_tool, tool) counts of
    CONSECUTIVE tool calls (in turn order, skipping non-tool turns) —
    the transition matrix an agent-trace process-mining pass starts
    from."""
    empty = pd.DataFrame({"prev_tool": pd.Series(dtype=str),
                          "tool": pd.Series(dtype=str),
                          "c": pd.Series(dtype="int64")})
    if len(df) == 0:
        return empty
    t = df[df["tool"] != ""].sort_values(["conv_id", "turn_idx"],
                                         kind="stable")
    if len(t) == 0:
        return empty
    prev = t.groupby("conv_id", sort=False)["tool"].shift(1)
    m = prev.notna()
    if not m.any():
        return empty
    out = pd.DataFrame({"prev_tool": prev[m].to_numpy(),
                        "tool": t.loc[m, "tool"].to_numpy()}) \
        .groupby(["prev_tool", "tool"], as_index=False).size() \
        .rename(columns={"size": "c"})
    out["c"] = out["c"].astype("int64")
    return out


def tool_bigrams(transcripts_ds):
    """Tool-call transition counts across the corpus: one row per
    (prev_tool, tool) pair with how often that consecutive pair occurs
    within a conversation (n_pairs), plus the share of all transitions
    (share, 6dp).

    Scale shape: one conv_id exchange co-locates each conversation;
    block kernels emit tool-vocabulary-bounded count partials; one
    tiny (prev_tool, tool) exchange merges them; the share divides by
    the exact global transition total (single-row broadcast-free final
    pass over a vocabulary^2-bounded frame)."""
    ds = transcripts_ds.select_columns(["conv_id", "turn_idx", "tool"])
    parts = group_blocks(ds, ["conv_id"], tool_bigrams_block,
                         batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"prev_tool": pd.Series(dtype=str),
                                 "tool": pd.Series(dtype=str),
                                 "n_pairs": pd.Series(dtype="int64")})
        out = df.groupby(["prev_tool", "tool"], as_index=False)["c"] \
            .sum().rename(columns={"c": "n_pairs"})
        out["n_pairs"] = out["n_pairs"].astype("int64")
        return out

    merged = group_blocks(parts, ["prev_tool", "tool"], merge,
                          batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"prev_tool": str, "tool": str, "n_pairs": "int64",
                "share": "float64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        total = float(int(df["n_pairs"].sum()))
        df = df.copy()
        df["share"] = np.floor(
            df["n_pairs"].to_numpy("float64") / total * 1e6 + 0.5) / 1e6
        return df.sort_values(["prev_tool", "tool"]) \
            .reset_index(drop=True)[list(cols)]

    return merged.repartition(1).map_batches(final, batch_format="pandas",
                                             batch_size=None)


_TT_SCHEMA = {"conv_id": str, "n_turns": "int64",
              "n_switches": "int64", "switch_rate": "float64",
              "longest_run": "int64", "n_roles": "int64"}


def turn_taking_block(df: pd.DataFrame) -> pd.DataFrame:
    """Whole-conversation turn-taking kernel (runs after the conv_id
    exchange): role-switch count and rate (switches / (turns-1)),
    longest same-role run, distinct-role count — the conversational-
    structure health signals a dialogue-corpus curation pass filters
    on (single-role monologues, degenerate ping-pong). All counts are
    integers; the rate is one int/int division rounded on the 1e-6
    grid (0.0 for single-turn conversations)."""
    from .textstats import round_half_away

    if len(df) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in _TT_SCHEMA.items()})
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    cid = df["conv_id"]
    prev_role = df.groupby("conv_id", sort=False)["role"].shift(1)
    switch = (df["role"] != prev_role) & prev_role.notna()
    # run ids increment at every switch (and at conversation starts)
    run_id = (switch | prev_role.isna()).cumsum()
    runs = df.assign(r=run_id).groupby(["conv_id", "r"], sort=False) \
        .size()
    out = pd.DataFrame({
        "n_turns": df.groupby("conv_id", sort=False).size()
        .astype("int64"),
        "n_switches": switch.groupby(cid, sort=False).sum()
        .astype("int64"),
        "longest_run": runs.groupby("conv_id", sort=False).max()
        .astype("int64"),
        "n_roles": df.groupby("conv_id", sort=False)["role"]
        .nunique().astype("int64"),
    })
    nt = out["n_turns"].to_numpy(np.float64)
    out["switch_rate"] = np.where(
        nt <= 1, 0.0,
        round_half_away(out["n_switches"].to_numpy(np.float64)
                        / np.where(nt <= 1, 1.0, nt - 1.0), 6))
    return out.reset_index()[list(_TT_SCHEMA)]


def turn_taking(transcripts_ds):
    ds = transcripts_ds.select_columns(["conv_id", "turn_idx", "role"])
    return group_blocks(ds, ["conv_id"], turn_taking_block,
                        batch_format="pandas")


_TL_PARTIAL = {"role_from": str, "role_to": str, "c": "int64",
               "sum_us": "int64", "max_us": "int64"}


def turn_latency_block(df: pd.DataFrame) -> pd.DataFrame:
    """Whole-conversation kernel: per-block (role_from, role_to)
    partials of adjacent-turn latency — count, exact microsecond sum
    and max over every consecutive turn pair. Complements conv_stats
    (per-conversation assistant latency) with the corpus-level
    role-transition latency matrix a serving/curation pass reads
    (how long after a user turn does the assistant land, how fast do
    tool rounds bounce back)."""
    empty = pd.DataFrame({k: pd.Series(dtype=v)
                          for k, v in _TL_PARTIAL.items()})
    if len(df) == 0:
        return empty
    t = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    g = t.groupby("conv_id", sort=False)
    prev_role = g["role"].shift(1)
    prev_ts = g["ts"].shift(1)
    m = prev_role.notna()
    if not m.any():
        return empty
    delta_us = (t.loc[m, "ts"].to_numpy("datetime64[us]")
                - prev_ts[m].to_numpy("datetime64[us]")) \
        .astype("timedelta64[us]").astype("int64")
    out = pd.DataFrame({"role_from": prev_role[m].to_numpy(),
                        "role_to": t.loc[m, "role"].to_numpy(),
                        "us": delta_us}) \
        .groupby(["role_from", "role_to"], as_index=False) \
        .agg(c=("us", "size"), sum_us=("us", "sum"), max_us=("us", "max"))
    for col in ("c", "sum_us", "max_us"):
        out[col] = out[col].astype("int64")
    return out


def turn_latency(transcripts_ds):
    """Corpus-level role-transition latency matrix: one row per
    (role_from, role_to) with transition count, mean latency in
    seconds (1e-6 grid) and exact max latency in microseconds.

    Scale shape: one conv_id exchange co-locates conversations; block
    kernels emit roles^2-bounded integer partials (count / sum_us /
    max_us — all exact int64); one tiny (role_from, role_to) exchange
    merges. Nothing corpus-proportional leaves the block kernels."""
    from .textstats import round_half_away

    ds = transcripts_ds.select_columns(["conv_id", "turn_idx", "role",
                                        "ts"])
    parts = group_blocks(ds, ["conv_id"], turn_latency_block,
                         batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"role_from": str, "role_to": str, "n": "int64",
                "mean_latency_s": "float64", "max_latency_us": "int64"}
        if len(df) == 0:
            return pd.DataFrame({k: pd.Series(dtype=v)
                                 for k, v in cols.items()})
        g = df.groupby(["role_from", "role_to"], as_index=False) \
            .agg(n=("c", "sum"), sum_us=("sum_us", "sum"),
                 max_latency_us=("max_us", "max"))
        g["n"] = g["n"].astype("int64")
        g["max_latency_us"] = g["max_latency_us"].astype("int64")
        # sum_us < 2^53 for any realistic corpus slice is NOT assumed:
        # int64 sums stay exact; the division happens once in float64.
        g["mean_latency_s"] = round_half_away(
            g["sum_us"].to_numpy("float64")
            / g["n"].to_numpy("float64") / 1e6, 6)
        return g[list(cols)]

    return group_blocks(parts, ["role_from", "role_to"], merge,
                        batch_format="pandas")


_VO_SCHEMA = {"conv_id": str, "n_user_vocab": "int64",
              "n_assistant_vocab": "int64", "n_shared": "int64",
              "jaccard": "float64"}


def vocab_overlap_block(df: pd.DataFrame) -> pd.DataFrame:
    """Whole-conversation kernel: distinct lowercase token vocabularies
    of the user and assistant turns and their Jaccard overlap — the
    lexical-alignment signal (parroting assistants score high,
    off-topic ones near zero). Tool turns are excluded on both
    sides."""
    from .textstats import round_half_away

    if len(df) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in _VO_SCHEMA.items()})
    df = df[df["role"].isin(("user", "assistant"))]
    if len(df) == 0:
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in _VO_SCHEMA.items()})
    toks = df["text"].str.lower().str.findall(r"[a-z0-9]+")
    rows = []
    e = df.assign(t=toks)[["conv_id", "role", "t"]].explode("t")
    e = e[e["t"].notna()].drop_duplicates(["conv_id", "role", "t"])
    for cid, g in e.groupby("conv_id", sort=False):
        u = set(g.loc[g["role"] == "user", "t"])
        a = set(g.loc[g["role"] == "assistant", "t"])
        inter = len(u & a)
        union = len(u | a)
        rows.append((cid, len(u), len(a), inter,
                     round_half_away(inter / union, 6)
                     if union else 0.0))
    out = pd.DataFrame(rows, columns=list(_VO_SCHEMA))
    return out.astype(_VO_SCHEMA)


def vocab_overlap(transcripts_ds):
    """Per-conversation user/assistant vocabulary Jaccard.

    Scale shape: ONE conv_id exchange (conversations are tiny vs
    blocks), in-block distinct-token set arithmetic, integer counts +
    one rounded division. Out: (conv_id, n_user_vocab,
    n_assistant_vocab, n_shared, jaccard)."""
    ds = transcripts_ds.select_columns(["conv_id", "role", "text"])
    return group_blocks(ds, ["conv_id"], vocab_overlap_block,
                        batch_format="pandas")
