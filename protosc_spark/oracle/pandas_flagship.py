"""Pandas oracle for the flagship pipeline (tests only).

Independent re-computation of every flagship feature with
pandas/numpy groupbys — no Spark. The per-turn text extractors share
their numpy kernels with the Spark UDFs (features/text.py), so the
oracle's real value is pinning the WINDOW and AS-OF semantics (lag,
rolling, sessionization, strict-past join) against an implementation
with a totally different execution model.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from protosc_spark.features.text import (
    hashed_ngram_np,
    token_length_hist_np,
    ROLES,
    TOKEN_ID_SCALE,
    TOKEN_IDS_K,
    TOOLS,
)


def oracle_flagship(
    transcripts: pd.DataFrame, updates: pd.DataFrame | None = None
) -> pd.DataFrame:
    """Return (conv_id, turn_idx, ts, features list) sorted by key."""
    df = (
        transcripts.sort_values(["conv_id", "turn_idx", "ts", "role"], kind="mergesort")
        .groupby(["conv_id", "turn_idx"], as_index=False)
        .first()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    texts = df["text"].fillna("").to_numpy()

    # per-turn extractors ---------------------------------------------------
    n_tokens = np.array([len(t.split(" ")) if t else 1 for t in texts], float)
    n_chars = np.array([len(t) for t in texts], float)
    avg_tok = (n_chars - (n_tokens - 1)) / n_tokens
    length_block = np.column_stack([n_chars, n_tokens, avg_tok])

    char_block = token_length_hist_np(texts)
    ngram_block = hashed_ngram_np(texts)

    tok_block = np.full((len(df), TOKEN_IDS_K), -1.0 / TOKEN_ID_SCALE)
    for i, t in enumerate(texts):
        toks = t.split(" ")[:TOKEN_IDS_K] if t else []
        for j, tok in enumerate(toks):
            digits = "".join(ch for ch in tok if ch.isdigit())
            tok_block[i, j] = (float(digits) if digits else -1.0) / TOKEN_ID_SCALE

    role_block = np.zeros((len(df), len(ROLES) + len(TOOLS) + 1))
    for i, (r, tl) in enumerate(zip(df["role"], df["tool"])):
        if r in ROLES:
            role_block[i, ROLES.index(r)] = 1.0
        if isinstance(tl, str):
            if tl in TOOLS:
                role_block[i, len(ROLES) + TOOLS.index(tl)] = 1.0
            role_block[i, -1] = 1.0

    # window features --------------------------------------------------------
    g = df.groupby("conv_id", sort=False)
    prev_nt = pd.Series(n_tokens).groupby(df["conv_id"].values).shift(1)
    prev_nt = prev_nt.fillna(-1.0).to_numpy()
    ts_s = df["ts"].astype("int64") // 10**9
    prev_ts = g["ts"].shift(1)
    gap = (ts_s - prev_ts.astype("int64").floordiv(10**9)).astype(float)
    gap[prev_ts.isna()] = -1.0
    gap = gap.to_numpy()

    roll5 = (
        pd.Series(n_tokens)
        .groupby(df["conv_id"].values)
        .rolling(5, min_periods=1)
        .mean()
        .reset_index(level=0, drop=True)
        .sort_index()
        .to_numpy()
    )

    is_new = ((prev_ts.isna()) | ((ts_s - prev_ts.astype("int64").floordiv(10**9)) > 1800)).astype(int)
    session_id = is_new.groupby(df["conv_id"].values).cumsum().to_numpy()
    turn_in_session = (
        df.assign(sid=session_id)
        .groupby(["conv_id", "sid"], sort=False)
        .cumcount()
        .to_numpy()
        + 1
    )
    window_block = np.column_stack(
        [prev_nt, gap, roll5, turn_in_session.astype(float), session_id.astype(float)]
    )

    blocks = [length_block, char_block, ngram_block, tok_block, role_block,
              window_block]

    # strict-past as-of ------------------------------------------------------
    if updates is not None:
        left = df[["conv_id", "turn_idx", "ts"]].sort_values(
            ["ts", "conv_id"], kind="mergesort"
        )
        right = updates.sort_values(["ts", "conv_id"], kind="mergesort")
        m = pd.merge_asof(
            left, right, on="ts", by="conv_id", direction="backward",
            allow_exact_matches=False,
        ).sort_values(["conv_id", "turn_idx"], kind="mergesort")
        known = m["attr_value"].notna().to_numpy().astype(float)
        val = m["attr_value"].fillna(-1.0).to_numpy()
        blocks.append(np.column_stack([val, known]))

    feats = np.hstack(blocks)
    return pd.DataFrame(
        {
            "conv_id": df["conv_id"],
            "turn_idx": df["turn_idx"],
            "ts": df["ts"],
            "features": list(feats),
        }
    )
