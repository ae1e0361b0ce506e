"""Context-window lookup — ALCO's grep context view (SURVEY.md §2.4 J2).

The reference fetches +-k neighboring lines around a search hit within
the same context-column values.  Graft: per-conversation window over
``turn_idx`` — one groupby(conv_id) shuffle, then a vectorized window
inside each group (no cross-group traffic).  Group count = conversation
count, and group size is conversation-bounded, so per-group overhead is
amortized (conversations are small; the Zipf-hot ones are still far
below block size).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def rolling_count(ds, *, flag_col: str, flag_value, radius: int = 2,
                  conv_col: str = "conv_id", idx_col: str = "turn_idx",
                  out_col: str = "w_count"):
    """Centered rolling window aggregate: for every turn, the number of
    rows with ``flag_col == flag_value`` within ``radius`` turns in the
    same conversation (ROWS frame; turn_idx is dense per fixture
    contract).  One groupby(conv_id) shuffle; vectorized pandas rolling
    inside each group.  Skew note: the hot Zipf-head conversation lands
    in one group, but a group is one conversation (<=512 turns nominal,
    ~5% of corpus worst-case) — far under block size."""

    def body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        flag = (g[flag_col] == flag_value).astype("int64")
        w = flag.rolling(2 * radius + 1, center=True, min_periods=1).sum()
        out = g[[conv_col, idx_col]].copy()
        out[out_col] = w.astype("int64").to_numpy()
        return out

    return ds.groupby(conv_col).map_groups(body, batch_format="pandas")


def asof_prior(ds, *, flag_col: str, flag_value,
               conv_col: str = "conv_id", idx_col: str = "turn_idx",
               out_col: str = "last_match_idx"):
    """As-of join within a conversation: for every turn, the most
    recent ``turn_idx`` at-or-before it whose ``flag_col`` equals
    ``flag_value`` (-1 if none yet) — a running cummax over the
    sorted group, the per-key as-of pattern."""

    def body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        hit = g[idx_col].where(g[flag_col] == flag_value)
        out = g[[conv_col, idx_col]].copy()
        # ffill carries the latest match forward (matches arrive in
        # increasing idx order, so last seen == running max); cummax
        # alone would leave non-match rows NaN.
        out[out_col] = hit.ffill().fillna(-1).astype("int64")
        return out

    return ds.groupby(conv_col).map_groups(body, batch_format="pandas")


def sessionize(ds, *, key_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30, out_col: str = "session_id"):
    """Gap-based sessionization: within each key, a new session starts
    whenever the time since the previous event exceeds ``gap_minutes``.
    session_id = running count of gap-breaks (0-based) per key.  One
    groupby(key) shuffle; cumulative sum inside the group."""

    def body(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        gap = g[ts_col].diff() > pd.Timedelta(minutes=gap_minutes)
        g = g.copy()
        g[out_col] = gap.cumsum().astype("int64")
        return g

    return ds.groupby(key_col).map_groups(body, batch_format="pandas")


def context_window(ds, *, match_col: str, match_value, radius: int = 1,
                   conv_col: str = "conv_id", idx_col: str = "turn_idx",
                   keep_cols: list[str] | None = None):
    """Rows within ``radius`` turns of a matching row in the same
    conversation.  Returns the kept rows (deduplicated, stable order
    within conversation)."""
    cols = keep_cols or [conv_col, idx_col, match_col]

    def window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(idx_col, kind="mergesort")
        idx = g[idx_col].to_numpy()
        hits = idx[(g[match_col] == match_value).to_numpy()]
        if not len(hits):
            return g.iloc[0:0][cols]
        keep = np.zeros(len(g), dtype=bool)
        for h in hits:  # hits per conversation are few; window is vector
            keep |= np.abs(idx - h) <= radius
        return g.loc[keep, cols]

    return ds.groupby(conv_col).map_groups(window, batch_format="pandas")
