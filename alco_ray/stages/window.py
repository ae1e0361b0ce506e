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
