"""Single-threaded reference replayer — the replay-equivalence oracle.

Applies a change log event-by-event in strict LSN order with a plain dict,
using the SAME pure extraction function as the engine's pandas UDF
(hyped_spark.functions.text.extract_text_bytes) so per-url `text` must be
byte-identical. ~30 lines, obviously correct; the engine must match its
final state exactly (BASELINE.json "replay equivalence").
"""

from __future__ import annotations

from typing import Any

import pandas as pd

from hyped_spark.functions.text import extract_text_bytes


def replay_reference(log: pd.DataFrame, key: str = "url") -> pd.DataFrame:
    """log: pandas frame with lsn/op/url/warc_ts/html/lang[/fetch_status...]."""
    payload_cols = [c for c in log.columns if c not in ("op",)]
    state: dict[str, dict[str, Any]] = {}
    for row in log.sort_values("lsn").itertuples(index=False):
        d = row._asdict()
        url = d[key]
        if d["op"] == "delete":
            state.pop(url, None)
            continue
        rec = {c: d.get(c) for c in payload_cols}
        rec["text"] = extract_text_bytes(d["html"])
        state[url] = rec
    if not state:
        return pd.DataFrame(columns=payload_cols + ["text"])
    return pd.DataFrame(list(state.values()))
