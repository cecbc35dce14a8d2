"""Trivially-correct reduction oracle for CDC replay tests.

Final expected state of the docs table = for each doc_id, the payload
of its highest-LSN event, dropped if that event is a delete; keys never
seen in the stream keep their base-table row. Computed in pandas so the
engine under test shares no code with the oracle.
"""

from __future__ import annotations

import pandas as pd


def expected_final_state(
    events_pdf: pd.DataFrame, base_pdf: pd.DataFrame | None = None
) -> pd.DataFrame:
    # drop_duplicates keeps the whole last row (groupby.last would skip
    # the NULL payloads that delete events carry)
    ev = events_pdf.sort_values("lsn").drop_duplicates("doc_id", keep="last")
    survivors = ev[ev["op"] != "D"].copy()
    cols = ["doc_id", "tokens", "n_tok", "source", "lang"]
    if "lang" not in survivors.columns:
        survivors["lang"] = None
    survivors = survivors[cols]
    if base_pdf is not None:
        base = base_pdf.copy()
        if "lang" not in base.columns:
            base["lang"] = None
        untouched = base[~base["doc_id"].isin(set(ev["doc_id"]))][cols]
        survivors = pd.concat([survivors, untouched], ignore_index=True)
    return canon(survivors)


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for equality: sorted by doc_id, tokens as tuples,
    n_tok as nullable int, reset index."""
    out = pdf.copy()
    out["tokens"] = out["tokens"].map(lambda t: None if t is None else tuple(int(x) for x in t))
    out["n_tok"] = out["n_tok"].astype("Int64")
    if "lang" in out.columns:
        out["lang"] = out["lang"].where(pd.notna(out["lang"]), None)
    return out.sort_values("doc_id").reset_index(drop=True)


def assert_frames_equal(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    assert len(actual) == len(expected), f"row count {len(actual)} != {len(expected)}"
    a, e = canon(actual), canon(expected)
    for col in e.columns:
        mism = [
            (i, av, ev)
            for i, (av, ev) in enumerate(zip(a[col].tolist(), e[col].tolist()))
            if (av != ev and not (pd.isna(av) and pd.isna(ev)))
        ]
        assert not mism, f"column {col}: {len(mism)} mismatches, first: {mism[:3]}"
