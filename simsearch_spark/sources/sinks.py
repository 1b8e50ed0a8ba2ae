"""S5 output sinks (``engine/OutputWriter.java``: JSON default, CSV with
separator/quote/header, tabular text to file or console —
``SearchResponseTable.java``).

Spark-first: result frames are tiny (k·combos rows), so file sinks write
driver-side for a single tidy file (the reference writes one file too);
corpus-scale exports go through ``df.write`` untouched.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def write_json(df: DataFrame, path: str, indent: int | None = None) -> None:
    rows = [r.asDict(recursive=True) for r in df.collect()]
    with open(path, "w") as f:
        json.dump(rows, f, indent=indent, default=str)


def write_csv(df: DataFrame, path: str, sep: str = ",", header: bool = True, quote: str = '"') -> None:
    import csv

    rows = df.collect()
    with open(path, "w", newline="") as f:
        w = csv.writer(f, delimiter=sep, quotechar=quote, quoting=csv.QUOTE_MINIMAL)
        if header:
            w.writerow(df.columns)
        for r in rows:
            w.writerow([r[c] for c in df.columns])


def format_table(df: DataFrame, max_col_width: int = 30) -> str:
    """Tabular text (SearchResponseTable.java's console shape)."""
    rows = df.collect()
    cols = df.columns
    cells = [[str(r[c])[:max_col_width] for c in cols] for r in rows]
    widths = [
        max(len(c), *(len(row[i]) for row in cells)) if cells else len(c)
        for i, c in enumerate(cols)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep, "|" + "|".join(f" {c:<{w}} " for c, w in zip(cols, widths)) + "|", sep]
    for row in cells:
        out.append("|" + "|".join(f" {v:<{w}} " for v, w in zip(row, widths)) + "|")
    out.append(sep)
    return "\n".join(out)
