"""Augment a fixture sf dir with NULL-metadata rows (round 10 — r9
verdict item 5).

The two-phase-rank NULL-stratum loss (fixed in f416bd7) was invisible
to the sf0.01 oracle gate because NO fixture row carries a NULL
source/stratum/group key — an entire class of bugs (NULL groups
silently dropped by equi-joins, windows, group-bys) passed the gate
without being exercised.  The driver's fixtures are read-only, so this
tool writes an AUGMENTED copy:

- ``documents``: +N rows with ``source`` NULL (and half of those with
  ``lang`` NULL) — exercises NULL strata in ``dataset_split_q``,
  ``quota_sample_sources``, ``mix_sample_sources``, per-source stats.
- ``events``: +N rows with ``user_id`` NULL (and a quarter with
  ``event_type`` NULL) — exercises NULL group keys in the event
  aggregations / windows / pivots.

Everything else is copied through unchanged, so every ``queries()``
entry and its DuckDB oracle run on identical bytes.  The oracle gate
then runs over the augmented dir:

    python tools/make_null_fixture.py /root/testdata/sf0.01 /tmp/sf0.01_nulls
    python tools/oracle_check.py /tmp/sf0.01_nulls

Any query that silently drops NULL groups diverges from its SQL oracle
there (DuckDB keeps NULL groups per ANSI GROUP BY) and fails the gate.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb


def augment(src: str, out: str, n_docs: int = 24, n_events: int = 60) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for name in os.listdir(src):
        if not name.endswith(".parquet"):
            continue
        s, o = os.path.join(src, name), os.path.join(out, name)
        if name == "documents.parquet":
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{s}')
                  UNION ALL
                  SELECT (SELECT max(doc_id) FROM read_parquet('{s}')) + 1 + i AS doc_id,
                         'null source planted doc ' || i ||
                         ' the quick brown fox row scan merge value table' AS text,
                         CASE WHEN i % 2 = 0 THEN 'en' ELSE NULL END AS lang,
                         NULL AS source,
                         48 + i AS n_chars
                  FROM range({n_docs}) t(i)
                ) TO '{o}' (FORMAT PARQUET)
                """
            )
        elif name == "events.parquet":
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{s}')
                  UNION ALL
                  SELECT (SELECT max(event_id) FROM read_parquet('{s}')) + 1 + i AS event_id,
                         (SELECT min(ts) FROM read_parquet('{s}'))
                           + to_minutes(CAST(7 * i AS BIGINT)) AS ts,
                         NULL AS user_id,
                         CASE WHEN i % 4 = 0 THEN NULL ELSE 'click' END AS event_type,
                         0.5 + i AS value,
                         CASE WHEN i % 3 = 0 THEN NULL
                              ELSE '{{"k": ' || (i % 97) || '}}' END AS props
                  FROM range({n_events}) t(i)
                ) TO '{o}' (FORMAT PARQUET)
                """
            )
        else:
            shutil.copyfile(s, o)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.01_nulls"
    augment(src, out)
    print(f"augmented fixture written to {out}")


if __name__ == "__main__":
    main()
