"""filelist.json catalog source — the reference's snapshot+diff file
catalog (/root/reference/src/pbfformat/readblockscaller.cpp:38-82,
python/oqt/update/misc.py:190-205): a JSON array of
``{"Filename", "EndDate", "NumTiles", "State"}`` entries, filtered by an
optional end date (entries strictly newer are skipped) and consumed oldest
to newest with latest-wins merge semantics (operators/changes.py).

In the Spark engine the catalog is driver-side metadata: ``read_filenames``
resolves the file set exactly like the reference, and ``catalog_tables``
turns it into the (main, changes) DataFrame inputs of ``apply_changes`` —
Iceberg's snapshot log plays this role in production, but the JSON catalog
keeps drop-in compatibility with existing reference deployments."""

from __future__ import annotations

import calendar
import json
import os
import time


def read_date(s: str) -> int:
    """The reference's read_date (utils/date.cpp): both timestamp formats."""
    for fmt in ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%dT%H-%M-%S", "%Y-%m-%d"):
        try:
            return calendar.timegm(time.strptime(s[:19], fmt))
        except ValueError:
            continue
    return 0


def read_filenames(prfx: str, enddate: int = 0) -> tuple[list[str], int]:
    """→ (file paths oldest→newest, last end date) with the reference's
    skip-newer-than-enddate rule; unparsable dates are a hard error."""
    with open(os.path.join(prfx, "filelist.json")) as f:
        entries = json.load(f)
    if not isinstance(entries, list):
        raise ValueError("not an array")
    result: list[str] = []
    last_date = 0
    for e in entries:
        d = read_date(e["EndDate"])
        if d == 0:
            raise ValueError(f"can't parse {e['EndDate']!r}")
        if enddate > 0 and d > enddate:
            continue
        if d > last_date:
            last_date = d
        result.append(os.path.join(prfx, e["Filename"]))
    return result, last_date


def write_filelist(prfx: str, entries: list[dict]) -> None:
    with open(os.path.join(prfx, "filelist.json"), "w") as f:
        json.dump(entries, f)


def catalog_tables(spark, prfx: str, enddate: int = 0):
    """Resolve the catalog and load (main, [changes...]) parquet frames —
    file 0 is the snapshot, the rest are diffs newest-last, ready for
    ``operators.changes.apply_changes``."""
    files, last = read_filenames(prfx, enddate)
    if not files:
        raise ValueError("empty catalog")
    frames = [spark.read.parquet(f) for f in files]
    return frames[0], frames[1:], last
