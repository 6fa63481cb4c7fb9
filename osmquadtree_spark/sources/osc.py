"""OsmChange (.osc) XML source → typed change DataFrames.

Reference parser: /root/reference/src/update/xmlchange.cpp (362 LoC
xmlinspector walk) and python/oqt/update/xmlchange.py. The top-level
<create>/<modify>/<delete> blocks map to changetype Create(5)/Modify(4)/
Delete(1) — the same enum the merge operators consume
(operators/changes.py).

Small diffs (daily replication is ~tens of MB) parse on the driver and
parallelize; for bulk historic loads the same `parse_osc` runs inside
mapInPandas over a binaryFile stream of .osc blobs — both paths share this
parser.
"""

from __future__ import annotations

import calendar
import time
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

CHANGETYPE = {"create": 5, "modify": 4, "delete": 1}

# file_pos: the element's 0-based position in DOCUMENT order — the
# reference applies change rows in file order with last-wins
# (combineblocks.cpp merges newest-last), so the merge tiebreak within one
# file is this position, not the changetype (operators/changes.py)
NODE_SCHEMA = (
    "node_id bigint, lon bigint, lat bigint, version int, timestamp bigint, "
    "changetype int, tags array<struct<key:string,val:string>>, file_pos bigint"
)
WAY_SCHEMA = (
    "way_id bigint, refs array<bigint>, version int, timestamp bigint, "
    "changetype int, tags array<struct<key:string,val:string>>, file_pos bigint"
)
REL_SCHEMA = (
    "rel_id bigint, members array<struct<m_type:int,m_ref:bigint,role:string>>, "
    "version int, timestamp bigint, changetype int, tags array<struct<key:string,val:string>>, file_pos bigint"
)

_MEMBER_TYPE = {"node": 0, "way": 1, "relation": 2}


def _ts(v: str | None) -> int:
    if not v:
        return 0
    # both reference formats (xmlchange.py:26-37)
    for fmt in ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%dT%H-%M-%S"):
        try:
            return calendar.timegm(time.strptime(v[:19], fmt))
        except ValueError:
            continue
    raise ValueError(f"bad timestamp {v!r}")


def _coord(v: str | None) -> int:
    if v is None:
        return 0
    x = float(v) * 10000000.0
    return int(x + 0.5) if x >= 0 else int(x - 0.5)


def _tags(el) -> list[tuple[str, str]]:
    return [(t.get("k"), t.get("v")) for t in el.findall("tag")]


def parse_osc(text: str):
    """→ (nodes, ways, relations) row lists matching the *_SCHEMA strings."""
    root = ET.fromstring(text)
    if root.tag != "osmChange":
        raise ValueError("not an osmChange document")
    nodes, ways, rels = [], [], []
    pos = 0
    for block in root:
        ct = CHANGETYPE.get(block.tag)
        if ct is None:
            continue
        for el in block:
            eid = int(el.get("id"))
            version = int(el.get("version", "0"))
            ts = _ts(el.get("timestamp"))
            tags = _tags(el)
            if el.tag == "node":
                nodes.append((eid, _coord(el.get("lon")), _coord(el.get("lat")), version, ts, ct, tags, pos))
            elif el.tag == "way":
                refs = [int(nd.get("ref")) for nd in el.findall("nd")]
                ways.append((eid, refs, version, ts, ct, tags, pos))
            elif el.tag == "relation":
                members = [
                    (_MEMBER_TYPE[m.get("type")], int(m.get("ref")), m.get("role", ""))
                    for m in el.findall("member")
                ]
                rels.append((eid, members, version, ts, ct, tags, pos))
            pos += 1
    return nodes, ways, rels


def osc_dataframes(
    spark: SparkSession, text: str
) -> dict[str, DataFrame]:
    nodes, ways, rels = parse_osc(text)
    return {
        "nodes": spark.createDataFrame(nodes, NODE_SCHEMA),
        "ways": spark.createDataFrame(ways, WAY_SCHEMA),
        "relations": spark.createDataFrame(rels, REL_SCHEMA),
    }
