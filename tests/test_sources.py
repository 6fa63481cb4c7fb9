"""Parser tests for the .poly and .osc sources (error guards, holes,
timestamps, member roles). Driver-gate parity for the derived queries runs
in test_entry_oracle.py."""

import pytest

from osmquadtree_spark.sources import osc as osc_src
from osmquadtree_spark.sources import poly as poly_src


def test_poly_roundtrip_and_holes():
    ring = [(-400000000, 0), (0, 350000000), (400000000, 0)]
    hole = [(-100000000, 0), (0, 100000000), (100000000, 0)]
    text = poly_src.write_poly("test", [("area_1", ring), ("!hole_1", hole)])
    secs = poly_src.parse_poly(text)
    assert secs == [("area_1", ring), ("!hole_1", hole)]
    assert poly_src.outer_ring(text) == ring  # holes excluded


def test_poly_guards():
    with pytest.raises(ValueError, match="not finished"):
        poly_src.parse_poly("name\narea\n 1.0 2.0\nEND\n")  # missing final END
    two = poly_src.write_poly("x", [("a", [(0, 0)]), ("b", [(1, 1)])])
    with pytest.raises(ValueError, match="multiple rings"):
        poly_src.outer_ring(two)


OSC = """<osmChange version="0.6">
<create>
  <node id="10" lon="1.5000000" lat="-2.0000001" version="1" timestamp="2020-01-02T03:04:05">
    <tag k="amenity" v="bench"/>
  </node>
  <relation id="30" version="2" timestamp="2020-01-02T03-04-05">
    <member type="way" ref="7" role="outer"/>
    <member type="node" ref="8" role=""/>
  </relation>
</create>
<modify>
  <way id="20" version="3" timestamp="2020-01-02T03:04:05">
    <nd ref="1"/><nd ref="2"/><tag k="highway" v="track"/>
  </way>
</modify>
<delete><node id="11" version="4" timestamp="2020-01-02T03:04:05"/></delete>
</osmChange>"""


def test_osc_parse():
    nodes, ways, rels = osc_src.parse_osc(OSC)
    n = {r[0]: r for r in nodes}
    assert n[10][1] == 15000000 and n[10][2] == -20000001  # fixed-point coords
    assert n[10][5] == 5 and n[10][6] == [("amenity", "bench")]
    assert n[11][5] == 1 and n[11][1] == 0  # delete: ct 1, absent coords → 0
    assert ways[0][:3] == (20, [1, 2], 3)
    assert ways[0][4] == 4  # modify
    assert ways[0][5] == [("highway", "track")]
    # both reference timestamp formats parse to the same epoch
    assert rels[0][3] == nodes[0][4] == 1577934245
    assert rels[0][1] == [(1, 7, "outer"), (0, 8, "")]
    assert rels[0][4] == 5


def test_osc_rejects_non_osc():
    with pytest.raises(ValueError, match="osmChange"):
        osc_src.parse_osc("<osm></osm>")


def test_filelist_catalog(tmp_path, spark):
    import json
    import pandas as pd

    from osmquadtree_spark.operators.changes import apply_changes
    from osmquadtree_spark.sources.filelist import catalog_tables, read_filenames, write_filelist

    prfx = str(tmp_path)
    main = pd.DataFrame({"key": [1, 2, 3], "payload": [1.0, 2.0, 3.0], "changetype": [0, 0, 0]})
    d1 = pd.DataFrame({"key": [2], "payload": [20.0], "changetype": [4]})
    d2 = pd.DataFrame({"key": [3], "payload": [0.0], "changetype": [1]})
    for name, df in (("main.parquet", main), ("d1.parquet", d1), ("d2.parquet", d2)):
        spark.createDataFrame(df).coalesce(1).write.mode("overwrite").parquet(f"{prfx}/{name}")
    write_filelist(prfx, [
        {"Filename": "main.parquet", "EndDate": "2020-01-01T00:00:00", "NumTiles": 3, "State": 1},
        {"Filename": "d1.parquet", "EndDate": "2020-01-02T00:00:00", "NumTiles": 1, "State": 2},
        {"Filename": "d2.parquet", "EndDate": "2020-01-03T00:00:00", "NumTiles": 1, "State": 3},
    ])

    files, last = read_filenames(prfx)
    assert len(files) == 3 and last == 1577836800 + 86400 * 2

    # enddate filter skips strictly newer entries (readblockscaller.cpp:66-69)
    files2, _ = read_filenames(prfx, enddate=1577836800 + 86400)
    assert len(files2) == 2

    m, changes, _ = catalog_tables(spark, prfx)
    out = {r.key: r.payload for r in apply_changes(m, changes, ["key"]).collect()}
    assert out == {1: 1.0, 2: 20.0}  # key 3 deleted by the newest diff


def test_filelist_bad_date(tmp_path):
    from osmquadtree_spark.sources.filelist import read_filenames, write_filelist

    write_filelist(str(tmp_path), [{"Filename": "x", "EndDate": "garbage"}])
    with pytest.raises(ValueError, match="can't parse"):
        read_filenames(str(tmp_path))
