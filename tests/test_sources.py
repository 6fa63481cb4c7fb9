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
