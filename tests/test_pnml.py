"""S6 PNML source/sink + OCPN DFG discovery + catalog storage."""

from __future__ import annotations

import pytest

from ocel_ocpn_lakehouse_spark.core.catalog import Catalog
from ocel_ocpn_lakehouse_spark.sources.pnml import (
    discover_ocpn,
    load_pnml,
    parse_pnml,
    store_ocpn,
    to_pnml,
)

BARE_PNML = """<?xml version="1.0" encoding="UTF-8"?>
<pnml>
  <net id="net1">
    <place id="p1"><name><text>Start</text></name></place>
    <place id="p2"><name><text>End</text></name></place>
    <transition id="t1"><name><text>Process</text></name></transition>
    <arc id="a1" source="p1" target="t1"><inscription><text>1</text></inscription></arc>
    <arc id="a2" source="t1" target="p2"><inscription><text>2</text></inscription></arc>
  </net>
</pnml>
"""

NS_PNML = BARE_PNML.replace(
    "<pnml>", '<pnml xmlns="http://www.pnml.org/version-2009/grammar/pnml">'
)


@pytest.mark.parametrize("xml", [BARE_PNML, NS_PNML], ids=["bare", "namespaced"])
def test_parse_pnml_both_dialects(xml):
    # the reference's parser binds the namespace and finds nothing in its
    # own un-namespaced fixture; ours must load both dialects identically
    parsed = parse_pnml(xml, "m1")
    assert [p["place_id"] for p in parsed["places"]] == ["p1", "p2"]
    assert [t["transition_id"] for t in parsed["transitions"]] == ["t1"]
    arcs = {a["arc_id"]: a for a in parsed["arcs"]}
    assert arcs["a1"]["src_type"] == "place" and arcs["a1"]["dst_type"] == "transition"
    assert arcs["a2"]["src_type"] == "transition" and arcs["a2"]["dst_id"] == "p2"
    assert arcs["a2"]["weight"] == 2


def test_pnml_roundtrip(spark, tmp_path):
    p = tmp_path / "net.pnml"
    p.write_text(BARE_PNML)
    dfs = load_pnml(spark, str(p), "m1")
    xml2 = to_pnml(dfs["places"], dfs["transitions"], dfs["arcs"])
    again = parse_pnml(xml2, "m1")
    assert {a["arc_id"]: (a["src_id"], a["dst_id"], a["weight"]) for a in again["arcs"]} == {
        "a1": ("p1", "t1", 1),
        "a2": ("t1", "p2", 2),
    }


def _tiny_log(spark):
    # two cases: A->B->C and A->C
    rows = [
        ("c1", "A", 1, "e1"), ("c1", "B", 2, "e2"), ("c1", "C", 3, "e3"),
        ("c2", "A", 1, "e4"), ("c2", "C", 2, "e5"),
    ]
    return spark.createDataFrame(
        rows, "user_id string, event_type string, ts_us long, event_id string"
    )


def test_discover_ocpn_dfg_net(spark):
    nets = discover_ocpn(_tiny_log(spark), model_id="m")
    trans = {r["transition_id"]: r["frequency"] for r in nets["transitions"].collect()}
    assert trans == {"t_A": 2, "t_B": 1, "t_C": 2}
    arcs = {r["arc_id"]: r["weight"] for r in nets["arcs"].collect()}
    assert arcs["a_in_A__B"] == 1 and arcs["a_out_A__B"] == 1
    assert arcs["a_in_A__C"] == 1  # the c2 direct path
    assert arcs["a_in_B__C"] == 1
    assert arcs["a_src_A"] == 2  # both cases start with A
    assert arcs["a_snk_C"] == 2  # both cases end with C
    places = {r["place_id"] for r in nets["places"].collect()}
    assert {"p_A__B", "p_B__C", "p_A__C", "__SOURCE__", "__SINK__"} <= places
    # flow conservation: every edge place has exactly one in- and one out-arc
    a = nets["arcs"].collect()
    for pl in places - {"__SOURCE__", "__SINK__"}:
        assert sum(1 for r in a if r["dst_id"] == pl) == 1
        assert sum(1 for r in a if r["src_id"] == pl) == 1


def test_store_ocpn_catalog_roundtrip(spark, warehouse):
    cat = Catalog(warehouse)
    nets = discover_ocpn(_tiny_log(spark), model_id="m")
    written = store_ocpn(cat, spark, nets, "m", "tiny", namespace="ocpn")
    assert written["arcs"] == nets["arcs"].count()
    back = cat.load_table("ocpn.arcs").scan(spark)
    assert back.count() == written["arcs"]
    assert {r["arc_id"] for r in back.collect()} == {
        r["arc_id"] for r in nets["arcs"].collect()
    }
    # second model appends, first survives
    store_ocpn(cat, spark, discover_ocpn(_tiny_log(spark), model_id="m2"), "m2", "tiny2")
    back2 = cat.load_table("ocpn.arcs").scan(spark)
    assert back2.filter("model_id = 'm'").count() == written["arcs"]
    assert back2.filter("model_id = 'm2'").count() == written["arcs"]
