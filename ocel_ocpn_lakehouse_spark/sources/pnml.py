"""S6 — PNML/OCPN source, sink, and DFG-based net discovery.

Reference parity:
  - ingest/discover_and_store_ocpn.py:36-59 parses PNML XML into
    places/transitions/arcs row lists (driver Python; its parser binds the
    pnml.org-2009 namespace and therefore finds nothing in the repo's own
    un-namespaced ingest/simple_test.pnml — this parser strips namespaces
    so both dialects load).
  - ingest/simple_ocpn_generator.py:161-270 discovers a net from OCEL
    events with per-instance driver loops (defaultdict sequences, sorted()
    per instance, pairwise DFG counting). Here the discovery is Catalyst
    plans end-to-end: a lead() window per case builds transitions, one
    groupBy builds the edge/activity/start/end frequencies, and the net's
    arc table is a union of four selects — no per-case Python, no
    collect() of event rows.
  - ingest/discover_and_store_ocpn.py:93-111 stages parquet next to the
    Iceberg table and prints "Next step: integrate with Iceberg commits";
    ``store_ocpn`` finishes that step against this engine's catalog with
    real atomic append commits.

Scale shape: event-scale work (the windows and groupBys) is one shuffle
on the case key + tiny aggregates; the materialized net is metadata-sized
(O(|activities| + |edges|) rows), so parsing/serializing PNML on the
driver is correct by the same rule the manifest layer uses.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_SRC = "__SOURCE__"
_SNK = "__SINK__"


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _label_of(el) -> str | None:
    for sub in el.iter():
        if _strip_ns(sub.tag) == "text" and sub.text is not None:
            return sub.text
    return None


def parse_pnml(xml_text: str, model_id: str) -> dict[str, list[dict]]:
    """PNML XML → {'places': [...], 'transitions': [...], 'arcs': [...]}.

    Namespace-agnostic (accepts pnml.org-2009 and bare tags). Arc
    src/dst types are resolved against the parsed node ids instead of the
    reference's 'unknown' placeholder."""
    root = ET.fromstring(xml_text)
    places, transitions, arcs = [], [], []
    for el in root.iter():
        tag = _strip_ns(el.tag)
        if tag == "place":
            places.append(
                {
                    "model_id": model_id,
                    "place_id": el.attrib.get("id"),
                    "label": _label_of(el),
                }
            )
        elif tag == "transition":
            transitions.append(
                {
                    "model_id": model_id,
                    "transition_id": el.attrib.get("id"),
                    "label": _label_of(el),
                    "invisible": False,
                }
            )
        elif tag == "arc":
            arcs.append(
                {
                    "model_id": model_id,
                    "arc_id": el.attrib.get("id"),
                    "src_id": el.attrib.get("source"),
                    "dst_id": el.attrib.get("target"),
                    "weight": int(_label_of(el) or 1),
                }
            )
    place_ids = {p["place_id"] for p in places}
    for a in arcs:
        a["src_type"] = "place" if a["src_id"] in place_ids else "transition"
        a["dst_type"] = "place" if a["dst_id"] in place_ids else "transition"
    return {"places": places, "transitions": transitions, "arcs": arcs}


_PLACE_SCHEMA = "model_id string, place_id string, label string"
_TRANS_SCHEMA = "model_id string, transition_id string, label string, invisible boolean"
_ARC_SCHEMA = (
    "model_id string, arc_id string, src_type string, src_id string, "
    "dst_type string, dst_id string, weight long"
)


def load_pnml(spark: SparkSession, path: str, model_id: str) -> dict[str, DataFrame]:
    """PNML file → the reference's relational OCPN decomposition."""
    with open(path, encoding="utf-8") as f:
        parsed = parse_pnml(f.read(), model_id)
    return {
        "places": spark.createDataFrame(parsed["places"], _PLACE_SCHEMA),
        "transitions": spark.createDataFrame(parsed["transitions"], _TRANS_SCHEMA),
        "arcs": spark.createDataFrame(
            [
                {k: a.get(k) for k in
                 ("model_id", "arc_id", "src_type", "src_id", "dst_type", "dst_id", "weight")}
                for a in parsed["arcs"]
            ],
            _ARC_SCHEMA,
        ),
    }


def to_pnml(places: DataFrame, transitions: DataFrame, arcs: DataFrame) -> str:
    """Net tables → PNML XML (sink). The net is metadata-sized."""
    p_rows = sorted(places.collect(), key=lambda r: r["place_id"])
    t_rows = sorted(transitions.collect(), key=lambda r: r["transition_id"])
    a_rows = sorted(arcs.collect(), key=lambda r: r["arc_id"])
    out = ['<?xml version="1.0" encoding="UTF-8"?>', "<pnml>", '  <net id="net1">']
    for r in p_rows:
        out.append(f'    <place id="{escape(r["place_id"])}">')
        if r["label"]:
            out.append(f"      <name><text>{escape(r['label'])}</text></name>")
        out.append("    </place>")
    for r in t_rows:
        out.append(f'    <transition id="{escape(r["transition_id"])}">')
        if r["label"]:
            out.append(f"      <name><text>{escape(r['label'])}</text></name>")
        out.append("    </transition>")
    for r in a_rows:
        out.append(
            f'    <arc id="{escape(r["arc_id"])}" source="{escape(r["src_id"])}" '
            f'target="{escape(r["dst_id"])}">'
        )
        out.append(f"      <inscription><text>{r['weight']}</text></inscription>")
        out.append("    </arc>")
    out += ["  </net>", "</pnml>", ""]
    return "\n".join(out)


def discover_ocpn(
    events: DataFrame,
    model_id: str = "ocpn_discovered",
    case_col: str = "user_id",
    act_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts_us", "event_id"),
) -> dict[str, DataFrame]:
    """DFG-discovery of a Petri net from an event log, as Catalyst plans.

    Standard DFG→net mapping (reference simple_ocpn_generator.py
    _simple_dfg_discovery, minus the driver loops):
      transition per activity (with frequency),
      place per DFG edge ``p_<src>__<dst>`` carrying the edge flow,
      a global source/sink place wired to each case's start/end activity,
      arc weights = observed frequencies.
    Deterministic given the event log; every output is a DataFrame."""
    mid = F.lit(model_id)
    w = Window.partitionBy(case_col).orderBy(*order_cols)
    seq = events.select(
        F.col(case_col).alias("case_id"),
        F.col(act_col).alias("act"),
        F.lead(act_col).over(w).alias("next_act"),
        F.row_number().over(w).alias("rn"),
        F.row_number()
        .over(Window.partitionBy(case_col).orderBy(*[F.desc(c) for c in order_cols]))
        .alias("rn_desc"),
    )

    transitions = (
        events.groupBy(F.col(act_col).alias("act"))
        .agg(F.count("*").alias("frequency"))
        .select(
            mid.alias("model_id"),
            F.concat(F.lit("t_"), "act").alias("transition_id"),
            F.col("act").alias("label"),
            F.lit(False).alias("invisible"),
            "frequency",
        )
    )

    edges = (
        seq.filter(F.col("next_act").isNotNull())
        .groupBy(F.col("act").alias("src"), F.col("next_act").alias("dst"))
        .agg(F.count("*").alias("freq"))
    )
    edge_place = F.concat(F.lit("p_"), "src", F.lit("__"), "dst")
    starts = seq.filter(F.col("rn") == 1).groupBy("act").agg(F.count("*").alias("freq"))
    ends = seq.filter(F.col("rn_desc") == 1).groupBy("act").agg(F.count("*").alias("freq"))

    places = (
        edges.select(mid.alias("model_id"), edge_place.alias("place_id"),
                     edge_place.alias("label"))
        .unionByName(
            events.sparkSession.createDataFrame(
                [(model_id, _SRC, "source"), (model_id, _SNK, "sink")],
                _PLACE_SCHEMA,
            )
        )
    )

    arcs = (
        edges.select(
            F.concat(F.lit("a_in_"), "src", F.lit("__"), "dst").alias("arc_id"),
            F.lit("transition").alias("src_type"),
            F.concat(F.lit("t_"), "src").alias("src_id"),
            F.lit("place").alias("dst_type"),
            edge_place.alias("dst_id"),
            F.col("freq").alias("weight"),
        )
        .unionByName(
            edges.select(
                F.concat(F.lit("a_out_"), "src", F.lit("__"), "dst").alias("arc_id"),
                F.lit("place").alias("src_type"),
                edge_place.alias("src_id"),
                F.lit("transition").alias("dst_type"),
                F.concat(F.lit("t_"), "dst").alias("dst_id"),
                F.col("freq").alias("weight"),
            )
        )
        .unionByName(
            starts.select(
                F.concat(F.lit("a_src_"), "act").alias("arc_id"),
                F.lit("place").alias("src_type"),
                F.lit(_SRC).alias("src_id"),
                F.lit("transition").alias("dst_type"),
                F.concat(F.lit("t_"), "act").alias("dst_id"),
                F.col("freq").alias("weight"),
            )
        )
        .unionByName(
            ends.select(
                F.concat(F.lit("a_snk_"), "act").alias("arc_id"),
                F.lit("transition").alias("src_type"),
                F.concat(F.lit("t_"), "act").alias("src_id"),
                F.lit("place").alias("dst_type"),
                F.lit(_SNK).alias("dst_id"),
                F.col("freq").alias("weight"),
            )
        )
        .select(
            mid.alias("model_id"), "arc_id", "src_type", "src_id",
            "dst_type", "dst_id", F.col("weight").cast("long"),
        )
    )
    return {"places": places, "transitions": transitions, "arcs": arcs}


def store_ocpn(
    catalog,
    spark: SparkSession,
    nets: dict[str, DataFrame],
    model_id: str,
    model_name: str,
    namespace: str = "ocpn",
) -> dict[str, int]:
    """Commit discovered/parsed net tables to the warehouse atomically.

    Creates ``<ns>.models/places/transitions/arcs`` on first use, then
    appends — the atomic-commit step the reference's staged-parquet
    writer leaves as future work (discover_and_store_ocpn.py:111)."""
    models = spark.createDataFrame(
        [(model_id, 1, model_name, "PNML")],
        "model_id string, version int, name string, source_format string",
    )
    written = {}
    for name, df in {"models": models, **nets}.items():
        ident = f"{namespace}.{name}"
        if not catalog.table_exists(ident):
            t = catalog.create_table(ident, df.schema)
        else:
            t = catalog.load_table(ident)
        t.append(df, num_files=1)
        written[name] = df.count()
    return written
