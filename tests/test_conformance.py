"""Conformance checking against a hand-computed fixture (reference
analytics/conformance_checking.py semantics: DFG-replay fitness,
activity-set precision, 0.7/0.3 score, 0.8 conforming threshold)."""

from pyspark.sql import functions as F

from ocel_ocpn_lakehouse_spark.queries.conformance import (
    common_deviations,
    conformance_per_case,
    conformance_summary,
    dfg_model,
    case_transitions,
)


def _log(spark):
    rows = [
        # case A: x->y->z (fully conforming)
        ("A", "x", 1, 1), ("A", "y", 2, 2), ("A", "z", 3, 3),
        # case B: x->y->y (one bad transition y->y)
        ("B", "x", 1, 4), ("B", "y", 2, 5), ("B", "y", 3, 6),
        # case C: single event (fitness 1.0 by definition)
        ("C", "x", 1, 7),
    ]
    return spark.createDataFrame(
        rows, "user_id string, event_type string, ts_us long, event_id long"
    )


def _model(spark):
    return spark.createDataFrame([("x", "y"), ("y", "z")], "src string, dst string")


def test_conformance_per_case_fixture(spark):
    per = {
        r["case_id"]: r.asDict()
        for r in conformance_per_case(_log(spark), model=_model(spark)).collect()
    }
    assert per["A"]["fitness"] == 1.0 and per["A"]["conforming"] is True
    assert per["B"]["n_trans"] == 2 and per["B"]["allowed_trans"] == 1
    assert per["B"]["fitness"] == 0.5
    assert per["B"]["precision_score"] == 1.0  # acts {x,y} ⊆ model acts {x,y,z}
    assert abs(per["B"]["score"] - 0.65) < 1e-9 and per["B"]["conforming"] is False
    assert per["C"]["n_trans"] == 0 and per["C"]["fitness"] == 1.0
    assert per["C"]["conforming"] is True


def test_conformance_summary_and_deviations(spark):
    log, mdl = _log(spark), _model(spark)
    s = conformance_summary(conformance_per_case(log, model=mdl)).first().asDict()
    assert s["total_instances"] == 3 and s["conforming_instances"] == 2
    assert abs(s["avg_fitness"] - (1.0 + 0.5 + 1.0) / 3) < 1e-6

    dev = common_deviations(log, model=mdl).collect()
    assert [(d["src"], d["dst"], d["n"]) for d in dev] == [("y", "y", 1)]


def test_discovered_model_above_average_cut(spark):
    # edge (x,y) appears twice, (y,z) and (y,y) once each; avg = 4/3 →
    # only (x,y) survives the above-average cut
    trans = case_transitions(_log(spark))
    edges = {(r["src"], r["dst"]) for r in dfg_model(trans).collect()}
    assert edges == {("x", "y")}


def test_q36_matches_duckdb_oracle(spark):
    """Cross-engine check at sf0.001 (the driver runs the same at sf0.01)."""
    import duckdb

    from ocel_ocpn_lakehouse_spark.queries.conformance import Q36_SQL, q36_conformance

    sf = "/root/testdata/sf0.001"
    srows = sorted(
        (tuple(str(v) for k, v in sorted(r.asDict().items())))
        for r in q36_conformance(spark, sf).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    tbl = con.sql(Q36_SQL)
    cols = tbl.columns
    orows = sorted(
        tuple(str(v) for _, v in sorted(zip(cols, row)))
        for row in tbl.fetchall()
    )
    assert len(srows) == len(orows) > 0
    assert srows == orows
