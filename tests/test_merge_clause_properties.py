"""Property model for the full MERGE clause surface
(operators/versioned.py::merge): random ordered-conditional clause
lists over random null-bearing target/source states must equal an
independent Python relational model, including under an injected
commit race (a writer landing an append at exactly the claim boundary,
forcing the merge to rebase and re-resolve its clauses against the
raced head).

The documented clause-resolution model the engine and this file both
implement:

1. Rows present on BOTH sides evaluate the ``matched`` clauses IN
   ORDER; the FIRST clause whose condition is exactly TRUE applies
   (update = assignments over (t, s), or whole-row-replace-from-source
   when assignments are None; delete = drop). A condition evaluating
   NULL does NOT fire its clause (SQL 3VL). No clause firing = row
   kept unchanged.
2. TARGET-only rows evaluate ``not_matched_by_source`` the same way
   (expressions may reference only ``t.``); no clause = kept.
3. SOURCE-only rows evaluate ``not_matched`` (insert) the same way
   (expressions may reference only ``s.``); assignments of None =
   INSERT * (full source row); an explicit dict null-fills omitted
   columns. No clause = row dropped (not inserted).

Conditions and assignment expressions are drawn from fixed pools with
hand-written Python twins (None-propagating, mirroring SQL NULL
semantics), so the model shares no SQL machinery with the engine."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from modular_etl_data_platform_spark.operators.versioned import (
    ConditionalPutLogStore,
    VersionedTable,
)

# ---------------------------------------------------------------------------
# expression pools: SQL string + independent Python twin
# ---------------------------------------------------------------------------


def _null3(f):
    """Wrap a comparator: None operands -> None (SQL 3VL UNKNOWN)."""

    def g(*vals):
        if any(v is None for v in vals):
            return None
        return f(*vals)

    return g


# matched-clause conditions: see both t and s
MATCHED_CONDS = [
    (None, lambda t, s: True),
    ("s.qty > t.qty", lambda t, s: _null3(lambda a, b: a > b)(s["qty"], t["qty"])),
    ("t.qty >= 20", lambda t, s: _null3(lambda a: a >= 20)(t["qty"])),
    ("t.v IS NULL", lambda t, s: t["v"] is None),
    ("s.v = 'x'", lambda t, s: _null3(lambda a: a == "x")(s["v"])),
]
# not-matched-by-source conditions: t only
NMS_CONDS = [
    (None, lambda t, s: True),
    ("t.qty >= 20", lambda t, s: _null3(lambda a: a >= 20)(t["qty"])),
    ("t.v IS NULL", lambda t, s: t["v"] is None),
]
# not-matched (insert) conditions: s only
INSERT_CONDS = [
    (None, lambda t, s: True),
    ("s.qty > 15", lambda t, s: _null3(lambda a: a > 15)(s["qty"])),
    ("s.v = 'x'", lambda t, s: _null3(lambda a: a == "x")(s["v"])),
]

# matched-clause update assignments (t and s in scope)
MATCHED_ASSIGNS = [
    (None, None),  # UPDATE SET * (whole row from source)
    (
        {"qty": "s.qty + t.qty"},
        {"qty": lambda t, s: _null3(lambda a, b: a + b)(s["qty"], t["qty"])},
    ),
    (
        {"v": "upper(s.v)"},
        {"v": lambda t, s: None if s["v"] is None else s["v"].upper()},
    ),
]
# not-matched-by-source update assignments (t only)
NMS_ASSIGNS = [
    (
        {"qty": "t.qty + 1"},
        {"qty": lambda t, s: _null3(lambda a: a + 1)(t["qty"])},
    ),
    ({"v": "'gone'"}, {"v": lambda t, s: "gone"}),
]
# insert assignments (s only)
INSERT_ASSIGNS = [
    (None, None),  # INSERT *
    (
        {"id": "s.id", "qty": "s.qty"},
        {"id": lambda t, s: s["id"], "qty": lambda t, s: s["qty"]},
    ),
]

COLS = ("id", "v", "qty")


def _model_row(t, s, assigns, side):
    """Apply one update/insert clause's assignments in the model."""
    if side == "update":
        if assigns is None:  # UPDATE SET *: whole row from source
            return dict(s)
        row = dict(t)
    else:  # insert
        if assigns is None:
            return dict(s)
        row = {c: None for c in COLS}
    for col, fn in assigns.items():
        row[col] = fn(t, s)
    return row


def _first_fire(clauses, t, s):
    for act, _sql_a, assigns, _sql_c, cond in clauses:
        if cond(t, s) is True:
            return act, assigns
    return None, None


def model_merge(target, source, matched, not_matched, nms):
    """The documented clause-resolution model, in plain Python."""
    out = []
    for tid, t in target.items():
        s = source.get(tid)
        if s is not None:
            act, assigns = _first_fire(matched, t, s)
            if act == "delete":
                continue
            if act == "update":
                out.append(_model_row(t, s, assigns, "update"))
            else:
                out.append(dict(t))
        else:
            act, assigns = _first_fire(nms, t, None)
            if act == "delete":
                continue
            if act == "update":
                out.append(_model_row(t, None, assigns, "update"))
            else:
                out.append(dict(t))
    for sid, s in source.items():
        if sid in target:
            continue
        act, assigns = _first_fire(not_matched, None, s)
        if act == "insert":
            out.append(_model_row(None, s, assigns, "insert"))
    return {tuple(r[c] for c in COLS) for r in out}


# ---------------------------------------------------------------------------
# strategies
# ---------------------------------------------------------------------------

_val_v = st.sampled_from(["a", "b", "x", None])
_val_qty = st.sampled_from([5, 10, 20, 30, None])
_rows = st.dictionaries(
    st.integers(min_value=0, max_value=9),
    st.tuples(_val_v, _val_qty),
    min_size=0,
    max_size=6,
)


def _clause(actions, conds, assigns_pool):
    def build(draw_action, cond_ix, assign_ix):
        sql_c, fn_c = conds[cond_ix]
        if draw_action == "delete":
            return ("delete", None, None, sql_c, fn_c)
        sql_a, fn_a = assigns_pool[assign_ix]
        return (draw_action, sql_a, fn_a, sql_c, fn_c)

    return st.builds(
        build,
        st.sampled_from(actions),
        st.integers(0, len(conds) - 1),
        st.integers(0, len(assigns_pool) - 1),
    )


_matched = st.lists(
    _clause(["update", "delete"], MATCHED_CONDS, MATCHED_ASSIGNS),
    min_size=0,
    max_size=3,
)
_nms = st.lists(
    _clause(["update", "delete"], NMS_CONDS, NMS_ASSIGNS),
    min_size=0,
    max_size=2,
)
_not_matched = st.lists(
    _clause(["insert"], INSERT_CONDS, INSERT_ASSIGNS),
    min_size=0,
    max_size=2,
)


def _df(spark, rows: dict):
    data = [(i, v, q) for i, (v, q) in sorted(rows.items())]
    return spark.createDataFrame(data, "id long, v string, qty long")


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,  # deterministic seeds: CI failures reproduce
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    target=_rows,
    source=_rows,
    matched=_matched,
    not_matched=_not_matched,
    nms=_nms,
    race=st.booleans(),
    raced_rows=_rows,
)
def test_merge_clauses_match_relational_model(
    spark, tmp_path_factory, target, source, matched, not_matched, nms, race, raced_rows
):
    if not (matched or not_matched or nms):
        matched = [("update", None, None, None, lambda t, s: True)]
        not_matched = [("insert", None, None, None, lambda t, s: True)]
    if not target:
        target = {0: ("a", 10)}  # merge needs an existing table

    path = str(tmp_path_factory.mktemp("merge_prop") / "t")
    store = ConditionalPutLogStore()
    vt = VersionedTable(spark, path, stats_columns=["id"], log_store=store)
    tgt_rows = {i: {"id": i, "v": v, "qty": q} for i, (v, q) in target.items()}
    src_rows = {i: {"id": i, "v": v, "qty": q} for i, (v, q) in source.items()}
    vt.write(_df(spark, target).coalesce(1))

    if race:
        # a racing writer lands an APPEND of fresh ids at exactly the
        # merge's claim boundary; the merge must rebase and re-resolve
        # its clauses against the raced head (raced rows are TARGET
        # rows: matched / not-matched-by-source clauses apply to them)
        raced = {i + 100: r for i, r in raced_rows.items()} or {
            100: ("b", 5)
        }
        racer = VersionedTable(spark, path, log_store=store)
        rdf = _df(spark, raced).coalesce(1)

        def racing_commit():
            racer.write(rdf, mode="append")

        store.inject(racing_commit)
        for i, (v, q) in raced.items():
            tgt_rows[i] = {"id": i, "v": v, "qty": q}

    vt.merge(
        _df(spark, source),
        on=["id"],
        matched=[(a, sa, sc) for a, sa, _fa, sc, _fc in matched] or None,
        not_matched=[(a, sa, sc) for a, sa, _fa, sc, _fc in not_matched]
        or None,
        not_matched_by_source=[(a, sa, sc) for a, sa, _fa, sc, _fc in nms]
        or None,
    )
    got = {tuple(r) for r in vt.read().select(*COLS).collect()}
    want = model_merge(
        tgt_rows,
        src_rows,
        [(a, sa, fa, sc, fc) for a, sa, fa, sc, fc in matched],
        [(a, sa, fa, sc, fc) for a, sa, fa, sc, fc in not_matched],
        [(a, sa, fa, sc, fc) for a, sa, fa, sc, fc in nms],
    )
    assert got == want, (
        f"target={target} source={source} race={race}\n"
        f"matched={[(a, sa, sc) for a, sa, _f, sc, _c in matched]}\n"
        f"not_matched={[(a, sa, sc) for a, sa, _f, sc, _c in not_matched]}\n"
        f"nms={[(a, sa, sc) for a, sa, _f, sc, _c in nms]}\n"
        f"got - want: {got - want}\nwant - got: {want - got}"
    )
