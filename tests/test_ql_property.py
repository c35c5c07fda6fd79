"""Property-based QL compiler test: random condition dicts evaluated by the
Catalyst compilation must select exactly the rows a row-at-a-time reference
interpreter selects (the reference's own evaluation model,
queryset/lookup.py:39-224), including two-valued negation over missing
fields and numeric comparison on string-valued tags."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from docarray_spark.queryset import compile_filter

ROWS = [
    {"id": i, "txt": t, "num": n, "tags": tags}
    for i, (t, n, tags) in enumerate(
        [
            ("alpha", 1.5, {"x": "0.5", "y": "a"}),
            ("beta", -2.0, {"x": "1.5"}),
            ("", None, {}),
            (None, 7.25, {"y": "b", "x": "notnum"}),
            ("alpha beta", 0.0, {"x": "-3"}),
            ("gamma", 1.5, None),
        ]
    )
]


def _get(row, path):
    if path.startswith("tags__"):
        tags = row.get("tags") or {}
        return tags.get(path.split("__", 1)[1])
    return row.get(path)


def _leaf(row, path, op, val):
    """Reference-interpreter semantics: missing/None → False; numeric
    literal vs string field → numeric compare (unparseable → False)."""
    v = _get(row, path)
    if op == "$exists":
        present = v is not None and v != "" and v != {} and v != []
        return present if val else not present
    if v is None:
        return False
    if isinstance(val, (int, float)) and isinstance(v, str):
        try:
            v = float(v)
        except ValueError:
            return False
    if op == "$in":
        return any(
            (_num_eq(v, x) if isinstance(x, (int, float)) and isinstance(v, str) else v == x)
            for x in val
        )
    ops = {
        "$eq": lambda: v == val,
        "$neq": lambda: v != val,
        "$gt": lambda: v > val,
        "$gte": lambda: v >= val,
        "$lt": lambda: v < val,
        "$lte": lambda: v <= val,
    }
    try:
        return ops[op]()
    except TypeError:
        # mismatched types: never ordered, never equal, always not-equal
        return op == "$neq"


def _num_eq(s, x):
    try:
        return float(s) == x
    except ValueError:
        return False


def _eval(row, cond):
    out = True
    for k, spec in cond.items():
        if k == "$or":
            out = out and any(_eval(row, c) for c in spec)
        elif k == "$and":
            out = out and all(_eval(row, c) for c in spec)
        elif k == "$not":
            out = out and not _eval(row, spec)
        elif isinstance(spec, dict):
            out = out and all(_leaf(row, k, op, v) for op, v in spec.items())
        else:
            out = out and _leaf(row, k, "$eq", spec)
    return out


_FIELD = st.sampled_from(["txt", "num", "tags__x", "tags__y"])
_CMP = st.sampled_from(["$eq", "$neq", "$gt", "$gte", "$lt", "$lte"])
_VAL = st.one_of(
    st.sampled_from(["alpha", "beta", "a", "b", ""]),
    st.sampled_from([0.0, 0.5, 1.5, -2.0, 7.25, 2]),
)


def _leaves():
    return st.one_of(
        st.tuples(_FIELD, _CMP, _VAL).map(lambda t: {t[0]: {t[1]: t[2]}}),
        st.tuples(_FIELD, st.booleans()).map(lambda t: {t[0]: {"$exists": t[1]}}),
        st.tuples(_FIELD, st.lists(_VAL, min_size=1, max_size=3, unique=True)).map(
            lambda t: {t[0]: {"$in": t[1]}}
        ),
    )


_COND = st.recursive(
    _leaves(),
    lambda children: st.one_of(
        st.lists(children, min_size=1, max_size=3).map(lambda cs: {"$or": cs}),
        st.lists(children, min_size=1, max_size=3).map(lambda cs: {"$and": cs}),
        children.map(lambda c: {"$not": c}),
    ),
    max_leaves=6,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(r["id"], r["txt"], r["num"], r["tags"]) for r in ROWS],
        "id int, txt string, num double, tags map<string,string>",
    ).cache()


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(cond=_COND)
def test_ql_matches_reference_interpreter(df, cond):
    got = {r["id"] for r in df.filter(compile_filter(df, cond)).select("id").collect()}
    want = {r["id"] for r in ROWS if _eval(r, cond)}
    assert got == want, cond
