"""Property tests for the as-of join family: random keyed event sets vs a
sequential pure-Python reference, across every direction/strict combo and
the skew-resistant bucketed variant (operators/joins.py)."""

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_cruncher_spark.operators.joins import asof_join, asof_join_bucketed  # noqa: E402

KEYS = ["a", "b", "hot"]

left_rows = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.integers(min_value=0, max_value=50),
    ),
    min_size=1,
    max_size=25,
)
right_rows = st.lists(
    st.tuples(
        st.sampled_from(KEYS + ["only_right"]),
        st.integers(min_value=0, max_value=50),
        st.text(alphabet="xyz", min_size=1, max_size=2),
    ),
    max_size=25,
)


def _ref(left, right, direction, strict):
    """Sequential reference: for each left row the nearest qualifying
    right row; ties on time broken by max (t, vid) under the same struct
    ordering the Spark window uses."""
    out = {}
    for i, (k, t) in enumerate(left):
        cands = []
        for rk, rt, vid in right:
            if rk != k:
                continue
            if direction == "backward":
                ok = rt < t if strict else rt <= t
            else:
                ok = rt > t if strict else rt >= t
            if ok:
                cands.append((rt, vid))
        if not cands:
            out[i] = (None, None)
        elif direction == "backward":
            out[i] = max(cands)  # latest; tie -> greatest payload struct
        else:
            best_t = min(c[0] for c in cands)
            out[i] = max(c for c in cands if c[0] == best_t)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=left_rows, right=right_rows)
def test_asof_all_modes_match_reference(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k: string, t: long, pid: long"
    )
    rdf = spark.createDataFrame(right, "k: string, t: long, vid: string")
    for direction in ("backward", "forward"):
        for strict in (False, True):
            got = {
                r["pid"]: (r["r_t"], r["r_vid"])
                for r in asof_join(
                    ldf, rdf, on="k", left_time="t",
                    direction=direction, strict=strict,
                ).collect()
            }
            want = _ref(left, right, direction, strict)
            assert got == want, (direction, strict)


def _apply_tolerance(ref, left, tol):
    """Null out reference matches farther than tol (pandas merge_asof
    semantics; distance is symmetric |rt - t| because the directional
    qualifier already constrained the sign)."""
    out = {}
    for i, (k, t) in enumerate(left):
        rt, vid = ref[i]
        if rt is not None and abs(rt - t) > tol:
            out[i] = (None, None)
        else:
            out[i] = (rt, vid)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=left_rows, right=right_rows, width=st.sampled_from([1, 7, 100]))
def test_asof_bucketed_property(spark, left, right, width):
    """The skew-resistant variant must be bit-identical to the plain
    reference across EVERY direction × strict combo (round-3 verdict #5:
    it used to lag the plain join's surface at backward-only), plus a
    tolerance leg per direction."""
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k: string, t: long, pid: long"
    )
    rdf = spark.createDataFrame(right, "k: string, t: long, vid: string")
    for direction in ("backward", "forward"):
        for strict in (False, True):
            got = {
                r["pid"]: (r["r_t"], r["r_vid"])
                for r in asof_join_bucketed(
                    ldf, rdf, on="k", left_time="t", bucket_width=width,
                    strict=strict, direction=direction,
                ).collect()
            }
            assert got == _ref(left, right, direction, strict), (
                width, direction, strict,
            )
        got_tol = {
            r["pid"]: (r["r_t"], r["r_vid"])
            for r in asof_join_bucketed(
                ldf, rdf, on="k", left_time="t", bucket_width=width,
                direction=direction, tolerance=5,
            ).collect()
        }
        want_tol = _apply_tolerance(_ref(left, right, direction, False), left, 5)
        assert got_tol == want_tol, (width, direction, "tolerance")
