"""Property-based tests (hypothesis) for the structural function
library: invariants that must hold for ARBITRARY payloads, not just the
reference fixtures."""

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from dbsink_spark.functions import (
    flatten,
    make_valid_string,
    payload_parse,
    scrub_special_floats,
)

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.text(max_size=40),
)

json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=10), children, max_size=4),
    ),
    max_leaves=20,
)


@given(st.dictionaries(st.text(min_size=1, max_size=10), json_values, max_size=5))
@settings(max_examples=200, deadline=None)
def test_flatten_always_flat_dict(payload):
    out = flatten(payload)
    assert isinstance(out, dict)
    for v in out.values():
        # values are scalars or lists — never dicts (flatness invariant)
        assert not isinstance(v, dict)


@given(st.dictionaries(st.text(min_size=1, max_size=10), json_values, max_size=5))
@settings(max_examples=200, deadline=None)
def test_payload_parse_always_json_clean(payload):
    out = payload_parse(payload)
    # round-trips through json and carries no NaN/Infinity anywhere
    text = json.dumps(out, allow_nan=False)
    json.loads(text)


@given(json_values)
@settings(max_examples=200, deadline=None)
def test_scrub_idempotent(value):
    once = scrub_special_floats(value)
    twice = scrub_special_floats(once)
    assert once == twice


@given(json_scalars)
@settings(max_examples=200, deadline=None)
def test_make_valid_string_always_str(value):
    out = make_valid_string(value)
    assert isinstance(out, str)
    if isinstance(value, str):
        # scrubbed strings contain no control chars / quotes / backslashes
        assert not any(c in out for c in '"\\\x00\x01\x1f')


@given(st.dictionaries(st.text(min_size=1, max_size=8), json_values, max_size=4))
@settings(max_examples=100, deadline=None)
def test_flatten_deterministic(payload):
    assert flatten(payload) == flatten(payload)
