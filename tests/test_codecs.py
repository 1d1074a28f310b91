import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wavelet_decomposition_spark.kernel import deltadelta, gorilla


def _bits_equal(a: np.ndarray, b: np.ndarray) -> bool:
    if a.size != b.size:
        return False
    if a.size == 0:
        return True
    return np.array_equal(a.view(np.uint64), b.view(np.uint64))


@pytest.mark.parametrize(
    "arr",
    [
        np.array([], dtype=np.float64),
        np.array([42.0]),
        np.repeat(3.14159, 1000),
        np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 5e-324, -5e-324, 1e308]),
        np.arange(10000, dtype=np.float64),
        np.random.default_rng(1).normal(size=5000),
    ],
    ids=["empty", "single", "constant", "specials", "ramp", "gaussian"],
)
def test_gorilla_roundtrip(arr):
    assert _bits_equal(gorilla.decode(gorilla.encode(arr)), arr)


def test_gorilla_compresses_constant_series():
    arr = np.repeat(1.5, 10000)
    assert len(gorilla.encode(arr)) < arr.nbytes / 50


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True), max_size=200))
def test_gorilla_roundtrip_property(vals):
    arr = np.asarray(vals, dtype=np.float64)
    assert _bits_equal(gorilla.decode(gorilla.encode(arr)), arr)


@pytest.mark.parametrize(
    "ts",
    [
        np.array([], dtype=np.int64),
        np.array([7], dtype=np.int64),
        np.array([7, 8], dtype=np.int64),
        np.arange(0, 864000, 60, dtype=np.int64),
        np.array([0, 10, 20, 25, 10**15, 10**15 + 1], dtype=np.int64),
        np.sort(np.random.default_rng(2).integers(0, 2**40, 5000)).astype(np.int64),
    ],
    ids=["empty", "single", "pair", "regular", "gap", "random-sorted"],
)
def test_deltadelta_roundtrip(ts):
    assert np.array_equal(deltadelta.decode(deltadelta.encode(ts)), ts)


def test_deltadelta_compresses_regular_grid():
    ts = np.arange(0, 86400, dtype=np.int64)
    assert len(deltadelta.encode(ts)) < ts.nbytes / 15


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=200))
def test_deltadelta_roundtrip_property(vals):
    ts = np.asarray(vals, dtype=np.int64)
    assert np.array_equal(deltadelta.decode(deltadelta.encode(ts)), ts)


# --- cross-block batch codecs (encode_many/decode_many): must be
# byte-identical to the per-block codec, block by block ---------------------

_block_floats = st.lists(
    st.floats(allow_nan=True, allow_infinity=True), max_size=60
)


@settings(max_examples=40, deadline=None)
@given(st.lists(_block_floats, max_size=10))
def test_gorilla_many_matches_per_block(blocks):
    arrs = [np.asarray(b, dtype=np.float64) for b in blocks]
    bounds = np.concatenate(([0], np.cumsum([a.size for a in arrs]))).astype(
        np.int64
    )
    concat = (
        np.concatenate(arrs) if arrs else np.zeros(0, dtype=np.float64)
    )
    many = gorilla.encode_many(concat, bounds)
    assert many == [gorilla.encode(a) for a in arrs]
    dec, db = gorilla.decode_many(many)
    assert np.array_equal(db, bounds)
    assert _bits_equal(dec, concat)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=-(2**62), max_value=2**62), max_size=60
        ),
        max_size=10,
    )
)
def test_deltadelta_many_matches_per_block(blocks):
    arrs = [np.asarray(b, dtype=np.int64) for b in blocks]
    bounds = np.concatenate(([0], np.cumsum([a.size for a in arrs]))).astype(
        np.int64
    )
    concat = np.concatenate(arrs) if arrs else np.zeros(0, dtype=np.int64)
    many = deltadelta.encode_many(concat, bounds)
    assert many == [deltadelta.encode(a) for a in arrs]
    dec, db = deltadelta.decode_many(many)
    assert np.array_equal(db, bounds)
    assert np.array_equal(dec, concat)
