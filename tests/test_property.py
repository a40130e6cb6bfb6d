"""Property-based tests (hypothesis): codec round-trips and kernel
invariants over adversarial inputs — coverage the reference's example-based
suite lacks (SURVEY §5: 'No property-based/randomized testing')."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from modape_spark import kernels as K
from modape_spark.compression import decode_dod, decode_gorilla, encode_dod, encode_gorilla

from . import reference_scalar as ref

settings.register_profile("ci", max_examples=40, deadline=None)
settings.load_profile("ci")


@given(st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1),
                min_size=0, max_size=200))
def test_dod_roundtrip_any_int32(vals):
    v = np.array(vals, dtype=np.int64)
    assert np.array_equal(decode_dod(encode_dod(v)), v)


@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64),
                min_size=0, max_size=120))
def test_gorilla_roundtrip_any_double(vals):
    v = np.array(vals, dtype=np.float64)
    out = decode_gorilla(encode_gorilla(v))
    assert v.tobytes() == out.tobytes()


@given(
    st.integers(min_value=4, max_value=40),
    st.integers(min_value=0, max_value=2**31),
    st.floats(min_value=-3.0, max_value=3.0),
)
def test_ws2d_matches_scalar_any_series(n, seed, loglam):
    rng = np.random.default_rng(seed)
    y = np.rint(rng.uniform(-2000, 10000, n))
    w = (rng.random(n) > 0.3).astype(np.float64)
    lam = 10.0 ** loglam
    z = K.ws2d_batch(y[None, :], lam, w[None, :])[0]
    zs = ref.ws2d(y, lam, w)
    # equal_nan: a fully-unweighted short series is singular -> NaN in BOTH
    # paths (consistent with the reference's cdivision semantics)
    assert np.allclose(z, zs, rtol=0, atol=1e-7, equal_nan=True)


@given(st.integers(min_value=6, max_value=60), st.integers(min_value=0, max_value=2**31))
def test_envelope_upper_bound_property(n, seed):
    """Asymmetric smoothing with p=0.99 hugs the upper envelope: the
    smoothed curve sits above the symmetric one on valid points (on
    average) — the reason the reference uses it for NDVI (cloud darkening
    biases low)."""
    rng = np.random.default_rng(seed)
    y = np.rint(rng.uniform(0, 10000, n)).astype(np.float64)
    w = np.ones(n)
    z_sym = K.ws2d_batch(y[None, :], 10.0, w[None, :])[0]
    z_env = K.ws2dp_batch(y[None, :], 10.0, w[None, :], 0.99)[0]
    assert z_env.mean() >= z_sym.mean() - 1e-9


@given(st.integers(min_value=0, max_value=2**31))
def test_gap_fill_idempotent_on_full_weights(seed):
    """With all weights 1 and huge lambda -> straight-ish line; with lambda
    -> 0 the solution approaches the data (smoother is an interpolator)."""
    rng = np.random.default_rng(seed)
    y = np.rint(rng.uniform(0, 1000, 30)).astype(np.float64)
    w = np.ones(30)
    z_small = K.ws2d_batch(y[None, :], 1e-9, w[None, :])[0]
    assert np.allclose(z_small, y, atol=1e-3)


@given(st.lists(st.integers(-30000, 30000), min_size=0, max_size=300),
       st.integers(0, 400))
@settings(max_examples=60, deadline=None)
def test_dod_fast_and_prefix_property(vals, k):
    """The C bit reader equals the python reader on arbitrary int arrays,
    and prefix(k) == full[:k] for any k (clamped past the end)."""
    from modape_spark.compression import decode_dod_fast, decode_dod_prefix

    v = np.asarray(vals, dtype=np.int64)
    b = encode_dod(v)
    full = decode_dod(b)
    assert np.array_equal(full, v)
    assert np.array_equal(decode_dod_fast(b), v)
    assert np.array_equal(decode_dod_prefix(b, k), v[:min(k, v.size)])
