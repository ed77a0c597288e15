"""Operator registry tests — the reference's test_numpyops.py analog:
every registered numpy-backed op must agree with the raw ufunc."""

import numpy as np
import pytest

from raygraph import ops


def test_numpy_ops_registered():
    assert "np_sqrt" in ops.UNARY
    assert "np_hypot" in ops.BINARY
    assert "np_gcd" in ops.BINARY  # reference binary/numpy.py includes gcd/lcm
    assert "np_lcm" in ops.BINARY


@pytest.mark.parametrize("name", ["abs", "sqrt", "exp", "log1p", "signum", "floor"])
def test_unary_matches_numpy(name):
    rng = np.random.default_rng(3)
    x = rng.random(1000) * 5 + 0.1
    ref = {"abs": np.abs, "sqrt": np.sqrt, "exp": np.exp, "log1p": np.log1p,
           "signum": np.sign, "floor": np.floor}[name]
    np.testing.assert_array_equal(ops.UNARY[name](x), ref(x))


@pytest.mark.parametrize("name", ["plus", "minus", "times", "min", "max", "pow"])
def test_binary_matches_numpy(name):
    rng = np.random.default_rng(4)
    a, b = rng.random(1000) + 1, rng.random(1000) + 1
    ref = {"plus": np.add, "minus": np.subtract, "times": np.multiply,
           "min": np.minimum, "max": np.maximum, "pow": np.power}[name]
    np.testing.assert_array_equal(ops.BINARY[name](a, b), ref(a, b))


def test_monoid_identities():
    x = np.array([2.0, 3.0])
    for name in ("plus", "min", "max", "times"):
        m = ops.MONOID[name]
        out = m.ufunc(x, np.full(2, float(m.identity)))
        np.testing.assert_array_equal(out, x)  # op(x, identity) == x


def test_local_combine():
    k = np.array([3, 1, 3, 1, 2], np.uint64)
    v = np.array([1.0, 2.0, 4.0, 8.0, 16.0])
    kk, vv = ops.local_combine(ops.MONOID["plus"], k, v)
    assert kk.tolist() == [1, 2, 3]
    assert vv.tolist() == [10.0, 16.0, 5.0]
    kk, vv = ops.local_combine(ops.MONOID["min"], k, v)
    assert vv.tolist() == [2.0, 16.0, 1.0]


def test_register_custom():
    ops.register_unary("double_it", lambda x: 2 * x)
    ops.register_semiring("max_plus", "max", "plus")
    assert ops.SEMIRING["max_plus"].monoid.name == "max"
    np.testing.assert_array_equal(ops.UNARY["double_it"](np.array([3.0])), [6.0])


def test_xor_family_monoids():
    """lxor/lxnor/bxor/bxnor monoid reduces vs brute-force folds
    (reference monoid.py:184-193,382)."""
    rng = np.random.default_rng(7)
    ints = rng.integers(0, 2**62, size=23).astype(np.int64)
    bools = rng.integers(0, 2, size=23).astype(bool)
    starts = np.array([0, 5, 6, 14], np.int64)  # segments incl. size 1

    def brute(vals, op):
        out = []
        bounds = list(starts) + [len(vals)]
        for a, b in zip(bounds, bounds[1:]):
            acc = vals[a]
            for x in vals[a + 1:b]:
                acc = op(acc, x)
            out.append(acc)
        return out

    got = ops.MONOID["bxor"].ufunc.reduceat(ints, starts)
    assert got.tolist() == brute(ints, lambda a, b: a ^ b)
    got = ops.MONOID["bxnor"].ufunc.reduceat(ints, starts)
    assert got.tolist() == brute(ints, lambda a, b: ~(a ^ b))
    got = ops.MONOID["lxor"].ufunc.reduceat(bools, starts)
    assert got.tolist() == brute(bools, lambda a, b: bool(a) != bool(b))
    got = ops.MONOID["lxnor"].ufunc.reduceat(bools, starts)
    assert got.tolist() == brute(bools, lambda a, b: bool(a) == bool(b))
    # bxnor whole-array reduce parity (even/odd lengths)
    for k in (4, 5):
        want = ints[0]
        for x in ints[1:k]:
            want = ~(want ^ x)
        assert int(ops.MONOID["bxnor"].ufunc.reduce(ints[:k])) == int(want)
    # identities: op(x, id) == x
    for name in ("lxor", "bxor"):
        m = ops.MONOID[name]
        x = bools if name == "lxor" else ints.astype(np.uint64)
        np.testing.assert_array_equal(
            m.ufunc(x, np.full(len(x), m.identity, x.dtype)), x)


def test_binary_bitwise_tail():
    import math
    from raygraph.ops import BINARY

    x = np.array([0b1011, 0b0100, 2**63], np.uint64)
    k = np.array([1, 2, 62], np.uint64)
    assert BINARY["bget"](x, k).tolist() == [1, 1, 0]
    assert BINARY["bset"](x, k).tolist() == [0b1011, 0b0100, 2**63 + 2**62]
    assert BINARY["bclr"](x, k).tolist() == [0b1001, 0, 2**63]
    # bshift: negative k shifts right, |k|>63 zeroes
    xs = np.array([8, 8, 1, 1], np.uint64)
    ks = np.array([2, -2, 64, -64], np.int64)
    from raygraph.ops import _bshift
    assert _bshift(xs, ks).tolist() == [32, 2, 0, 0]
    assert BINARY["lxnor"](np.array([1, 0, 1]), np.array([1, 1, 0])).tolist() == [
        True, False, False]
    assert BINARY["rpow"](np.array([2.0]), np.array([3.0]))[0] == 9.0
    assert BINARY["rfloordiv"](np.array([2.0]), np.array([7.0]))[0] == 3.0
    assert BINARY["binom"](np.array([5]), np.array([2]))[0] == 10.0
    assert BINARY["ldexp"](np.array([1.5]), np.array([3]))[0] == 12.0


def test_isclose_parameterized():
    from raygraph.ops import isclose

    f = isclose(rel_tol=0.1)
    assert f(np.array([100.0]), np.array([109.0]))[0]
    assert not f(np.array([100.0]), np.array([112.0]))[0]
    g = isclose(rel_tol=0.0, abs_tol=5.0)
    assert g(np.array([1.0]), np.array([5.5]))[0]
    assert not g(np.array([1.0]), np.array([6.5]))[0]


def test_unary_special_tail():
    import math
    from raygraph.ops import UNARY

    x = np.array([0.5, 1.0, 2.5])
    for name, ref in [("erf", math.erf), ("erfc", math.erfc),
                      ("lgamma", math.lgamma), ("tgamma", math.gamma)]:
        got = UNARY[name](x)
        assert got.dtype == np.float64
        assert np.allclose(got, [ref(v) for v in x])
    m, e = UNARY["frexpx"](x), UNARY["frexpe"](x)
    assert np.allclose(m * np.exp2(e), x)


def test_bitops_clamp_k_mod_64():
    """ADVICE r4: bget/bset/bclr mask the bit position k % 64 (GxB
    semantics) instead of numpy's platform-dependent >=64 shifts."""
    from raygraph.ops import BINARY

    x = np.array([0b1010, 0], np.uint64)
    k = np.array([65, 64], np.uint64)  # -> bits 1 and 0
    assert BINARY["bget"](x, k).tolist() == [1, 0]
    assert BINARY["bset"](x, k).tolist() == [0b1010, 1]
    assert BINARY["bclr"](x, k).tolist() == [0b1000, 0]
