"""Native C++ trace-column parser: parity with the numpy path."""

import numpy as np
import pytest

from neural_vit_tpu import native
from neural_vit_tpu.data.sequences import parse_trace, stack_traces


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_matches_numpy_parse(lib, rng):
    traces = [
        "[" + ", ".join(f"{v:.6f}" for v in rng.standard_normal(200)) + "]"
        for _ in range(16)
    ]
    traces.append("[]")                      # empty
    traces.append("[1.0, 2.0]")              # too short
    traces.append("3.5 -1.25e2 7e-3 " + " ".join(["0.5"] * 197))  # bare form

    out = native.parse_string_traces(traces, 200)
    assert out is not None
    dense, valid = out
    assert dense.shape == (19, 200)
    assert valid[:16].all() and not valid[16] and not valid[17] and valid[18]
    for i in range(16):
        ref = parse_trace(traces[i])[:200]
        np.testing.assert_allclose(dense[i], ref, rtol=1e-6)
    np.testing.assert_allclose(dense[18][:3], [3.5, -125.0, 0.007], rtol=1e-6)
    # invalid rows zeroed
    assert not dense[16].any() and not dense[17].any()


def test_stack_traces_uses_native_for_strings(rng):
    vals = rng.standard_normal((4, 100))
    strs = ["[" + ", ".join(f"{v:.6f}" for v in row) + "]" for row in vals]
    dense, valid = stack_traces(strs, expected_len=100)
    assert valid.all()
    np.testing.assert_allclose(dense, vals, rtol=1e-5, atol=1e-6)
    # Mixed input falls back to numpy and matches.
    mixed = [vals[0], strs[1], list(vals[2])]
    dense2, valid2 = stack_traces(mixed, expected_len=100)
    assert valid2.all()
    np.testing.assert_allclose(dense2[1], vals[1], rtol=1e-5, atol=1e-6)
