import numpy as np

from antmmf_tpu.utils.phoc.build_phoc import (
    PHOC_DIM,
    _build_phoc_py,
    _load_lib,
    build_phoc,
)


def test_native_lib_builds_and_loads():
    assert _load_lib() is not None  # g++ toolchain is baked into the image


def test_phoc_shape_and_binary():
    v = build_phoc("hello")
    assert v.shape == (PHOC_DIM,)
    assert set(np.unique(v)).issubset({0.0, 1.0})
    assert v.sum() > 0


def test_c_matches_python_fallback():
    for word in ("hello", "the", "a", "gymnastics", "WORD123", "", "zz"):
        np.testing.assert_array_equal(build_phoc(word), _build_phoc_py(word),
                                      err_msg=word)


def test_phoc_semantics():
    # 'a' alone spans [0,1]: only level-2 regions reach the 50% overlap
    # threshold (each covers exactly half the char span)
    v = build_phoc("a")
    a_idx = 0
    hits = [r for r in range(14) if v[r * 36 + a_idx] == 1.0]
    assert hits == [0, 1]
    # bigram 'th' in "th" spans the whole word → both level-2 regions
    v = build_phoc("th")
    base = 14 * 36
    th = 0  # 'th' is bigram index 0
    assert v[base + th] == 1.0 and v[base + 50 + th] == 1.0


def test_case_insensitive():
    np.testing.assert_array_equal(build_phoc("Hello"), build_phoc("hello"))


def test_matches_reference_vectors():
    """Bit-identical to the reference CPython extension.

    Fixture vectors were computed by compiling and running the reference
    /root/reference/antmmf/utils/phoc/src/cphoc.c (same bigram table, same
    single-precision overlap math) — regenerate with that extension if the
    contract ever changes.
    """
    import os

    fixture = os.path.join(os.path.dirname(__file__), "data",
                           "phoc_ref_vectors.npz")
    ref = np.load(fixture)
    for word in ref.files:
        np.testing.assert_array_equal(build_phoc(word), ref[word],
                                      err_msg=word)
        np.testing.assert_array_equal(_build_phoc_py(word), ref[word],
                                      err_msg=word)
