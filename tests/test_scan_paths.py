"""Scan-ordering generator tests: the generators are checked against the
reference's LITERAL index tables, embedded below verbatim
(ref: Mutimodality_Mamba7.py:609-640 for '81_2+8', :787-806 for '49_2+8',
:703-712 for '49twoclock')."""

import numpy as np
import pytest

from vit_cnn_tpu.ops.scan_paths import (col_boustrophedon, col_major, diag,
                                        inverse_permutation, path_orderings,
                                        spiral_ccw, spiral_cw, zigzag,
                                        zigzag_mirror)


@pytest.mark.parametrize("gen", [col_boustrophedon, col_major, diag, zigzag,
                                 zigzag_mirror, spiral_cw, spiral_ccw])
@pytest.mark.parametrize("n", [3, 5, 7, 9])
def test_orderings_are_permutations(gen, n):
    o = gen(n)
    assert sorted(o.tolist()) == list(range(n * n))


def test_small_grids_hand_checked():
    # 3x3 grid, row-major ids 0..8
    np.testing.assert_array_equal(col_boustrophedon(3),
                                  [0, 3, 6, 7, 4, 1, 2, 5, 8])
    np.testing.assert_array_equal(zigzag(3), [0, 1, 3, 6, 4, 2, 5, 7, 8])
    np.testing.assert_array_equal(spiral_cw(3), [0, 1, 2, 5, 8, 7, 6, 3, 4])
    np.testing.assert_array_equal(spiral_ccw(3), [0, 3, 6, 7, 8, 5, 2, 1, 4])


@pytest.mark.parametrize("n", [5, 7, 9])
def test_spirals_visit_neighbors(n):
    for gen in (spiral_cw, spiral_ccw):
        o = gen(n)
        r, c = o // n, o % n
        steps = np.abs(np.diff(r)) + np.abs(np.diff(c))
        assert (steps == 1).all()  # spiral moves one grid cell at a time


def test_path_orderings_counts():
    assert len(path_orderings("81_2+8", 81)) == 10
    assert len(path_orderings("49_2+8", 49)) == 10
    assert len(path_orderings("eight_directions_gate", 49)) == 8
    assert len(path_orderings("49twoclock", 49)) == 2
    assert len(path_orderings("forward", 81)) == 1


def test_inverse_permutation_roundtrip():
    o = zigzag(7)
    inv = inverse_permutation(o)
    x = np.arange(49)
    np.testing.assert_array_equal(x[o][inv], x)


# ---------------------------------------------------------------------------
# The reference's literal index tables, copied verbatim (they are pure data —
# the interface the generators must reproduce). Direction order in the
# reference: [hf, hr, vf, vr, 37df, 37dr, 19df, 19dr, ltcw, ltacw]
# (ref: Mutimodality_Mamba7.py:653, :819).
# ---------------------------------------------------------------------------

# ref: Mutimodality_Mamba7.py:610-615 (index_vf, '81_2+8')
REF81_VF = [0, 9, 18, 27, 36, 45, 54, 63, 72, 73, 64, 55, 46, 37, 28, 19, 10,
            1, 2, 11, 20, 29, 38, 47, 56, 65, 74, 75, 66, 57, 48, 39, 30, 21,
            12, 3, 4, 13, 22, 31, 40, 49, 58, 67, 76, 77, 68, 59, 50, 41, 32,
            23, 14, 5, 6, 15, 24, 33, 42, 51, 60, 69, 78, 79, 70, 61, 52, 43,
            34, 25, 16, 7, 8, 17, 26, 35, 44, 53, 62, 71, 80]
# ref: :617-622 (index_37df)
REF81_37DF = [0, 1, 9, 18, 10, 2, 3, 11, 19, 27, 36, 28, 20, 12, 4, 5, 13, 21,
              29, 37, 45, 54, 46, 38, 30, 22, 14, 6, 7, 15, 23, 31, 39, 47,
              55, 63, 72, 64, 56, 48, 40, 32, 24, 16, 8, 17, 25, 33, 41, 49,
              57, 65, 73, 74, 66, 58, 50, 42, 34, 26, 35, 43, 51, 59, 67, 75,
              76, 68, 60, 52, 44, 53, 61, 69, 77, 78, 70, 62, 71, 79, 80]
# ref: :624-629 (index_19df)
REF81_19DF = [8, 7, 17, 26, 16, 6, 5, 15, 25, 35, 44, 34, 24, 14, 4, 3, 13,
              23, 33, 43, 53, 62, 52, 42, 32, 22, 12, 2, 1, 11, 21, 31, 41,
              51, 61, 71, 80, 70, 60, 50, 40, 30, 20, 10, 0, 9, 19, 29, 39,
              49, 59, 69, 79, 78, 68, 58, 48, 38, 28, 18, 27, 37, 47, 57, 67,
              77, 76, 66, 56, 46, 36, 45, 55, 65, 75, 74, 64, 54, 63, 73, 72]
# ref: :631-637 (index_ltcw)
REF81_LTCW = [0, 1, 2, 3, 4, 5, 6, 7, 8, 17, 26, 35, 44, 53, 62,
              71, 80, 79, 78, 77, 76, 75, 74, 73, 72, 63, 54, 45,
              36, 27, 18, 9, 10, 11, 12, 13, 14, 15, 16, 25, 34,
              43, 52, 61, 70, 69, 68, 67, 66, 65, 64, 55, 46, 37,
              28, 19, 20, 21, 22, 23, 24, 33, 42, 51, 60, 59, 58,
              57, 56, 47, 38, 29, 30, 31, 32, 41, 50, 49, 48, 39, 40]
# ref: :638-644 (index_ltacw)
REF81_LTACW = [0, 9, 18, 27, 36, 45, 54, 63, 72, 73, 74, 75, 76,
               77, 78, 79, 80, 71, 62, 53, 44, 35, 26, 17, 8, 7,
               6, 5, 4, 3, 2, 1, 10, 19, 28, 37, 46, 55, 64, 65,
               66, 67, 68, 69, 70, 61, 52, 43, 34, 25, 16, 15, 14,
               13, 12, 11, 20, 29, 38, 47, 56, 57, 58, 59, 60, 51,
               42, 33, 24, 23, 22, 21, 30, 39, 48, 49, 50, 41, 32, 31, 40]

# ref: :788-791 (index_vf, '49_2+8')
REF49_VF = [0, 7, 14, 21, 28, 35, 42, 43, 36, 29, 22, 15, 8, 1, 2, 9, 16, 23,
            30, 37, 44, 45, 38, 31, 24, 17, 10, 3, 4, 11, 18, 25, 32, 39, 46,
            47, 40, 33, 26, 19, 12, 5, 6, 13, 20, 27, 34, 41, 48]
# ref: :793-795 (index_37df)
REF49_37DF = [0, 1, 7, 14, 8, 2, 3, 9, 15, 21, 28, 22, 16, 10, 4, 5, 11, 17,
              23, 29, 35, 42, 36, 30, 24, 18, 12, 6, 13, 19, 25, 31, 37, 43,
              44, 38, 32, 26, 20, 27, 33, 39, 45, 46, 40, 34, 41, 47, 48]
# ref: :797-799 (index_19df)
REF49_19DF = [6, 5, 13, 20, 12, 4, 3, 11, 19, 27, 34, 26, 18, 10, 2, 1, 9, 17,
              25, 33, 41, 48, 40, 32, 24, 16, 8, 0, 7, 15, 23, 31, 39, 47, 46,
              38, 30, 22, 14, 21, 29, 37, 45, 44, 36, 28, 35, 43, 42]
# ref: :801-804 (index_ltcw; also '49twoclock' at :704-707)
REF49_LTCW = [0, 1, 2, 3, 4, 5, 6, 13, 20, 27, 34, 41, 48, 47, 46, 45, 44, 43,
              42, 35, 28, 21, 14, 7, 8, 9, 10, 11, 12, 19, 26, 33,
              40, 39, 38, 37, 36, 29, 22, 15, 16, 17, 18, 25,
              32, 31, 30, 23, 24]
# ref: :805-807 (index_ltacw; also '49twoclock' at :708-710)
REF49_LTACW = [0, 7, 14, 21, 28, 35, 42, 43, 44, 45, 46, 47, 48, 41, 34,
               27, 20, 13, 6, 5, 4, 3, 2, 1, 8, 15, 22, 29, 36, 37, 38, 39,
               40, 33, 26, 19, 12, 11, 10, 9, 16, 23, 30, 31, 32, 25, 18, 17,
               24]


def _ref_direction_set(vf, d37, d19, cw, acw, L):
    """The reference's 10-direction list: hf, hr, then each table fwd/rev,
    then the two spirals (ref: :646-653, :810-819)."""
    hf = list(range(L))
    return [hf, hf[::-1], vf, vf[::-1], d37, d37[::-1], d19, d19[::-1],
            cw, acw]


@pytest.mark.parametrize("path,L,tables", [
    ("81_2+8", 81, (REF81_VF, REF81_37DF, REF81_19DF, REF81_LTCW,
                    REF81_LTACW)),
    ("49_2+8", 49, (REF49_VF, REF49_37DF, REF49_19DF, REF49_LTCW,
                    REF49_LTACW)),
])
def test_generators_reproduce_reference_tables(path, L, tables):
    expected = _ref_direction_set(*tables, L)
    got = path_orderings(path, L)
    assert len(got) == len(expected) == 10
    for i, (g, e) in enumerate(zip(got, expected)):
        np.testing.assert_array_equal(g, e, err_msg=f"direction {i}")


def test_twoclock_reproduces_reference_tables():
    got = path_orderings("49twoclock", 49)
    np.testing.assert_array_equal(got[0], REF49_LTCW)
    np.testing.assert_array_equal(got[1], REF49_LTACW)
