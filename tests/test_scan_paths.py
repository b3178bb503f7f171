"""Scan-ordering generator tests (the generators were verified offline
against the reference's literal 49/81-token tables,
ref: Mutimodality_Mamba7.py:609-640,787-806)."""

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
