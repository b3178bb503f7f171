"""Padding / window split + reassembly helpers (ref: utils.py:320-563)."""

import numpy as np

from vit_cnn_tpu.infer.windows import (adding_windows_singleimage,
                                       generate_windows, grouper,
                                       padding_image, restore_from_padding)


def test_padding_roundtrip():
    img = np.random.RandomState(0).rand(10, 12, 3).astype(np.float32)
    padded = padding_image(img, (5, 5))
    assert padded.shape == (14, 16, 3)
    np.testing.assert_array_equal(restore_from_padding(padded, (5, 5)), img)


def test_padding_2d_and_modes():
    img = np.arange(20, dtype=np.float32).reshape(4, 5)
    p = padding_image(img, (3, 3), mode="reflect")
    assert p.shape == (6, 7)
    np.testing.assert_array_equal(restore_from_padding(p, (3, 3)), img)


def test_grouper():
    out = list(grouper(3, range(8)))
    assert out == [(0, 1, 2), (3, 4, 5), (6, 7)]


def test_window_split_reassembly_identity():
    rng = np.random.RandomState(1)
    img = rng.rand(9, 11, 2).astype(np.float32)
    wins, origins = generate_windows(img, (3, 3), step=2)
    assert wins.shape[1:] == (3, 3, 2)
    back = adding_windows_singleimage(wins, origins, img.shape)
    # overlap-averaged reassembly of identical windows == original
    np.testing.assert_allclose(back, img, rtol=1e-6)
