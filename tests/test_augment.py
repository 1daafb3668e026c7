"""T2 augmentation kernels vs an independent straight-from-C brute
force (loops + math.cos + int() truncation, mirroring
/root/reference/source/training/augmentation.c line by line)."""

import math

import numpy as np
import pytest

from ocr_gang_spark.atlas import class_matrices
from ocr_gang_spark.kernels.augment import (
    add_noise,
    augment_copy,
    rotate_matrix,
    rotation_map,
    scale_matrix,
    shift_matrix,
)

IMAGE_SIZE = 28


def c_trunc(v: float) -> int:
    return int(v)  # Python int() truncates toward zero like a C cast


def brute_rotate(img, angle):
    rads = angle * math.pi / 180.0
    cos_a, sin_a = math.cos(rads), math.sin(rads)
    out = np.zeros((IMAGE_SIZE, IMAGE_SIZE))
    for y in range(IMAGE_SIZE):
        for x in range(IMAGE_SIZE):
            src_x = (x - 13.5) * cos_a + (y - 13.5) * sin_a + 13.5
            src_y = -(x - 13.5) * sin_a + (y - 13.5) * cos_a + 13.5
            nx, ny = c_trunc(0.5 + src_x), c_trunc(0.5 + src_y)
            if 0 <= nx < IMAGE_SIZE and 0 <= ny < IMAGE_SIZE:
                out[y, x] = img[ny, nx]
    return out


def brute_scale(img, scale):
    out = np.zeros((IMAGE_SIZE, IMAGE_SIZE))
    for y in range(IMAGE_SIZE):
        for x in range(IMAGE_SIZE):
            src_x = (x - 13.5) / scale + 13.5
            src_y = (y - 13.5) / scale + 13.5
            nx, ny = c_trunc(0.5 + src_x), c_trunc(0.5 + src_y)
            if 0 <= nx < IMAGE_SIZE and 0 <= ny < IMAGE_SIZE:
                out[y, x] = img[ny, nx]
    return out


@pytest.fixture(scope="module")
def glyph():
    return class_matrices()[0]  # 'A', binary {0,1} float64


@pytest.mark.parametrize("angle", [-20, -13, -1, 0, 1, 7, 20])
def test_rotation_matches_c_brute_force(glyph, angle):
    assert np.array_equal(rotate_matrix(glyph, angle), brute_rotate(glyph, angle))


def test_rotation_zero_is_identity(glyph):
    assert np.array_equal(rotate_matrix(glyph, 0), glyph)


def test_rotation_map_memoized_equals_general_path(glyph):
    # non-integer angle takes the direct path; 5.0 the memoized map
    assert np.array_equal(rotate_matrix(glyph, 5.0), brute_rotate(glyph, 5.0))
    assert np.array_equal(rotate_matrix(glyph, 5.3), brute_rotate(glyph, 5.3))


def test_rotation_truncation_toward_zero_artifact():
    """C's (int)(0.5 + src) truncates toward zero: a source coordinate
    in (-1.5, -0.5) yields index 0 (in bounds), where floor-rounding
    would yield -1 (out of bounds).  Pin one such destination cell."""
    found = False
    for angle in range(-20, 21):
        if angle == 0:
            continue
        rads = angle * math.pi / 180.0
        for y in range(IMAGE_SIZE):
            for x in range(IMAGE_SIZE):
                src_x = (x - 13.5) * math.cos(rads) + (y - 13.5) * math.sin(rads) + 13.5
                src_y = -(x - 13.5) * math.sin(rads) + (y - 13.5) * math.cos(rads) + 13.5
                if -1.0 < 0.5 + src_x < 0.0 and 0 <= c_trunc(0.5 + src_y) < IMAGE_SIZE:
                    idx = rotation_map(angle)[y * IMAGE_SIZE + x]
                    assert idx == c_trunc(0.5 + src_y) * IMAGE_SIZE + 0
                    found = True
    assert found, "no truncation-edge cell in the whole angle range?"


@pytest.mark.parametrize("dx,dy", [(0, 0), (3, 0), (0, -3), (-2, 1), (3, 3)])
def test_shift_matches_manual_window(glyph, dx, dy):
    out = shift_matrix(glyph, dx, dy)
    expect = np.zeros_like(glyph)
    for y in range(IMAGE_SIZE):
        for x in range(IMAGE_SIZE):
            sy, sx = y - dy, x - dx
            if 0 <= sy < IMAGE_SIZE and 0 <= sx < IMAGE_SIZE:
                expect[y, x] = glyph[sy, sx]
    assert np.array_equal(out, expect)


def test_noise_flip_rule_and_rate(glyph):
    rng = np.random.default_rng(3)
    noisy = add_noise(glyph, 0.10, rng)
    flips = noisy != glyph
    # flipped cells obey the >0.5 -> 0 else 1 rule
    assert np.all(noisy[flips & (glyph > 0.5)] == 0.0)
    assert np.all(noisy[flips & (glyph <= 0.5)] == 1.0)
    assert 0.03 < flips.mean() < 0.20  # ~10% of 784 cells
    # intensity 0 is the identity
    assert np.array_equal(add_noise(glyph, 0.0, rng), glyph)


@pytest.mark.parametrize("scale", [0.75, 0.9, 1.0, 1.1, 1.25])
def test_scale_matches_c_brute_force(glyph, scale):
    assert np.array_equal(scale_matrix(glyph, scale), brute_scale(glyph, scale))


def test_scale_one_is_identity(glyph):
    assert np.array_equal(scale_matrix(glyph, 1.0), glyph)


def test_augment_copy_deterministic_and_covers_ops(glyph):
    a1, op1 = augment_copy(glyph, "0:1")
    a2, op2 = augment_copy(glyph, "0:1")
    assert op1 == op2 and np.array_equal(a1, a2)
    ops = {augment_copy(glyph, f"0:{m}")[1] for m in range(1, 50)}
    assert ops == {"rotate", "shift", "noise", "scale"}
