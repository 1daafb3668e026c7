"""Training-data augmentation kernels (T2) — reference semantics.

Reimplements /root/reference/source/training/augmentation.c to the
integer level:

* ``rotate_matrix`` (:48-75) — inverse-map nearest neighbor around
  center (13.5, 13.5); integer angles in [-20, 20] use precomputed maps
  exactly like the reference's memoized ``rotation_maps`` (:10-45).
  The C rounding is ``(int)(0.5 + src)`` — a **truncation toward zero**,
  so source coordinates in (-1.5, -0.5] truncate to 0 and stay
  in-bounds (a C artifact faithfully reproduced: np.trunc, not floor).
* ``shift_matrix`` (:78-97) — windowed copy, zero fill.
* ``add_noise`` (:100-106) — per-cell flip with probability
  ``intensity``; a cell flips to 0.0 if > 0.5 else 1.0.
* ``scale_matrix`` (:109-123) — inverse-map nearest neighbor,
  ``src = (dst - 13.5) / scale + 13.5`` with the same trunc rounding.
* ``augment_copy`` — one augmented copy with the reference's op mix
  (``augment_dataset`` :126-185): op = u%4; rotate angle u%41 - 20;
  shift dx,dy = u%7 - 3; noise 0.02..0.10; scale 0.75..1.25.  The
  reference draws from srand(time) — non-reproducible by design — so
  parameters here derive from a sha256-seeded Generator per
  (sample, copy) key, the same determinism strategy as the rest of the
  engine (SURVEY.md §7.0).

The reference's custom my_sin/my_cos (tools.c:110-136, M4) agree with
np.sin/np.cos to ~1e-15; the map entries are integers rounded from
values never that close to a .5 boundary for whole-degree angles, so
the integer maps are identical (pinned by the brute-force test).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache
from typing import Tuple

import numpy as np

IMAGE_SIZE = 28
IMAGE_PIXELS = IMAGE_SIZE * IMAGE_SIZE
_CENTER = 13.5

OPS = ("rotate", "shift", "noise", "scale")


def _inverse_map(cos_a: float, sin_a: float, inv_scale: float = 1.0) -> np.ndarray:
    """(784,) int32 source index per destination pixel, -1 = out of bounds.

    dst (x, y) -> src ((x-c)*cos + (y-c)*sin, -(x-c)*sin + (y-c)*cos)
    scaled by inv_scale, rounded with the C ``(int)(0.5 + v)`` trunc.
    """
    y, x = np.mgrid[0:IMAGE_SIZE, 0:IMAGE_SIZE]
    dx = x - _CENTER
    dy = y - _CENTER
    src_x = (dx * cos_a + dy * sin_a) * inv_scale + _CENTER
    src_y = (-dx * sin_a + dy * cos_a) * inv_scale + _CENTER
    nx = np.trunc(0.5 + src_x).astype(np.int64)
    ny = np.trunc(0.5 + src_y).astype(np.int64)
    ok = (nx >= 0) & (nx < IMAGE_SIZE) & (ny >= 0) & (ny < IMAGE_SIZE)
    idx = np.where(ok, ny * IMAGE_SIZE + nx, -1)
    return idx.reshape(-1).astype(np.int32)


@lru_cache(maxsize=64)
def rotation_map(angle_deg: int) -> np.ndarray:
    """Precomputed integer rotation map for a whole-degree angle in
    [-20, 20] (reference init_rotation_maps, augmentation.c:10-45)."""
    if not -20 <= angle_deg <= 20:
        raise ValueError(f"angle {angle_deg} outside the memoized range")
    rads = angle_deg * np.pi / 180.0
    return _inverse_map(np.cos(rads), np.sin(rads))


def _apply_map(img: np.ndarray, idx: np.ndarray) -> np.ndarray:
    flat = np.asarray(img, dtype=np.float64).reshape(-1)
    out = np.where(idx >= 0, flat[np.maximum(idx, 0)], 0.0)
    return out.reshape(IMAGE_SIZE, IMAGE_SIZE)


def rotate_matrix(img: np.ndarray, angle: float) -> np.ndarray:
    """Reference rotate_matrix (augmentation.c:48-75): memoized map for
    whole-degree angles in [-20, 20], direct computation otherwise."""
    ai = int(angle)
    if float(ai) == float(angle) and -20 <= ai <= 20:
        return _apply_map(img, rotation_map(ai))
    rads = angle * np.pi / 180.0
    return _apply_map(img, _inverse_map(np.cos(rads), np.sin(rads)))


def shift_matrix(img: np.ndarray, dx: int, dy: int) -> np.ndarray:
    """Reference shift_matrix (augmentation.c:78-97): zero canvas,
    clipped window copy."""
    out = np.zeros((IMAGE_SIZE, IMAGE_SIZE), dtype=np.float64)
    copy_w = IMAGE_SIZE - abs(dx)
    copy_h = IMAGE_SIZE - abs(dy)
    if copy_w <= 0 or copy_h <= 0:
        return out
    src_x0, dst_x0 = (0, dx) if dx > 0 else (-dx, 0)
    src_y0, dst_y0 = (0, dy) if dy > 0 else (-dy, 0)
    out[dst_y0 : dst_y0 + copy_h, dst_x0 : dst_x0 + copy_w] = np.asarray(
        img, dtype=np.float64
    )[src_y0 : src_y0 + copy_h, src_x0 : src_x0 + copy_w]
    return out


def add_noise(
    img: np.ndarray, intensity: float, rng: np.random.Generator
) -> np.ndarray:
    """Reference add_noise (augmentation.c:100-106): each cell flips
    with probability ``intensity`` (>0.5 -> 0.0, else 1.0)."""
    out = np.asarray(img, dtype=np.float64).copy()
    flip = rng.random(out.shape) < intensity
    out[flip] = np.where(out[flip] > 0.5, 0.0, 1.0)
    return out


def scale_matrix(img: np.ndarray, scale: float) -> np.ndarray:
    """Reference scale_matrix (augmentation.c:109-123)."""
    return _apply_map(img, _inverse_map(1.0, 0.0, inv_scale=1.0 / scale))


def _rng_for(key: str) -> np.random.Generator:
    digest = hashlib.sha256(("aug:" + key).encode()).digest()
    return np.random.default_rng(int.from_bytes(digest[:8], "little"))


def augment_copy(img: np.ndarray, key: str) -> Tuple[np.ndarray, str]:
    """One augmented copy with the reference op mix
    (augment_dataset, augmentation.c:157-176), deterministic per key.
    Returns (augmented 28x28 float64, op name)."""
    rng = _rng_for(key)
    op = OPS[int(rng.integers(0, 4))]
    if op == "rotate":
        angle = int(rng.integers(0, 41)) - 20
        return rotate_matrix(img, angle), op
    if op == "shift":
        dx = int(rng.integers(0, 7)) - 3
        dy = int(rng.integers(0, 7)) - 3
        return shift_matrix(img, dx, dy), op
    if op == "noise":
        intensity = 0.02 + rng.random() * 0.08
        return add_noise(img, intensity, rng), op
    scale = 0.75 + rng.random() * 0.5
    return scale_matrix(img, scale), op
