"""Perceptual image hashing (operators/phash.py): resampler and DCT
math pinned against closed-form cases, the perceptual robustness
properties (brightness / re-scale / re-encode) on real in-repo codec
payloads, and the Spark hash + near-dup pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from kinesis_vcr_spark.operators.phash import (
    _dct_basis,
    _overlap_matrix,
    area_resize,
    dhash64,
    fake_pixels,
    near_dup_pairs_phash,
    perceptual_hashes,
    phash64,
    real_pixels,
    to_grayscale,
)


def _ppm(px: np.ndarray) -> bytes:
    h, w = px.shape[:2]
    rgb = px if px.ndim == 3 else np.repeat(px[:, :, None], 3, axis=2)
    return (
        f"P6\n{w} {h}\n255\n".encode()
        + rgb.astype(np.uint8).tobytes()
    )


def _scene(h: int, w: int) -> np.ndarray:
    """Smooth low-frequency test scene (diagonal gradient + blob)."""
    y, x = np.mgrid[0:h, 0:w]
    img = 60 + 120 * (x + y) / (h + w)
    img += 50 * np.exp(-(((x - w / 3) ** 2 + (y - h / 3) ** 2)
                         / (0.05 * h * w)))
    return np.clip(img, 0, 255)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ------------------------------------------------------------- math pins

def test_overlap_matrix_rows_sum_to_one_and_exact_halving():
    m = _overlap_matrix(4, 2)
    np.testing.assert_allclose(m.sum(axis=1), 1.0)
    np.testing.assert_allclose(
        m, [[0.5, 0.5, 0, 0], [0, 0, 0.5, 0.5]]
    )
    # fractional overlap: 3 -> 2 splits the middle pixel 50/50
    np.testing.assert_allclose(
        _overlap_matrix(3, 2),
        [[2 / 3, 1 / 3, 0], [0, 1 / 3, 2 / 3]],
    )


def test_area_resize_preserves_mean_and_constants():
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 255, (37, 53))
    out = area_resize(img, 32, 32)
    assert out.shape == (32, 32)
    # exact area averaging preserves the global mean
    np.testing.assert_allclose(out.mean(), img.mean())
    np.testing.assert_allclose(area_resize(np.full((9, 7), 42.0), 8, 8), 42.0)


def test_dct_basis_orthonormal_and_constant_image_dc_only():
    c = _dct_basis(32)
    np.testing.assert_allclose(c @ c.T, np.eye(32), atol=1e-12)
    coefs = c @ np.full((32, 32), 5.0) @ c.T
    assert abs(coefs[0, 0] - 5.0 * 32) < 1e-9  # DC = N·mean for orthonormal
    assert np.abs(coefs[1:, :]).max() < 1e-9
    assert np.abs(coefs[0, 1:]).max() < 1e-9


def test_grayscale_rec601():
    px = np.zeros((1, 1, 3))
    px[0, 0] = [255, 0, 0]
    np.testing.assert_allclose(to_grayscale(px)[0, 0], 0.299 * 255)
    # alpha ignored
    rgba = np.dstack([px, np.full((1, 1, 1), 9.0)])
    np.testing.assert_allclose(to_grayscale(rgba)[0, 0], 0.299 * 255)


# ---------------------------------------------------- perceptual behavior

def test_dhash_exact_brightness_invariance():
    img = _scene(40, 56)
    shifted = img * 0.8 + 30  # affine, order-preserving per gradient
    assert dhash64(img) == dhash64(shifted)


def test_phash_stable_under_small_brightness_shift():
    img = _scene(40, 56)
    assert _ham(phash64(img), phash64(img + 8)) <= 2


def test_phash_survives_rescale_and_ppm_reencode():
    img = _scene(64, 64)
    a = phash64(real_pixels(_ppm(img)))
    smaller = area_resize(img, 48, 48)
    b = phash64(real_pixels(_ppm(smaller)))
    assert _ham(a, b) <= 6
    # a genuinely different image is far away
    rng = np.random.default_rng(3)
    noise = rng.uniform(0, 255, (64, 64))
    assert _ham(a, phash64(noise)) >= 16
    assert _ham(dhash64(img), dhash64(noise)) >= 16


def test_fake_pixels_deterministic():
    p = b"hello world, this payload becomes pixels" * 3
    np.testing.assert_array_equal(fake_pixels(p), fake_pixels(p))
    assert phash64(fake_pixels(p)) == phash64(fake_pixels(p))
    assert fake_pixels(b"").shape == (1, 1)


def test_real_pixels_unknown_container_is_loud():
    with pytest.raises(NotImplementedError, match="container"):
        real_pixels(b"\x00\x01\x02not an image")


# ------------------------------------------------------------ Spark path

def test_perceptual_hashes_and_near_dup_pipeline(spark):
    from kinesis_vcr_spark.operators.multimodal import documents_as_media

    scene = _scene(48, 48)
    other = 255 - _scene(48, 48).T
    rows = [
        (1, _ppm(scene)),
        (2, _ppm(scene)),  # byte-identical twin
        (3, _ppm(scene + 6)),  # brightness-shifted near-dup
        (4, _ppm(other)),  # different image
    ]
    media = spark.createDataFrame(
        [(i, "image", p, {}) for i, p in rows],
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    hashes = {
        r["media_id"]: (r["phash"], r["dhash"])
        for r in perceptual_hashes(media).collect()
    }
    assert hashes[1] == hashes[2]
    assert _ham(hashes[1][0], hashes[3][0]) <= 3
    assert _ham(hashes[1][0], hashes[4][0]) > 3

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in near_dup_pairs_phash(media, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)

    # the documents_as_media adapter + fake decoder path also runs
    docs = spark.createDataFrame(
        [(1, "src", "en", "same text payload"),
         (2, "src", "en", "same text payload"),
         (3, "src", "en", "a completely different document body here")],
        "doc_id long, source string, lang string, text string",
    )
    fp = near_dup_pairs_phash(
        documents_as_media(docs),
        pixel_fn=fake_pixels,
        max_hamming=0,
    )
    assert {(r["id_a"], r["id_b"]) for r in fp.collect()} == {(1, 2)}
