"""KHR_texture_basisu codecs: ETC1S/BasisLZ (scene/basis_lz.py) and UASTC
(scene/uastc.py), plus their KTX2 container integration.

The reference consumes these through libktx (texture_loader.hpp:23-70); its
bakes are ``gltfpack -tu`` (UASTC) and ``toktx --encode`` (Tools/
Optimize-Textures.ps1). No foreign test vectors exist in this environment
(zero egress — docs/ROADMAP.md), so verification follows the self-vector
strategy: independent encoder/decoder implementations round-tripped against
each other, lossy quality gated by SSIM against the source, container paths
exercised end-to-end through the glTF loader."""

import base64
import json

import numpy as np
import pytest

from androidrenderer_tpu.scene import basis_lz, ktx2, uastc
from androidrenderer_tpu.utils.image import ssim


def _texture(h=96, w=128, seed=0, alpha=False):
    """Sponza-ish test content: low-frequency color fields + speckle."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            150 + 80 * np.sin(x / 13.0) * np.cos(y / 9.0),
            120 + 90 * np.cos(x / 23.0),
            100 + 60 * np.sin((x + y) / 17.0),
        ],
        axis=-1,
    )
    img = np.clip(img + rng.normal(0, 5, img.shape), 0, 255).astype(np.uint8)
    a = (
        np.clip(x * 255.0 / w + rng.normal(0, 3, (h, w)), 0, 255).astype(np.uint8)
        if alpha
        else np.full((h, w), 255, np.uint8)
    )
    return np.concatenate([img, a[..., None]], axis=-1)


def _mips(img):
    levels = [img]
    cur = img.astype(np.float32)
    while min(cur.shape[:2]) > 4:
        h, w, c = cur.shape
        cur = cur[: h // 2 * 2, : w // 2 * 2].reshape(h // 2, 2, w // 2, 2, c).mean((1, 3))
        levels.append(np.clip(cur + 0.5, 0, 255).astype(np.uint8))
    return levels


def _check_levels(src_levels, dec_levels, ssim_gate=0.9, err_gate=14.0):
    """Level 0 gates on SSIM; deeper mips (too small for the SSIM window,
    noisier per-texel) gate on mean abs error."""
    assert len(dec_levels) == len(src_levels)
    for i, (a, b) in enumerate(zip(src_levels, dec_levels)):
        assert b.shape == a.shape
        ga = a[..., :3].astype(np.float32).mean(-1)
        gb = b[..., :3].astype(np.float32).mean(-1)
        if i == 0:
            assert ssim(ga, gb) > ssim_gate
        assert np.abs(ga - gb).mean() < err_gate


# -- ETC1S ----------------------------------------------------------------------


def test_etc1s_block_decode_semantics():
    """ETC1S block semantics against hand-computed ETC1 values: base 5:5:5
    expands by bit replication, selector s adds INTEN_TABLES[inten][s]."""
    endpoints = np.array([[16, 8, 31, 2]], np.uint8)  # r5=16 g5=8 b5=31, table 2
    selectors = np.arange(16, dtype=np.uint8)[None, :] % 4
    out = basis_lz.decode_blocks(endpoints, selectors, np.zeros(1, int), np.zeros(1, int))
    base = np.array([16 << 3 | 16 >> 2, 8 << 3 | 8 >> 2, 31 << 3 | 31 >> 2])
    table = [-29, -9, 9, 29]
    for t in range(16):
        expect = np.clip(base + table[t % 4], 0, 255)
        np.testing.assert_array_equal(out[0, t], expect)


def test_etc1s_roundtrip_quality_and_stability():
    levels = _mips(_texture())
    enc = basis_lz.encode_etc1s(levels)
    dec = basis_lz.decode_etc1s(enc.sgd, enc.level_data, levels[0].shape[1],
                                levels[0].shape[0])
    _check_levels(levels, dec)
    for b in dec:
        assert (b[..., 3] == 255).all()
    # Decode is a pure function of the bytes.
    dec2 = basis_lz.decode_etc1s(enc.sgd, enc.level_data, levels[0].shape[1],
                                 levels[0].shape[0])
    for a, b in zip(dec, dec2):
        np.testing.assert_array_equal(a, b)


def test_etc1s_alpha_slices():
    img = _texture(64, 64, seed=3, alpha=True)
    enc = basis_lz.encode_etc1s([img])
    dec = basis_lz.decode_etc1s(enc.sgd, enc.level_data, 64, 64)[0]
    err = np.abs(dec[..., 3].astype(np.float32) - img[..., 3].astype(np.float32))
    assert err.mean() < 8.0


def test_etc1s_codebook_vq_degrades_gracefully():
    img = _texture(seed=5)
    full = basis_lz.encode_etc1s([img])
    tiny = basis_lz.encode_etc1s([img], max_endpoints=32, max_selectors=32)
    assert len(tiny.sgd) < len(full.sgd)
    dec = basis_lz.decode_etc1s(tiny.sgd, tiny.level_data, img.shape[1], img.shape[0])[0]
    assert ssim(img[..., :3].astype(np.float32).mean(-1),
                dec[..., :3].astype(np.float32).mean(-1)) > 0.6


# -- UASTC ----------------------------------------------------------------------


def test_uastc_solid_blocks_exact():
    img = np.full((16, 16, 4), (200, 10, 77, 128), np.uint8)
    np.testing.assert_array_equal(uastc.decode_image(uastc.encode_image(img), 16, 16), img)


def test_uastc_roundtrip_quality():
    for alpha in (False, True):
        img = _texture(seed=7, alpha=alpha)
        dec = uastc.decode_image(uastc.encode_image(img), img.shape[1], img.shape[0])
        assert ssim(img[..., :3].astype(np.float32).mean(-1),
                    dec[..., :3].astype(np.float32).mean(-1)) > 0.93
        if alpha:
            aerr = np.abs(dec[..., 3].astype(np.float32) - img[..., 3].astype(np.float32))
            assert aerr.mean() < 8.0


def test_uastc_nonmultiple_of_4_dims():
    img = _texture(h=37, w=41, seed=9)
    dec = uastc.decode_image(uastc.encode_image(img), 41, 37)
    assert dec.shape == (37, 41, 4)


def test_uastc_unknown_mode_gated():
    bad = np.zeros((1, 16), np.uint8)
    bad[0, 0] = 3  # mode 3: structurally valid, not implemented
    with pytest.raises(NotImplementedError, match="mode"):
        uastc.decode_blocks(bad)


# -- KTX2 container -------------------------------------------------------------


@pytest.mark.parametrize(
    "fmt,scheme",
    [
        ("etc1s", None),
        ("uastc", ktx2.SUPERCOMPRESSION_NONE),
        ("uastc", ktx2.SUPERCOMPRESSION_ZSTD),
        ("uastc", ktx2.SUPERCOMPRESSION_ZLIB),
    ],
)
def test_ktx2_block_codec_roundtrip(fmt, scheme):
    levels = _mips(_texture(64, 96, seed=11))
    kwargs = {} if scheme is None else {"supercompression": scheme}
    blob = ktx2.write_ktx2(levels, fmt=fmt, **kwargs)
    out = ktx2.load_ktx2(blob)
    _check_levels(levels, out)
    # Block codecs actually compress: smaller than raw RGBA8.
    assert len(blob) < sum(lv.nbytes for lv in levels) // 2


def test_ktx2_dfd_color_model_written():
    blob = ktx2.write_ktx2([_texture(16, 16)], fmt="etc1s")
    import struct

    dfd_off, dfd_len = struct.unpack_from("<II", blob, 12 + 36)
    assert ktx2._dfd_color_model(blob, dfd_off, dfd_len) == ktx2.KHR_DF_MODEL_ETC1S
    assert struct.unpack_from("<I", blob, 12 + 8 * 4)[0] == ktx2.SUPERCOMPRESSION_BASISLZ
    blob = ktx2.write_ktx2([_texture(16, 16)], fmt="uastc")
    dfd_off, dfd_len = struct.unpack_from("<II", blob, 12 + 36)
    assert ktx2._dfd_color_model(blob, dfd_off, dfd_len) == ktx2.KHR_DF_MODEL_UASTC


def _one_tri_gltf(tmp_path, tex_name):
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
    uv = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    buf = pos.tobytes() + nrm.tobytes() + uv.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0,
        }]}],
        "materials": [{"pbrMetallicRoughness": {"baseColorTexture": {"index": 0}}}],
        "textures": [{"extensions": {"KHR_texture_basisu": {"source": 0}}}],
        "images": [{"uri": tex_name, "mimeType": "image/ktx2"}],
        "buffers": [{
            "byteLength": len(buf),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(buf).decode(),
        }],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 24},
            {"buffer": 0, "byteOffset": 96, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3",
             "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
    }
    path = tmp_path / "scene.gltf"
    path.write_text(json.dumps(gltf))
    return str(path)


@pytest.mark.parametrize("fmt", ["etc1s", "uastc"])
def test_gltf_khr_texture_basisu_e2e(fmt, tmp_path):
    """The reference's flagship asset shape — a glTF with KHR_texture_basisu
    block-compressed KTX2 textures — loads end-to-end (gltf_model.cpp texture
    import; previously these formats were gated)."""
    img = _texture(32, 32, seed=13)
    (tmp_path / "tex.ktx2").write_bytes(ktx2.write_ktx2(_mips(img), fmt=fmt))
    from androidrenderer_tpu.scene.gltf import load_gltf_scene

    scene = load_gltf_scene(_one_tri_gltf(tmp_path, "tex.ktx2"))
    # Texture landed in the pool (not the silent default-white fallback).
    assert scene.materials.num_textures == 3
    assert scene.materials.materials[0].base_color_texture == 2
