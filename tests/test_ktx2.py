"""KTX2 container read/write (TextureLoader parity, texture_loader.hpp:23-70)."""

import base64
import json

import numpy as np
import pytest

from androidrenderer_tpu.scene import ktx2


def _checker(size=32):
    y, x = np.mgrid[0:size, 0:size]
    c = (((y // 4) + (x // 4)) % 2 * 255).astype(np.uint8)
    img = np.stack([c, 255 - c, np.full_like(c, 7), np.full_like(c, 255)], axis=-1)
    return img


@pytest.mark.parametrize("scheme", [ktx2.SUPERCOMPRESSION_NONE,
                                    ktx2.SUPERCOMPRESSION_ZLIB,
                                    ktx2.SUPERCOMPRESSION_ZSTD])
def test_roundtrip_levels(scheme):
    lv0 = _checker(32)
    lv1 = lv0[::2, ::2].copy()
    lv2 = lv0[::4, ::4].copy()
    blob = ktx2.write_ktx2([lv0, lv1, lv2], supercompression=scheme)
    out = ktx2.load_ktx2(blob)
    assert len(out) == 3
    for a, b in zip(out, [lv0, lv1, lv2]):
        np.testing.assert_array_equal(a, b)


def test_rejects_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        ktx2.load_ktx2(b"not a ktx2 file at all....")


def test_basislz_gated_with_clear_error():
    blob = bytearray(ktx2.write_ktx2([_checker(8)]))
    # Patch the supercompressionScheme field (last u32 of the header).
    import struct

    struct.pack_into("<I", blob, 12 + 8 * 4, ktx2.SUPERCOMPRESSION_BASISLZ)
    with pytest.raises(NotImplementedError, match="BasisLZ"):
        ktx2.load_ktx2(bytes(blob))


def test_gltf_with_ktx2_texture(tmp_path):
    """A .gltf whose base-color texture is a .ktx2 file (KHR_texture_basisu)."""
    img = _checker(32)
    (tmp_path / "tex.ktx2").write_bytes(ktx2.write_ktx2([img]))

    # Minimal one-triangle glTF referencing the KTX2 texture.
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
        "materials": [{"pbrMetallicRoughness": {
            "baseColorTexture": {"index": 0}}}],
        "textures": [{"extensions": {"KHR_texture_basisu": {"source": 0}}}],
        "images": [{"uri": "tex.ktx2", "mimeType": "image/ktx2"}],
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

    from androidrenderer_tpu.scene.gltf import load_gltf_scene

    scene = load_gltf_scene(str(path))
    # The KTX2 texture landed in the pool (beyond the 2 default textures) and is
    # bound by the material.
    assert scene.materials.num_textures == 3
    assert scene.materials.materials[0].base_color_texture == 2


@pytest.mark.parametrize("fmt", ["rgba8", "uastc"])
def test_optimize_gltf_tool(fmt, tmp_path):
    """tools/optimize_gltf.py (the reference Tools/optimize_gltf.py analog):
    bakes a GLB's textures to KTX2 + KHR_texture_basisu (uastc = the
    ``gltfpack -tu`` bake the reference documents); the result loads with the
    same material/texture bindings."""
    import subprocess
    import sys as _sys

    src = "/root/reference/RenderCore/assets/AlphaTest.glb"
    out = tmp_path / "opt"
    r = subprocess.run(
        [_sys.executable, "/root/repo/tools/optimize_gltf.py", src, "-o", str(out),
         "--max-size", "256", "--format", fmt],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert (out / "AlphaTest.gltf").exists() and (out / "AlphaTest_img0.ktx2").exists()

    from androidrenderer_tpu.scene.gltf import load_gltf_scene

    orig = load_gltf_scene(src)
    opt = load_gltf_scene(str(out / "AlphaTest.gltf"))
    assert opt.materials.num_textures == orig.materials.num_textures
    assert len(opt.primitives) == len(orig.primitives)
    # Material alpha modes survived the rewrite.
    assert [m.alpha_mode for m in opt.materials.materials] == [
        m.alpha_mode for m in orig.materials.materials
    ]
