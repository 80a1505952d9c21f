"""KTX2 texture container — TextureLoader parity (texture_loader.hpp:23-70).

The reference's primary texture path is KTX2 via libktx (its glTF optimizer bakes
assets with toktx/gltfpack — Tools/optimize_gltf.py:1-30). This is a dependency-free
reader for the KTX2 container format (Khronos KTX File Format Specification v2):

- header + level index parse, mip levels returned largest-first as (h, w, 4) u8;
- supercompression: None (0), Zstandard (2) via the zstandard module (read +
  write — the scheme toktx emits by default), ZLIB (3) via stdlib zlib;
- formats: the 8-bit UNORM/SRGB family (R8, RG8, RGB8, RGBA8). GPU block formats
  (BasisLZ/ETC1S, UASTC) need a transcoder and are gated with a clear error —
  bake assets with ``--format rgba8 --zlib`` (tools/make_ktx2.py writes them).

A matching writer lives here too (used by the asset tool and tests), so the
format path is exercised end-to-end without external binaries.
"""

from __future__ import annotations

import struct
import zlib
from typing import List

import numpy as np

MAGIC = b"\xabKTX 20\xbb\r\n\x1a\n"

# VkFormat values for the supported 8-bit family.
VK_FORMAT_R8_UNORM = 9
VK_FORMAT_R8G8_UNORM = 16
VK_FORMAT_R8G8B8_UNORM = 23
VK_FORMAT_R8G8B8_SRGB = 29
VK_FORMAT_R8G8B8A8_UNORM = 37
VK_FORMAT_R8G8B8A8_SRGB = 43

_CHANNELS = {
    VK_FORMAT_R8_UNORM: 1,
    VK_FORMAT_R8G8_UNORM: 2,
    VK_FORMAT_R8G8B8_UNORM: 3,
    VK_FORMAT_R8G8B8_SRGB: 3,
    VK_FORMAT_R8G8B8A8_UNORM: 4,
    VK_FORMAT_R8G8B8A8_SRGB: 4,
}

SUPERCOMPRESSION_NONE = 0
SUPERCOMPRESSION_BASISLZ = 1
SUPERCOMPRESSION_ZSTD = 2
SUPERCOMPRESSION_ZLIB = 3

_HEADER = struct.Struct("<IIIIIIIII")  # after magic: vkFormat..supercompression
_INDEX = struct.Struct("<IIQQQQ")  # dfd/kvd offsets+lengths (u32 x2? see spec)
_LEVEL = struct.Struct("<QQQ")


def _decompress(data: bytes, scheme: int, expect: int) -> bytes:
    if scheme == SUPERCOMPRESSION_NONE:
        return data
    if scheme == SUPERCOMPRESSION_ZLIB:
        out = zlib.decompress(data)
    elif scheme == SUPERCOMPRESSION_ZSTD:
        import zstandard

        out = zstandard.ZstdDecompressor().decompress(data, max_output_size=expect)
    elif scheme == SUPERCOMPRESSION_BASISLZ:
        raise NotImplementedError(
            "KTX2 BasisLZ (ETC1S) needs the BasisU transcoder; bake with "
            "--format rgba8 (tools/make_ktx2.py) instead"
        )
    else:
        raise ValueError(f"unknown KTX2 supercompression scheme {scheme}")
    if len(out) != expect:
        raise ValueError(f"KTX2 level decompressed to {len(out)} bytes, expected {expect}")
    return out


def load_ktx2(data: bytes) -> List[np.ndarray]:
    """Parse a KTX2 byte string -> mip levels largest-first, each (h, w, 4) u8."""
    if data[:12] != MAGIC:
        raise ValueError("not a KTX2 file (bad magic)")
    (vk_format, type_size, width, height, depth, layers, faces, levels,
     scheme) = _HEADER.unpack_from(data, 12)
    if vk_format not in _CHANNELS:
        raise NotImplementedError(
            f"KTX2 vkFormat {vk_format} unsupported (8-bit UNORM/SRGB family only; "
            "UASTC/ETC1S need a transcoder — bake with --format rgba8)"
        )
    if depth > 1 or layers > 1 or faces > 1:
        raise NotImplementedError("KTX2 3D/array/cubemap textures unsupported")
    ch = _CHANNELS[vk_format]
    levels = max(levels, 1)

    # Level index starts right after header (12 magic + 36 header + 2x(u32,u32) +
    # (u64,u64) index = KTX2 fixed layout: dfdByteOffset u32, dfdByteLength u32,
    # kvdByteOffset u32, kvdByteLength u32, sgdByteOffset u64, sgdByteLength u64.
    off = 12 + _HEADER.size + 4 * 4 + 8 * 2
    out = []
    for lv in range(levels):
        byte_off, byte_len, unc_len = _LEVEL.unpack_from(data, off + lv * _LEVEL.size)
        raw = _decompress(data[byte_off : byte_off + byte_len], scheme,
                          unc_len if scheme else byte_len)
        w = max(width >> lv, 1)
        h = max(height >> lv, 1)
        # KTX2 levels have no row padding for 1-byte-aligned formats at mip sizes
        # used here (texel block align = texel size for these formats).
        img = np.frombuffer(raw, np.uint8, count=h * w * ch).reshape(h, w, ch)
        if ch == 1:
            img = np.concatenate(
                [np.repeat(img, 3, -1), np.full((h, w, 1), 255, np.uint8)], -1
            )
        elif ch == 2:  # luminance + alpha
            img = np.concatenate([np.repeat(img[..., :1], 3, -1), img[..., 1:]], -1)
        elif ch == 3:
            img = np.concatenate([img, np.full((h, w, 1), 255, np.uint8)], -1)
        out.append(img)
    return out


def load_ktx2_file(path: str) -> List[np.ndarray]:
    with open(path, "rb") as f:
        return load_ktx2(f.read())


def write_ktx2(
    levels: List[np.ndarray],
    srgb: bool = True,
    supercompression: int = SUPERCOMPRESSION_ZLIB,
) -> bytes:
    """Serialize RGBA8 mip levels (largest-first) to a KTX2 byte string."""
    lv0 = np.asarray(levels[0])
    h, w = lv0.shape[:2]
    vk_format = VK_FORMAT_R8G8B8A8_SRGB if srgb else VK_FORMAT_R8G8B8A8_UNORM
    n = len(levels)

    header = _HEADER.pack(vk_format, 1, w, h, 0, 0, 1, n, supercompression)
    # Minimal (empty) DFD/KVD/SGD blocks: dfd length 4 (just the u32 total size).
    dfd = struct.pack("<I", 4)
    level_index_off = 12 + _HEADER.size + 4 * 4 + 8 * 2
    dfd_off = level_index_off + n * _LEVEL.size
    payload_off = dfd_off + len(dfd)

    blobs = []
    index = []
    off = payload_off
    for lv in levels:
        lv = np.asarray(lv, np.uint8)
        if lv.ndim != 3 or lv.shape[2] != 4:
            raise ValueError("write_ktx2 expects (h, w, 4) u8 levels")
        raw = lv.tobytes()
        if supercompression == SUPERCOMPRESSION_ZLIB:
            blob = zlib.compress(raw, 6)
        elif supercompression == SUPERCOMPRESSION_ZSTD:
            import zstandard

            blob = zstandard.ZstdCompressor(level=9).compress(raw)
        else:
            blob = raw
        # 8-byte align level payloads (mipPadding).
        pad = (-off) % 8
        off += pad
        blobs.append(b"\x00" * pad + blob)
        index.append(_LEVEL.pack(off, len(blob), len(raw)))
        off += len(blob)

    parts = [
        MAGIC, header,
        struct.pack("<IIII", dfd_off, len(dfd), 0, 0),  # dfd/kvd offsets+lengths
        struct.pack("<QQ", 0, 0),  # sgd
        b"".join(index), dfd, b"".join(blobs),
    ]
    return b"".join(parts)
