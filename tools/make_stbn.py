"""Bake the spatio-temporal blue-noise asset (NoiseTexture parity).

The reference ships 64-layer 128x128 STBN textures as assets
(noise_texture.hpp:12-22, assets/stbn/); we generate ours with void-and-cluster
(ops/noise.py) and bake them to androidrenderer_tpu/assets/stbn_128_64.npz as u16.

    python tools/make_stbn.py [--channels 2] [--layers 64] [--size 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=2)
    ap.add_argument("--layers", type=int, default=64)
    ap.add_argument("--size", type=int, default=128)
    args = ap.parse_args()

    from androidrenderer_tpu.ops import noise

    t0 = time.time()
    stack = np.empty((args.channels, args.layers, args.size, args.size), np.float32)
    for c in range(args.channels):
        for l in range(args.layers):
            stack[c, l] = noise.blue_noise(args.size, seed=c * 1000 + l)
        print(f"channel {c}: {time.time() - t0:.1f}s", file=sys.stderr)

    u16 = np.clip(stack * 65535.0 + 0.5, 0, 65535).astype(np.uint16)
    path = noise._stbn_asset_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, stbn=u16)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
